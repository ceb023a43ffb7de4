package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: q61 connected-components timing + per-round convergence. */
object ProfileQ61 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q61_dedup_clusters")(spark, d).count()
      println(f"[prof] q61 run$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
