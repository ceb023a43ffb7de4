package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: q36c SimHash timing repeated, to separate variance from
  * regression. */
object ProfileQ36c {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q36c_simhash")(spark, d).count()
      println(f"[prof] q36c run$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
