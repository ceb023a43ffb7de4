package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: total s-family wall time (2 rounds; round 2 is the warm
  * number), for A/B-ing session-level streaming knobs. */
object ProfileStreamsAll {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.filter(_.startsWith("s"))
      .toSeq.sorted
    for (r <- 1 to 2) {
      var total = 0.0
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"[sall] run$r $n $sec%.3f")
      }
      println(f"[sall] run$r TOTAL $total%.3f")
    }
    spark.stop()
  }
}
