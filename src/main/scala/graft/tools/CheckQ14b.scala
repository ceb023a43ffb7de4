package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: verify q14b's within_2pct sketch assertion holds at every
  * scale factor (HLL++ is deterministic per input set, so one green run
  * per SF proves the property is stable, not flaky). */
object CheckQ14b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val rows = graft.SparkEntry.queries("q14b_approx_distinct")(spark, d)
        .collect()
      val allIn = rows.forall(_.getBoolean(2))
      println(s"[q14b] $sf rows=${rows.length} all_within_2pct=$allIn")
      rows.foreach(r => println(s"[q14b]   $r"))
    }
    spark.stop()
  }
}
