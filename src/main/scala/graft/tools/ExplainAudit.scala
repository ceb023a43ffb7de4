package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-shape auditing. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_projection", "q07_broadcast_join",
        "q13_groupby_agg", "q22_sort_limit", "q37_similarity_topk",
        "q40_incremental_offset", "q12_asof_join")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
