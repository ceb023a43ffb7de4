package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: one-line plan-quality audit for EVERY registered query —
  * flags the patterns that hurt at scale (cartesian products, non-codegen
  * sort aggregates, missing parquet filter pushdown) so regressions in
  * plan shape show up without reading 70 full explains. Streaming
  * s-queries are excluded (they execute on materialization).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set("s01", "s02", "s03", "s04", "s05", "s06", "s07", "s08")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      if (!skip.contains(n.take(3))) {
        try {
          val plan = fn(spark, d).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          val flags = Seq(
            "cartesian" -> plan.contains("CartesianProduct"),
            "nested-loop" -> plan.contains("BroadcastNestedLoopJoin"),
            "sort-agg" -> plan.contains("SortAggregate"),
            "exch" -> true,
          ).collect { case (f, true) => f }
          val exchanges = "Exchange".r.findAllIn(plan).length
          val codegen = "WholeStageCodegen".r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
          println(f"$n%-28s exch=$exchanges%-3d codegen=$codegen%-3d " +
            f"pushed=$pushed%-2d ${flags.filterNot(_ == "exch").mkString(",")}")
        } catch {
          case e: Throwable => println(f"$n%-28s EXPLAIN-FAILED: " +
            e.getMessage.take(80))
        }
      }
    }
    spark.stop()
  }
}
