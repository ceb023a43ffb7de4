package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print a query's formatted plan, and (with -x) the AQE final
  * executed plan after running it (for plan-shape iteration). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val execute = args.contains("-x")
    args.filterNot(_ == "-x").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"===== $name =====")
      if (execute) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else {
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    }
    spark.stop()
  }
}
