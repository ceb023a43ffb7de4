package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print session defaults that matter for codegen shape. */
object ConfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    for (k <- Seq("spark.sql.ansi.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.codegen.wholeStage"))
      println(s"[conf] $k = ${spark.conf.get(k)}")
    spark.stop()
  }
}
