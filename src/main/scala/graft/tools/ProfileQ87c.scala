package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: stage split of q87c through the REAL funnel definition
  * (Dedup.funnelStagesExtended — run with GRAFT_FUNNEL_DEBUG=1 for the
  * per-stage construction timings; this tool carries no copy of the
  * stage pipeline, so it cannot drift from the declared query).
  * Usage: GRAFT_FUNNEL_DEBUG=1 runMain graft.tools.ProfileQ87c <sfDir>
  */
object ProfileQ87c {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val stages = graft.ops.Dedup.funnelStagesExtended(
      graft.ops.TextAnalysis.injectPii(
        graft.ops.Tables.documents(spark, sfDir)))
    println(f"[q87c] stages_built sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    stages.foreach { case (i, name, df) =>
      println(s"[q87c] stage=$i $name rows=${df.count()}")
    }
    spark.stop()
  }
}
