package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: bisect the q87c repetition-stage blowup — time
  * repetitionFilter over (a) raw parquet documents, (b) a
  * localCheckpoint of them, (c) PII-injected, (d) injected+scrubbed.
  * Usage: runMain graft.tools.ProfileRep <sfDir>
  */
object ProfileRep {
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
    import graft.ops.{Tables, TextAnalysis}
    def t(what: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[rep] $what rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs = Tables.documents(spark, sfDir)
    t("raw")(TextAnalysis.repetitionFilter(docs))
    t("raw_ckpt")(TextAnalysis.repetitionFilter(docs.localCheckpoint()))
    t("injected")(TextAnalysis.repetitionFilter(
      TextAnalysis.injectPii(docs).localCheckpoint()))
    t("scrubbed")(TextAnalysis.repetitionFilter(
      TextAnalysis.piiScrubText(TextAnalysis.injectPii(docs))
        .localCheckpoint()))
    spark.stop()
  }
}
