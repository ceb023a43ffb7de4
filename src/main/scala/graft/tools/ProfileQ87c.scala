package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: stage split of q87c — times each extended-funnel stage's
  * materialization in isolation so a regression attributes to ONE
  * declared operator. Usage: runMain graft.tools.ProfileQ87c <sfDir>
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
    import graft.ops.{Dedup, Tables, TextAnalysis, Sampling}
    // time the CONSTRUCTION: localCheckpoint() is eager, so the
    // stage's real work happens at construction, not at .count()
    def t(what: String)(body: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = body
      val n = df.count()
      println(f"[q87c] $what rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      df
    }
    val docs0 = TextAnalysis.injectPii(Tables.documents(spark, sfDir))
    val d0 = t("d0")(docs0.filter(col("doc_id").isNotNull)
      .localCheckpoint())
    val s1 = t("s1_scrub")(
      TextAnalysis.piiScrubText(d0).localCheckpoint())
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val s2 = t("s2_exact")(s1
      .withColumn("content_hash", sha2(col("text").cast("binary"), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "content_hash").localCheckpoint())
    val ndDrop = Dedup.nearDupPairs(s2)
      .select(col("doc_b").as("doc_id")).distinct()
    val s3 = t("s3_neardup")(
      s2.join(ndDrop, Seq("doc_id"), "left_anti").localCheckpoint())
    val s4 = t("s4_repetition")(s3.join(
      TextAnalysis.repetitionFilter(s3).filter(col("keep"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint())
    val s5 = t("s5_quality")(s4.join(
      TextAnalysis.qualityFilter(s4).filter(col("keep"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint())
    val s6 = t("s6_segment")(s5
      .join(Dedup.segmentDedup(s5).select(col("doc_id"), col("clean_text")),
        Seq("doc_id"))
      .withColumn("text", col("clean_text")).drop("clean_text")
      .localCheckpoint())
    val bench = graft.ops.Dedup.sourcedShingleRows(s1)
      .filter(col("source") === "src0").select(col("h")).distinct()
    val flagged = graft.ops.Dedup.sourcedShingleRows(s6)
      .filter(col("source") =!= "src0")
      .join(broadcast(bench), "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 10).select(col("doc_id"))
    val s7 = t("s7_decontaminate")(s6.filter(col("source") =!= "src0")
      .join(flagged, Seq("doc_id"), "left_anti").localCheckpoint())
    t("s8_split")(s7.join(
      Sampling.hashSplit(s7).filter(col("split") === "train")
        .select(col("doc_id")), Seq("doc_id"), "left_semi"))
    ()
    spark.stop()
  }
}
