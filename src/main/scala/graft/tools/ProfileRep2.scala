package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: isolate q87c's s4 blowup — rebuild s3 exactly as the
  * funnel does, then time the repetition sub-plans one by one.
  * Usage: runMain graft.tools.ProfileRep2 <sfDir>
  */
object ProfileRep2 {
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
    import graft.ops.{Dedup, Tables, TextAnalysis}
    def t(what: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[rep2] $what rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs0 = TextAnalysis.injectPii(Tables.documents(spark, sfDir))
    val d0 = docs0.filter(col("doc_id").isNotNull).localCheckpoint()
    val s1 = TextAnalysis.piiScrubText(d0).localCheckpoint()
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val s2 = s1
      .withColumn("content_hash", sha2(col("text").cast("binary"), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "content_hash").localCheckpoint()
    val ndDrop = Dedup.nearDupPairs(s2)
      .select(col("doc_b").as("doc_id")).distinct()
    val s3 = s2.join(ndDrop, Seq("doc_id"), "left_anti").localCheckpoint()
    println(s"[rep2] s3 ready rows=${s3.count()}")
    t("rep_alone")(TextAnalysis.repetitionFilter(s3))
    t("rep_keep_ids")(TextAnalysis.repetitionFilter(s3)
      .filter(col("keep")).select(col("doc_id")))
    t("semi_join")(s3.join(
      TextAnalysis.repetitionFilter(s3).filter(col("keep"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi"))
    spark.stop()
  }
}
