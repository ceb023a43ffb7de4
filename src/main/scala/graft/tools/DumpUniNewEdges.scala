package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: `.explain("formatted")` of the unified merge's new-edges
  * probe plan (the r17 hot spot) — the plan-diff artifact for
  * plans/r17/. The declared queries materialize this subplan, which
  * hides its shape from their final trees; the probe is the
  * PlanShapeSpec convention. */
object DumpUniNewEdges {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Tables, UnifiedClusters, Dedup}
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val imgSigs = graft.functions.Multimodal.imageSignatures(
      graft.functions.Multimodal.syntheticImages(spark)).localCheckpoint()
    val audSigs = graft.functions.Multimodal.audioSignatures(
      graft.functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
    val store = graft.util.Ephemeral.fixedDir("graft_uni_plandump")
    UnifiedClusters.unifiedClusterStoreWrite(
      docs.filter(col("doc_id") < 250),
      emb.filter(col("vec_id") < 250),
      imgSigs.filter(col("doc_id") < 50),
      audSigs.filter(col("doc_id") < 32), store)
    val batchDocs = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + Dedup.ReKeyOffset))
      .localCheckpoint()
    val batchEmb = emb.filter(col("vec_id") >= 250).localCheckpoint()
    val df = UnifiedClusters.unifiedMergeNewEdgesPlan(spark, store,
      batchDocs, batchEmb, imgSigs.filter(col("doc_id") >= 50),
      audSigs.filter(col("doc_id") >= 32))
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
