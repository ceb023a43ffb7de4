package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dev-only: executed-plan node metrics for the unified new-edges
  * plan — which operator actually burns the time. */
object ProfileUniPlanMetrics {
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
    import graft.ops.{Tables, UnifiedClusters, Dedup}
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val imgSigs = graft.functions.Multimodal.imageSignatures(
      graft.functions.Multimodal.syntheticImages(spark)).localCheckpoint()
    val audSigs = graft.functions.Multimodal.audioSignatures(
      graft.functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
    val store = graft.util.Ephemeral.fixedDir("graft_uni_prof_pm")
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
    // warm once
    UnifiedClusters.unifiedMergeNewEdgesPlan(spark, store,
      batchDocs, batchEmb, imgSigs.filter(col("doc_id") >= 50),
      audSigs.filter(col("doc_id") >= 32)).count()
    val df = UnifiedClusters.unifiedMergeNewEdgesPlan(spark, store,
      batchDocs, batchEmb, imgSigs.filter(col("doc_id") >= 50),
      audSigs.filter(col("doc_id") >= 32))
    df.collect()
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.ReusedSubqueryExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.contains("time") || k.contains("duration") ||
          k == "numOutputRows") && m.value > 0
      }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println(("  " * depth) + s"${p.nodeName} $ms")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case r: ReusedExchangeExec => walk(r.child, depth + 1)
        case r: ReusedSubqueryExec => walk(r.child, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
