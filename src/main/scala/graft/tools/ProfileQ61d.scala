package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase split of q61d — store build vs merge vs rollup.
  * Usage: runMain graft.tools.ProfileQ61d <sfDir> [reps]
  */
object ProfileQ61d {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Tables, UnifiedClusters, Dedup}
    for (r <- 1 to reps) {
      def t[A](what: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val x = body
        println(f"[q61d] rep=$r $what sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        x
      }
      val docs = Tables.documents(spark, sfDir)
      val emb = Tables.embeddings(spark, sfDir)
      val imgSigs = graft.functions.Multimodal.imageSignatures(
        graft.functions.Multimodal.syntheticImages(spark)).localCheckpoint()
      val audSigs = graft.functions.Multimodal.audioSignatures(
        graft.functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
      val store = graft.util.Ephemeral.fixedDir("graft_uni_cluster_prof")
      t("store_write")(UnifiedClusters.unifiedClusterStoreWrite(
        docs.filter(col("doc_id") < 250),
        emb.filter(col("vec_id") < 250),
        imgSigs.filter(col("doc_id") < 50),
        audSigs.filter(col("doc_id") < 32), store))
      val batchDocs = docs.filter(col("doc_id") >= 250)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id",
            col("doc_id") + graft.ops.Dedup.ReKeyOffset))
      val merged = t("merge_plan+exec")(
        UnifiedClusters.unifiedClusterMerge(spark, store, batchDocs,
          emb.filter(col("vec_id") >= 250),
          imgSigs.filter(col("doc_id") >= 50),
          audSigs.filter(col("doc_id") >= 32)))
      t("collect")(merged.count())
    }
    spark.stop()
  }
}
