package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-family cost split of the unified merge's new-edges
  * plan (cross vs self pair sets) — attribution for the r17 hot spot.
  * Usage: runMain graft.tools.ProfileUniFams <sfDir> [reps]
  */
object ProfileUniFams {
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
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val imgSigs = graft.functions.Multimodal.imageSignatures(
      graft.functions.Multimodal.syntheticImages(spark)).localCheckpoint()
    val audSigs = graft.functions.Multimodal.audioSignatures(
      graft.functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
    val store = graft.util.Ephemeral.fixedDir("graft_uni_prof_fams")
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
    val batchImg = imgSigs.filter(col("doc_id") >= 50).localCheckpoint()
    val batchAud = audSigs.filter(col("doc_id") >= 32).localCheckpoint()
    def idx(name: String, schema: String) =
      spark.read.schema(schema).parquet(s"$store/$name")
    for (r <- 1 to reps) {
      def t(what: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"[unifam] rep=$r $what rows=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      val (Seq(bSh, bSim, bLsh, bImg, bAud, bVec), _, _) =
        UnifiedClusters.batchRowsOf(batchDocs, batchEmb, batchImg, batchAud)
      t("batch_rows")(bSh.count())
      val shIdx = idx("shingle", "doc_id BIGINT, c BIGINT, h BIGINT, kb INT")
      t("shingle_cross")(
        UnifiedClusters.shinglePairs(freshSelf = false)(shIdx, bSh).count())
      t("shingle_self")(
        UnifiedClusters.shinglePairs(freshSelf = true)(bSh, bSh).count())
      val simIdx = idx("simhash",
        "doc_id BIGINT, simhash BIGINT, band INT, ckey BIGINT, kb INT")
      t("simhash_cross")(UnifiedClusters.sigPairs("simhash",
        UnifiedClusters.SimScheme, self = false)(simIdx, bSim).count())
      t("simhash_self")(UnifiedClusters.sigPairs("simhash",
        UnifiedClusters.SimScheme, self = true)(bSim, bSim).count())
      val lshIdx = idx("emb_lsh", "vec_id BIGINT, band INT, bkey BIGINT, kb INT")
      t("lsh_cross")(UnifiedClusters.lshCrossPairs(spark, store,
        lshIdx, bLsh, bVec).count())
      t("lsh_self")(UnifiedClusters.lshSelfPairs(bLsh).count())
      val imgIdx = idx("img_ahash",
        "doc_id BIGINT, ahash BIGINT, band INT, ckey BIGINT, kb INT")
      t("img_cross")(UnifiedClusters.sigPairs("ahash",
        graft.functions.Multimodal.AhashScheme, self = false)(
        imgIdx, bImg).count())
      t("img_self")(UnifiedClusters.sigPairs("ahash",
        graft.functions.Multimodal.AhashScheme, self = true)(
        bImg, bImg).count())
      val audIdx = idx("ehash",
        "doc_id BIGINT, ehash BIGINT, band INT, ckey BIGINT, kb INT")
      t("aud_cross")(UnifiedClusters.sigPairs("ehash",
        graft.functions.Multimodal.EhashScheme, self = false)(
        audIdx, bAud).count())
      t("aud_self")(UnifiedClusters.sigPairs("ehash",
        graft.functions.Multimodal.EhashScheme, self = true)(
        bAud, bAud).count())
    }
    spark.stop()
  }
}
