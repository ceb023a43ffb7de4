package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: raw (pre-aggregation) join cardinalities inside the
  * unified new-edges plan — is the verify-join intermediate the CPU? */
object ProfileUniJoinSizes {
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
    val batchDocs = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + Dedup.ReKeyOffset))
      .localCheckpoint()
    val batchEmb = emb.filter(col("vec_id") >= 250).localCheckpoint()
    val (Seq(bSh, bSim, bLsh, bImg, bAud, bVec), _, _) =
      UnifiedClusters.batchRowsOf(batchDocs, batchEmb,
        imgSigs.filter(col("doc_id") >= 50),
        audSigs.filter(col("doc_id") >= 32))
    def j(name: String, df: org.apache.spark.sql.DataFrame,
        key: Seq[String]): Unit = {
      val cnt = df.groupBy(key.map(col): _*).count()
        .agg(sum(col("count") * col("count"))).head.getLong(0)
      println(s"[joinsize] $name self_join_rows=$cnt")
    }
    println(s"[joinsize] bSh rows=${bSh.count()}")
    println(s"[joinsize] bSim rows=${bSim.count()}")
    println(s"[joinsize] bLsh rows=${bLsh.count()}")
    println(s"[joinsize] bImg rows=${bImg.count()} bAud=${bAud.count()}")
    j("shingle_h", bSh, Seq("h"))
    j("simhash_band", bSim, Seq("band", "ckey"))
    j("lsh_band", bLsh, Seq("band", "bkey"))
    j("img_band", bImg, Seq("band", "ckey"))
    j("aud_band", bAud, Seq("band", "ckey"))
    spark.stop()
  }
}
