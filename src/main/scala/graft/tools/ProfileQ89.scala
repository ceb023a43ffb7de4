package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase split of q89's write-then-merge binding.
  * Usage: runMain graft.tools.ProfileQ89 <sfDir> [reps]
  */
object ProfileQ89 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to reps) {
      val docs = graft.ops.Tables.documents(spark, sfDir)
      val store = graft.util.Ephemeral.fixedDir("graft_nd_cluster_prof")
      val t0 = System.nanoTime()
      graft.ops.Dedup.neardupClusterStoreWrite(
        docs.filter(col("doc_id") < 250), store)
      val t1 = System.nanoTime()
      val newBatch = docs.filter(col("doc_id") >= 250)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id",
            col("doc_id") + graft.ops.Dedup.ReKeyOffset))
      val n = graft.ops.Dedup.neardupClusterMerge(spark, store, newBatch)
        .count()
      val t2 = System.nanoTime()
      println(f"[prof-q89] rep=$r write=${(t1 - t0) / 1e9}%.2f " +
        f"merge=${(t2 - t1) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
