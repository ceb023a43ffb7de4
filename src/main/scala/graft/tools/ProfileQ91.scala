package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase split of q91's retrain-then-rebuild binding —
  * base build / frozen append / exact panel / before-probe / rebuild /
  * after-probe, so the bench total attributes to the declared
  * lifecycle phases rather than reading as one opaque number.
  * Usage: runMain graft.tools.ProfileQ91 <sfDir> [reps]
  */
object ProfileQ91 {
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
    import graft.ops.{Dedup, Similarity}
    for (r <- 1 to reps) {
      val emb = graft.ops.Tables.embeddings(spark, sfDir)
      val store = graft.util.Ephemeral.fixedDir("graft_ivfpq_store_prof")
      val driftPred = col("vec_id") >= 16 && col("vec_id") % 3 === 1
      def t[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tBuild = t(Similarity.ivfPqWriteDf(emb.filter(!driftPred), store))
      val tAppend = t(Similarity.ivfPqAppend(spark, store,
        emb.filter(driftPred)))
      var exact: org.apache.spark.sql.DataFrame = null
      val tExact = t {
        exact = Dedup.materializeBounded(
          Similarity.panelExact(emb, Similarity.ProbePanel, 10))
      }
      val panelDf = {
        import spark.implicits._
        Similarity.ProbePanel.toDF("probe_id")
      }
      def probe(): Long =
        Similarity.panelHits("p",
          Similarity.panelAdc(spark, store, emb, Similarity.ProbePanel,
            nprobe = 4, k = 10, m = 8), exact, panelDf).count()
      val tBefore = t(probe())
      val tRebuild = t(Similarity.ivfPqWriteDf(emb, store))
      val tAfter = t(probe())
      println(f"[prof-q91] rep=$r build=$tBuild%.2f append=$tAppend%.2f " +
        f"exact=$tExact%.2f before=$tBefore%.2f rebuild=$tRebuild%.2f " +
        f"after=$tAfter%.2f")
    }
    spark.stop()
  }
}
