package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: job/stage/task accounting around the unified-store merge
  * (the r17 new-edges hot spot) — splits wall time into scheduled task
  * work vs scheduler/planning overhead so the optimization attacks the
  * right layer. Usage: runMain graft.tools.ProfileUniJobs <sfDir> [reps]
  */
object ProfileUniJobs {
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
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val stageLog =
      new scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      // ONE monitor for all stageLog access (round-18 ADVICE): the
      // main thread reads under stageLog.synchronized, so the
      // callbacks must append under the same lock, not the listener's
      override def onJobStart(j: SparkListenerJobStart): Unit =
        stageLog.synchronized { jobs += 1 }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        stageLog.synchronized {
          stages += 1
          val info = st.stageInfo
          stageLog += ((info.stageId,
            info.details.linesIterator.toSeq.drop(1).take(3).mkString("|"),
            info.numTasks, info.taskMetrics.executorRunTime))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stageLog.synchronized { tasks += 1; taskMs += t.taskInfo.duration }
    })
    import graft.ops.{Tables, UnifiedClusters, Dedup}
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val imgSigs = graft.functions.Multimodal.imageSignatures(
      graft.functions.Multimodal.syntheticImages(spark)).localCheckpoint()
    val audSigs = graft.functions.Multimodal.audioSignatures(
      graft.functions.Multimodal.syntheticWavs(spark)).localCheckpoint()
    val store = graft.util.Ephemeral.fixedDir("graft_uni_prof_jobs")
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
    for (r <- 1 to reps) {
      def probe[A](what: String)(body: => A): A = {
        val (j0, s0, t0, m0) = (jobs, stages, tasks, taskMs)
        val w0 = System.nanoTime()
        val x = body
        val wall = (System.nanoTime() - w0) / 1e9
        println(f"[unijobs] rep=$r $what wall=$wall%.2f jobs=${jobs - j0} " +
          f"stages=${stages - s0} tasks=${tasks - t0} " +
          f"taskSec=${(taskMs - m0) / 1e3}%.2f")
        x
      }
      stageLog.synchronized(stageLog.clear())
      probe("new_edges_plan_count")(
        UnifiedClusters.unifiedMergeNewEdgesPlan(spark, store,
          batchDocs, batchEmb, batchImg, batchAud).count())
      if (r == reps)
        stageLog.synchronized(stageLog.sortBy(-_._4).take(20)).foreach {
          case (id, det, n, ms) =>
            println(f"[unistage] id=$id tasks=$n runMs=$ms det=$det")
        }
    }
    spark.stop()
  }
}
