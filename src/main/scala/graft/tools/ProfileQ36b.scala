package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: per-query profile of the dedup family with a per-stage
  * executor-time dump. Each measurement runs twice so JIT/codegen
  * compile lands in rep1 and rep2 is steady-state. This tool found both
  * round-2 q36b pathologies: the single-row-group scan stage serializing
  * the digest work onto one task, and broadcast band joins materializing
  * the signature pipeline twice. */
object ProfileQ36b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageTimes =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          stageTimes.put(si.stageId,
            (si.taskMetrics.executorRunTime, si.numTasks))
        }
      })
    def t[A](label: String)(f: => A): Unit =
      for (r <- 1 to 2) {
        stageTimes.clear()
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val stages = stageTimes.asScala.toSeq.sortBy(_._1)
          .map { case (id, (rt, nt)) => s"$id:${rt}ms/${nt}t" }
          .mkString(" ")
        println(f"[prof] $label rep$r: $dt%.3f s   stages: $stages")
      }
    t("docs scan")(graft.ops.Tables.documents(spark, d).count())
    Seq("q36_near_dup", "q36b_minhash_lsh", "q36c_simhash",
      "q36e_near_dup_prefix").foreach { q =>
      t(q)(graft.SparkEntry.queries(q)(spark, d).count())
    }
    spark.stop()
  }
}
