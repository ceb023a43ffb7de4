package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: where does the s-family replay floor go? Runs a
  * representative stateful s-query several times and dumps the
  * StreamingQueryProgress duration buckets (planning vs state commit vs
  * source work), plus wall time around the whole call. */
object ProfileStreams {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("s02_watermark", "s05_session_window",
      "s08_stream_stream_join", "s01_stream_tumbling")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        println(s"[sprof]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${dm}")
      }
    }
    spark.streams.addListener(listener)
    for (r <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, d).count()
      println(f"[sprof] $n run$r rows=$rows " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
