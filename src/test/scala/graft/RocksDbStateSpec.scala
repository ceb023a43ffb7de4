package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-store backend swap: the same stateful streaming query must
  * produce identical results on the default (HDFS-backed in-memory)
  * provider and on RocksDB — the 100 TB configuration, where per-key
  * state spills beyond executor heap and changelog checkpointing keeps
  * snapshots incremental. Streams.runToMemory switches provider via
  * SPARK_GRAFT_STATE_STORE=rocksdb; this spec proves the swap is
  * semantics-preserving by driving both providers directly.
  */
class RocksDbStateSpec extends SparkSpec {

  /** Watermarked dedup + grouped count over the sf events fixture,
    * executed on an explicit state-store provider. */
  private def dedupCounts(provider: Option[String]): DataFrame = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(providerKey)
    val prevNanos = spark.conf.getOption(nanosKey)
    provider.foreach(spark.conf.set(providerKey, _))
    try {
      spark.conf.set(nanosKey, "true")
      val stream = spark.readStream
        .schema("event_id LONG, ts LONG, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        .withColumn("copy", explode(array(lit(1), lit(2))))
        .drop("copy")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(Seq("event_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val name = s"rocks_${provider.isDefined}"
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("rocks_ckpt_").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
      prevNanos match {
        case Some(p) => spark.conf.set(nanosKey, p)
        case None => spark.conf.unset(nanosKey)
      }
    }
  }

  test("RocksDB state store yields identical stateful-dedup results") {
    val default = dedupCounts(None).collect().map(r =>
      (r.getString(0), r.getLong(1))).sortBy(_._1)
    val rocks = dedupCounts(Some(streaming.Streams.RocksDbProvider))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rocks.nonEmpty)
    assert(rocks.toSeq === default.toSeq)
    // dedup actually collapsed the doubled rows
    val raw = graft.ops.Tables.events(spark, sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rocks.toSeq === raw.toSeq)
  }

  test("all stateful queries on RocksDB exit 0 in one JVM") {
    // The r4 wart: with every s-query RocksDB-backed in one short-lived
    // JVM, dozens of live native handles raced JVM exit and teardown
    // could SIGABRT (exit 134) after all results were written.
    // runToMemory now unloads state providers after each finished
    // replay; this drives a REAL child JVM through every stateful
    // s-query under SPARK_GRAFT_STATE_STORE=rocksdb and asserts the
    // process-level contract (exit 0) that an operator's scheduler sees.
    import scala.jdk.CollectionConverters._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // reuse this test JVM's --add-opens set (the Spark-on-JDK17 flags
    // from build.sbt) rather than duplicating the list here
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("--add-opens")).toSeq
    val stateful = Seq("s01_stream_tumbling", "s02_watermark",
      "s03_stream_dedup", "s05_session_window", "s06_stream_sliding",
      "s07_stateful_counter", "s08_stream_stream_join",
      "s09_transform_with_state", "s10_event_timer",
      "s11_stream_decontaminate")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g", "-cp",
      System.getProperty("java.class.path"), "graft.tools.TimeOne",
      "/root/testdata/sf0.001", "1") ++ stateful
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_STATE_STORE", "rocksdb")
    pb.environment().put("SPARK_GRAFT_CPUS", "8")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val exit = proc.waitFor()
    assert(exit === 0, s"child JVM exited $exit; tail:\n${out.takeRight(2000)}")
    assert(out.linesIterator.count(_.contains("[timeone]")) === stateful.size)
  }
}
