package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** O-48: offset tracking / resume — the reference's "process only commits
  * after the last stored sha" (rg.py:130-143), as checkpointed file-source
  * offsets: a second run with the same checkpoint must process ONLY files
  * that arrived after the first run. */
class StreamResumeSpec extends SparkSpec {

  test("checkpoint resume processes only new files, exactly once") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("resume_src_").toString
    val sinkDir = Files.createTempDirectory("resume_sink_").toString
    val ckpt = Files.createTempDirectory("resume_ckpt_").toString

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, batch STRING")
        .parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sinkDir)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    (1L to 100L).map((_, "first")).toDF("id", "batch")
      .write.mode("append").parquet(srcDir)
    runOnce()
    (101L to 150L).map((_, "second")).toDF("id", "batch")
      .write.mode("append").parquet(srcDir)
    runOnce()

    val sink = spark.read.parquet(sinkDir)
    // exactly once: 150 rows total, the first 100 NOT reprocessed
    assert(sink.count() === 150)
    assert(sink.filter(col("batch") === "first").count() === 100)
    assert(sink.filter(col("batch") === "second").count() === 50)
    assert(sink.select(col("id")).distinct().count() === 150)
  }
}
