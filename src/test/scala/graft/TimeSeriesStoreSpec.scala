package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.TimeSeriesStore
import org.apache.spark.sql.functions._

class TimeSeriesStoreSpec extends SparkSpec {

  private def mk(tsv: (String, Long)*) = {
    import spark.implicits._
    tsv.map { case (t, v) => (Timestamp.valueOf(t), v) }.toDF("ts", "dec")
  }

  test("day-partitioned write, range read prunes partitions") {
    val path = Files.createTempDirectory("graft_store_").toString
    TimeSeriesStore.write(mk(
      ("2026-08-01 10:00:00", 1L),
      ("2026-08-02 02:59:00", 2L), // before 03:00 -> still Aug 1 anchored
      ("2026-08-02 10:00:00", 3L),
      ("2026-08-03 10:00:00", 4L)), path)

    // layout: one dir per anchored day
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs === Seq("day=2026-08-01", "day=2026-08-02",
      "day=2026-08-03"))

    val ranged = TimeSeriesStore.readRange(spark, path,
      "2026-08-01", "2026-08-03")
    assert(ranged.count() === 3) // aug1 (x2 incl. 02:59 next day) + aug2
    // partition pruning visible in the plan
    val plan = ranged.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("dynamic partition overwrite replays a day idempotently") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_store_").toString
    TimeSeriesStore.write(mk(("2026-08-01 10:00:00", 1L),
      ("2026-08-02 10:00:00", 2L)), path)
    // replay day 2 with corrected value; day 1 untouched
    TimeSeriesStore.write(mk(("2026-08-02 10:00:00", 20L)), path,
      overwritePartitions = true)
    val got = spark.read.parquet(path)
      .orderBy(col("ts")).select("dec").as[Long].collect().toSeq
    assert(got === Seq(1L, 20L))
  }
}
