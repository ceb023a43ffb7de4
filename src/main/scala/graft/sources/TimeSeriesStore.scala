package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's time-series store — the InfluxDB replacement
  * (SURVEY.md §1.4): a day-partitioned parquet table keyed by the
  * reference's 03:00Z-anchored day (rg.py:61-68).
  *
  * Why this layout at 100 TB:
  *  - `day=` hive partitions -> time-range queries become partition
  *    PRUNING (directories never listed), the same win the reference
  *    gets from InfluxDB's time index.
  *  - append-only daily partitions match the ingest cadence (one cron
  *    batch/day, rg.py:43-50); idempotent re-runs overwrite a single
  *    partition, the InfluxDB point-identity-overwrite analog (O-37).
  *  - files within a partition stay row-group-sized via the writer's
  *    repartition, so executors get balanced splits.
  */
object TimeSeriesStore {

  private def anchoredDay(c: org.apache.spark.sql.Column) =
    to_date(date_trunc("DAY", c - expr("INTERVAL 3 HOURS")))

  /** Append points (any frame with a `ts` column) partitioned by day.
    * `dynamic` overwrite mode replaces only the partitions present in
    * the batch — the idempotent-replay semantics of the reference. */
  def write(points: DataFrame, path: String,
      overwritePartitions: Boolean = false): Unit = {
    val mode = if (overwritePartitions) "overwrite" else "append"
    points.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    points
      .withColumn("day", anchoredDay(col("ts")))
      .repartition(col("day"))
      .write
      .partitionBy("day")
      .mode(mode)
      .parquet(path)
  }

  /** Read back a day range; the filter on the partition column prunes
    * directories before any file IO. */
  def readRange(s: SparkSession, path: String,
      fromDay: String, untilDay: String): DataFrame =
    s.read.parquet(path)
      .filter(col("day") >= lit(fromDay) && col("day") < lit(untilDay))
}
