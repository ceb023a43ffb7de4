package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Design note (100 TB scale): every query receives the scale-factor
  * directory at call time and reads parquet directly, so Catalyst sees a
  * plain `FileSourceScanExec` it can prune (column pruning + predicate
  * pushdown reach the parquet footer). At cluster scale these paths would
  * be `ts`-partitioned tables; nothing in the query code assumes
  * single-file layout.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts arrives in whatever physical encoding the fixture writer
    * chose — TIMESTAMP(NANOS) (reads as LongType under the legacy
    * nanosAsLong flag, which is a no-op for other encodings),
    * TIMESTAMP_MICROS without isAdjustedToUTC (reads as TIMESTAMP_NTZ),
    * or an adjusted-to-UTC timestamp (reads as TimestampType). A 100 TB
    * ingest sees files from many writers, so the reader branches on the
    * footer's actual type instead of hard-wiring one encoding; every
    * branch lands on session-TZ TimestampType (session TZ is UTC
    * throughout, so NTZ → TZ is value-preserving). Nanos truncate to
    * micros — exactly what DuckDB does on read (its
    * `CAST(ns AS TIMESTAMP)` floor-divides by 1000), so both engines see
    * identical values.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(rawEvents(s, d))

  private def rawEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  private[graft] def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => // legacy TIMESTAMP(NANOS) under the nanosAsLong flag
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already session-TZ TimestampType
    }

  /** Time-ranged events scan with PUSHDOWN: range filters are applied to
    * the RAW `ts` column before any conversion, with a literal of the
    * column's own type, so `.explain` shows
    * `PushedFilters: [GreaterThanOrEqual(ts,...), LessThan(ts,...)]` and
    * row groups outside the range are skipped via footer stats. (A
    * filter on the converted column would hide the raw column from the
    * scan.) At 100 TB with ts-partitioned layout this is partition
    * pruning, not a scan. Same footer-type branching as [[events]].
    */
  def eventsBetween(s: SparkSession, d: String,
      loIso: Option[String], hiIso: Option[String]): DataFrame = {
    def ldt(iso: String): java.time.LocalDateTime = {
      val t = if (iso.length == 10) iso + "T00:00:00" else iso.replace(" ", "T")
      java.time.LocalDateTime.parse(t)
    }
    val raw = rawEvents(s, d)
    // a bound literal matching the raw column's type, so the comparison
    // needs no cast and reaches the parquet scan as a pushed filter
    val bound: String => Column = raw.schema("ts").dataType match {
      case LongType => iso =>
        lit(ldt(iso).toInstant(java.time.ZoneOffset.UTC)
          .getEpochSecond * 1000000000L)
      case TimestampNTZType => iso => lit(ldt(iso))
      case _ => iso =>
        lit(java.sql.Timestamp.from(
          ldt(iso).toInstant(java.time.ZoneOffset.UTC)))
    }
    val ranged = (loIso, hiIso) match {
      case (Some(lo), Some(hi)) =>
        raw.filter(col("ts") >= bound(lo) && col("ts") < bound(hi))
      case (Some(lo), None) => raw.filter(col("ts") >= bound(lo))
      case (None, Some(hi)) => raw.filter(col("ts") < bound(hi))
      case _ => raw
    }
    normalizeTs(ranged)
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
