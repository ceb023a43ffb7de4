package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long and truncate to micros — exactly
    * what DuckDB does on read (verified: its `CAST(ns AS TIMESTAMP)`
    * floor-divides by 1000), so both engines see identical values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Time-ranged events scan with PUSHDOWN: predicates on the converted
    * `ts` column cannot reach the parquet scan (the conversion expression
    * hides the raw column from Catalyst), so range filters are applied to
    * the raw nano-epoch BEFORE conversion — `.explain` then shows
    * `PushedFilters: [GreaterThanOrEqual(ts,...), LessThan(ts,...)]` and
    * row groups outside the range are skipped via footer stats. At 100 TB
    * with ts-partitioned layout this is partition pruning, not a scan.
    */
  def eventsBetween(s: SparkSession, d: String,
      loIso: Option[String], hiIso: Option[String]): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def nanos(iso: String): Long = {
      val t = if (iso.length == 10) iso + "T00:00:00" else iso.replace(" ", "T")
      java.time.LocalDateTime.parse(t)
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    }
    val raw = table(s, d, "events")
    val ranged = (loIso, hiIso) match {
      case (Some(lo), Some(hi)) =>
        raw.filter(col("ts") >= nanos(lo) && col("ts") < nanos(hi))
      case (Some(lo), None) => raw.filter(col("ts") >= nanos(lo))
      case (None, Some(hi)) => raw.filter(col("ts") < nanos(hi))
      case _ => raw
    }
    ranged.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
