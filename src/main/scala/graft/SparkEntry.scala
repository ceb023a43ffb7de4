package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module under `graft.ops` contributes a map of
  * `name -> (SparkSession, sfDir) => DataFrame` plus (where SQL-expressible)
  * a DuckDB oracle with IDENTICAL output column names and a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.1): the reference's defining computation
    * — "latest value per series per day" (O-03 + O-24 + O-26, ref
    * rg.py:106-117, rg.py:130-131) — over the events table at sf0.001.
    * Scan -> window (one shuffle on the series key) -> filter -> sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = ops.Tables.events(spark, "/root/testdata/sf0.001")
    val day = date_trunc("DAY", col("ts"))
    val w = Window.partitionBy(day, col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("day", day)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("day"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Windows.queries ++ ops.SetOps.queries ++
      ops.Scalars.queries ++ ops.Typed.queries ++
      ops.Dedup.queries ++ ops.UnifiedClusters.queries ++
      ops.Similarity.queries ++
      ops.TextAnalysis.queries ++ ops.Sampling.queries ++
      functions.Multimodal.queries ++
      streaming.Streams.queries ++
      Map("q48_pipeline_backfill" ->
        ((s: SparkSession, d: String) =>
          sources.Pipeline.q48PipelineBackfill(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Windows.oracles ++ ops.SetOps.oracles ++
      ops.Scalars.oracles ++ ops.Typed.oracles ++
      ops.Dedup.oracles ++ ops.UnifiedClusters.oracles ++
      ops.Similarity.oracles ++
      ops.TextAnalysis.oracles ++ ops.Sampling.oracles ++
      functions.Multimodal.oracles ++
      streaming.Streams.oracles ++
      // q48 runs over an inline 3-commit fixture (sfDir-independent), so
      // its oracle is the hand-derived golden: artifact "bbb" carries two
      // boards (b1: 10+20+30, b2: 7+8+9, count absent -> 0) at its
      // Last-Modified ts, cross-joined with PR 102's event row.
      Map("q48_pipeline_backfill" ->
        """SELECT * FROM (VALUES
          |  (TIMESTAMP '2026-08-01 20:05:00', 't1', 'b1',
          |   CAST(10 AS BIGINT), CAST(20 AS BIGINT), CAST(30 AS BIGINT),
          |   CAST(60 AS BIGINT), CAST(0 AS BIGINT), CAST(102 AS BIGINT),
          |   'two'),
          |  (TIMESTAMP '2026-08-01 20:05:00', 't1', 'b2',
          |   CAST(7 AS BIGINT), CAST(8 AS BIGINT), CAST(9 AS BIGINT),
          |   CAST(24 AS BIGINT), CAST(0 AS BIGINT), CAST(102 AS BIGINT),
          |   'two'))
          |  AS t(ts, test, board, bss, text, data, dec, count, pr_num,
          |       description)
          |ORDER BY test, board""".stripMargin)
}
