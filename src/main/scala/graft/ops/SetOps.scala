package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations, pivot, and the incremental high-water-mark scan
  * (SURVEY.md §2.7, O-62, O-48).
  */
object SetOps {
  import Tables._

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Pushdown-friendly week slice (see Tables.eventsBetween). */
  private def week(s: SparkSession, d: String, lo: String, hi: String)
      : DataFrame =
    eventsBetween(s, d, Some(lo), Some(hi))

  // O-34: heterogeneous union — one output stream mixing two row kinds
  // (ref rg.py:243-252: build_sizes + pr_events in one list).
  // unionByName(allowMissingColumns) fills the disjoint columns with null.
  def q23Union(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), lit("click_stream").as("src"),
        cents(col("value")).as("value_cents"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("ts"), lit("signup_stream").as("src"),
        col("props").as("note"))
    clicks.unionByName(signups, allowMissingColumns = true)
      .orderBy(col("event_id"), col("src"))
  }

  // O-35: intersect — users active in both of two weeks.
  def q24Intersect(s: SparkSession, d: String): DataFrame =
    week(s, d, "2024-01-01", "2024-01-08").select(col("user_id"))
      .intersect(
        week(s, d, "2024-01-08", "2024-01-15").select(col("user_id")))
      .orderBy(col("user_id"))

  // O-36: except — users who disappeared between two weeks.
  def q25Except(s: SparkSession, d: String): DataFrame =
    week(s, d, "2024-01-01", "2024-01-08")
      .select(col("user_id"), col("event_type"))
      .except(week(s, d, "2024-01-08", "2024-01-15")
        .select(col("user_id"), col("event_type")))
      .orderBy(col("user_id"), col("event_type"))

  // O-62: pivot (series -> columns, the Grafana one-column-per-board
  // table). Pivot values passed explicitly: no extra distinct-collect
  // job, and the plan stays a single hash aggregate — at 100 TB an
  // implicit-values pivot would add a full scan just to enumerate keys.
  def q39Pivot(s: SparkSession, d: String): DataFrame = {
    val day = date_trunc("DAY", col("ts"))
    events(s, d)
      .groupBy(day.as("day"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum(cents(col("value"))))
      .select(col("day"),
        coalesce(col("click"), lit(0L)).as("click_cents"),
        coalesce(col("error"), lit(0L)).as("error_cents"),
        coalesce(col("purchase"), lit(0L)).as("purchase_cents"),
        coalesce(col("signup"), lit(0L)).as("signup_cents"),
        coalesce(col("view"), lit(0L)).as("view_cents"))
      .orderBy(col("day"))
  }

  // O-48 (batch emulation): resume-from-offset — the reference's
  // "SELECT hash ... ORDER BY time DESC LIMIT 1" then "sha..HEAD" scan
  // (ref rg.py:130-143). High-water mark = scalar aggregate broadcast
  // into the filter; at scale this prunes partitions instead of scanning.
  def q40IncrementalOffset(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // high-water scan: the ts bound reaches the parquet footer (pushdown)
    val hw = eventsBetween(s, d, None, Some("2024-01-25"))
      .agg(max(col("event_id")).as("hw"))
    ev.crossJoin(broadcast(hw))
      .filter(col("event_id") > col("hw"))
      .select(col("event_id"), col("ts"), col("event_type"),
        cents(col("value")).as("value_cents"))
      .orderBy(col("event_id"))
  }

  // Skew-resilient two-phase aggregation (100 TB pattern): phase 1
  // aggregates on (key, salt) so one hot key spreads over 8 reducers;
  // phase 2 merges the 8 partials. Same result as a plain groupBy —
  // hence a normal oracle — but no reducer sees a whole hot key.
  // (Spark's partial/final agg already handles additive skew; the salt
  // pattern matters for non-algebraic aggs and extreme cardinality skew.)
  def q49SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val salted = events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(cents(col("value"))).as("psum"),
        max(col("ts")).as("pmax"))
    salted
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        sum(col("psum")).as("sum_cents"),
        max(col("pmax")).as("max_ts"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_salted_agg" -> (q49SaltedAgg _),
    "q23_union" -> (q23Union _),
    "q24_intersect" -> (q24Intersect _),
    "q25_except" -> (q25Except _),
    "q39_pivot" -> (q39Pivot _),
    "q40_incremental_offset" -> (q40IncrementalOffset _),
  )

  val oracles: Map[String, String] = Map(
    "q49_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  max(ts) AS max_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q23_union" ->
      """SELECT event_id, ts, 'click_stream' AS src,
        |  CAST(round(value*100,0) AS BIGINT) AS value_cents,
        |  NULL AS note
        |FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, ts, 'signup_stream' AS src,
        |  NULL AS value_cents, props AS note
        |FROM events WHERE event_type = 'signup'
        |ORDER BY event_id, src""".stripMargin,
    "q24_intersect" ->
      """SELECT user_id FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |INTERSECT
        |SELECT user_id FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |ORDER BY user_id""".stripMargin,
    "q25_except" ->
      """SELECT user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |EXCEPT
        |SELECT user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |ORDER BY user_id, event_type""".stripMargin,
    "q39_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        |  CAST(coalesce(sum(CASE WHEN event_type='click'
        |    THEN CAST(round(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS click_cents,
        |  CAST(coalesce(sum(CASE WHEN event_type='error'
        |    THEN CAST(round(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS error_cents,
        |  CAST(coalesce(sum(CASE WHEN event_type='purchase'
        |    THEN CAST(round(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS purchase_cents,
        |  CAST(coalesce(sum(CASE WHEN event_type='signup'
        |    THEN CAST(round(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS signup_cents,
        |  CAST(coalesce(sum(CASE WHEN event_type='view'
        |    THEN CAST(round(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS view_cents
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q40_incremental_offset" ->
      """SELECT event_id, ts, event_type,
        |  CAST(round(value*100,0) AS BIGINT) AS value_cents
        |FROM events
        |WHERE event_id > (SELECT max(event_id) FROM events
        |                  WHERE ts < TIMESTAMP '2024-01-25')
        |ORDER BY event_id""".stripMargin,
  )
}
