package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators + time bucketing + sessionization
  * (SURVEY.md §2.5, O-26, O-51).
  *
  * Scale notes: each query does exactly one shuffle (the window/groupBy
  * partitioning); sort within partitions is local. At 100 TB the partition
  * keys here (event_type, user_id, series keys) are the natural
  * distribution keys; skew on a hot key would be handled by AQE.
  */
object Windows {
  import Tables._

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  // O-28: ranking — rank/dense_rank/row_number per group (Tier B top-k
  // tables, ref README.md:22-25).
  def q18WindowRank(s: SparkSession, d: String): DataFrame = {
    val byBal = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val byBalTies = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
    customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("acctbal_cents"),
        row_number().over(byBal).as("rn"),
        rank().over(byBalTies).as("rnk"),
        dense_rank().over(byBalTies).as("drnk"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  // O-29: lag/lead delta — InfluxQL derivative()/difference(), the
  // reference's core "size growth per merge" output (ref README.md:3-4).
  def q19WindowLagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"),
        cents(col("value")).as("value_cents"),
        (cents(col("value")) - lag(cents(col("value")), 1).over(w))
          .as("delta_cents"),
        lead(col("event_id"), 1).over(w).as("next_event_id"))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  // O-30: frame-spec moving aggregate — InfluxQL moving_average(3)
  // (ref README.md:22-25). Average emitted as exact sum+count plus a
  // derived double whose single division is IEEE-deterministic.
  def q20MovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
    events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"),
        sum(cents(col("value"))).over(w).as("mv_sum_cents"),
        count(lit(1)).over(w).as("mv_n"))
      .withColumn("mv_avg",
        round(col("mv_sum_cents") / col("mv_n") / 100.0, 4))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  // O-31: top-k per group (latest/biggest N per series).
  def q21TopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("rn"), col("event_id"),
        cents(col("value")).as("value_cents"))
      .orderBy(col("event_type"), col("rn"))
  }

  // O-26: time-bucketed aggregate — GROUP BY time(1d) with the
  // reference's 03:00Z day anchor (ref rg.py:61-68). Uses Spark's
  // window() generator; the oracle reproduces bucket start arithmetic.
  def q33TimeBucket(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 day", "1 day", "3 hours"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_cents"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_cents"))
      .orderBy(col("bucket_start"), col("event_type"))

  // O-51 (batch twin): sessionization by 30-minute inactivity gap via
  // lag-gap-cumsum; the streaming twin is session_window (s05).
  def q34SessionWindow(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            1800L * 1000000L,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        sum(cents(col("value"))).as("sum_cents"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // Tier B fill(): dense daily grid per series via sequence+explode
  // (no driver-side date loop), left join of actual daily aggregates,
  // then fill(0) for counts and fill(previous) (LOCF) for the value —
  // InfluxQL's fill(0)/fill(previous) in one query.
  def q50TimeFill(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
    // grid = (distinct event_type) x (every day in the observed range).
    // Both derive from the ALREADY-AGGREGATED daily table (~|types|x|days|
    // rows), not from fresh scans of events: min/max of the truncated
    // days == truncated min/max ts, and every event_type present in
    // events appears in daily — one fact-table scan total instead of
    // three (the 100 TB difference between one pass and three).
    val span = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val locf = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_fill0"),
        last(col("sum_cents"), ignoreNulls = true).over(locf)
          .as("sum_cents_locf"))
      .orderBy(col("day"), col("event_type"))
  }

  // Tier B percentile() — discrete percentiles (the value AT rank
  // ceil(p*n), an actual element) via one rank window: interpolating
  // percentiles mix engine-specific float formulas, element-picking is
  // engine-exact. One shuffle, three percentiles in one pass.
  def q52Percentiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value_cents"), col("event_id"))
    val ranked = events(s, d)
      .select(col("event_type"), col("event_id"),
        cents(col("value")).as("value_cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    // integer ceiling division avoids float/decimal boundary drift
    // (ceil(100 * 0.99) is 100 in IEEE double but 99 in exact decimal)
    def pick(pct: Int, name: String) =
      max(when(col("rn") === expr(s"(n * $pct + 99) DIV 100"),
        col("value_cents"))).as(name)
    ranked.groupBy(col("event_type"))
      .agg(pick(50, "p50_cents"), pick(90, "p90_cents"),
        pick(99, "p99_cents"), max(col("n")).as("n"))
      .orderBy(col("event_type"))
  }

  // Tier B histogram(): fixed-width value buckets per series.
  def q53Histogram(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        (floor(cents(col("value")) / 2000L) * 2000L).as("bucket_lo"))
      .groupBy(col("event_type"), col("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket_lo"))

  // Tier B cumulative_sum(): running total per series in event order.
  def q54CumulativeSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"),
        cents(col("value")).as("value_cents"))
      .withColumn("cum_cents", sum(col("value_cents")).over(w))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_time_fill" -> (q50TimeFill _),
    "q52_percentiles" -> (q52Percentiles _),
    "q53_histogram" -> (q53Histogram _),
    "q54_cumulative_sum" -> (q54CumulativeSum _),
    "q18_window_rank" -> (q18WindowRank _),
    "q19_window_lag_delta" -> (q19WindowLagDelta _),
    "q20_moving_avg" -> (q20MovingAvg _),
    "q21_topk_per_group" -> (q21TopkPerGroup _),
    "q33_time_bucket" -> (q33TimeBucket _),
    "q34_session_window" -> (q34SessionWindow _),
  )

  val oracles: Map[String, String] = Map(
    "q52_percentiles" ->
      """WITH ranked AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value*100,0) AS BIGINT) AS value_cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(round(value*100,0) AS BIGINT), event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type,
        |  CAST(max(CASE WHEN rn = (n * 50 + 99) // 100
        |    THEN value_cents END) AS BIGINT) AS p50_cents,
        |  CAST(max(CASE WHEN rn = (n * 90 + 99) // 100
        |    THEN value_cents END) AS BIGINT) AS p90_cents,
        |  CAST(max(CASE WHEN rn = (n * 99 + 99) // 100
        |    THEN value_cents END) AS BIGINT) AS p99_cents,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q53_histogram" ->
      """SELECT event_type,
        |  CAST(floor(CAST(round(value*100,0) AS BIGINT) / 2000) * 2000
        |    AS BIGINT) AS bucket_lo,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket_lo""".stripMargin,
    "q54_cumulative_sum" ->
      """SELECT event_id, event_type, ts,
        |  CAST(round(value*100,0) AS BIGINT) AS value_cents,
        |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents
        |FROM events ORDER BY event_type, ts, event_id""".stripMargin,
    "q50_time_fill" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
        |    CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT date_trunc('day', min(ts)) AS d0,
        |    date_trunc('day', max(ts)) AS d1 FROM events),
        |grid AS (
        |  SELECT e.event_type, t.day
        |  FROM (SELECT DISTINCT event_type FROM events) e,
        |    span,
        |    UNNEST(generate_series(span.d0, span.d1, INTERVAL 1 DAY)) AS t(day)),
        |joined AS (
        |  SELECT g.day, g.event_type,
        |    coalesce(d.n, 0) AS n_fill0, d.sum_cents
        |  FROM grid g LEFT JOIN daily d
        |    ON g.day = d.day AND g.event_type = d.event_type)
        |SELECT day, event_type, n_fill0,
        |  last_value(sum_cents IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_cents_locf
        |FROM joined ORDER BY day, event_type""".stripMargin,
    "q18_window_rank" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(round(c_acctbal*100,0) AS BIGINT) AS acctbal_cents,
        |  CAST(row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn,
        |  CAST(rank() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC) AS INT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC) AS INT) AS drnk
        |FROM customer ORDER BY c_mktsegment, rn""".stripMargin,
    "q19_window_lag_delta" ->
      """SELECT event_id, event_type, ts,
        |  CAST(round(value*100,0) AS BIGINT) AS value_cents,
        |  CAST(round(value*100,0) AS BIGINT) - lag(CAST(round(value*100,0) AS BIGINT), 1)
        |    OVER (PARTITION BY event_type ORDER BY ts, event_id) AS delta_cents,
        |  lead(event_id, 1)
        |    OVER (PARTITION BY event_type ORDER BY ts, event_id) AS next_event_id
        |FROM events ORDER BY event_type, ts, event_id""".stripMargin,
    "q20_moving_avg" ->
      """WITH mv AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(sum(CAST(round(value*100,0) AS BIGINT))
        |      OVER (PARTITION BY event_type ORDER BY ts, event_id
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv_sum_cents,
        |    count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mv_n
        |  FROM events)
        |SELECT event_id, event_type, ts, mv_sum_cents, mv_n,
        |  round(mv_sum_cents / mv_n / 100.0, 4) AS mv_avg
        |FROM mv ORDER BY event_type, ts, event_id""".stripMargin,
    "q21_topk_per_group" ->
      """WITH ranked AS (
        |  SELECT event_type, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS INT) AS rn
        |  FROM events)
        |SELECT event_type, rn, event_id,
        |  CAST(round(value*100,0) AS BIGINT) AS value_cents
        |FROM ranked WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "q33_time_bucket" ->
      """SELECT
        |  date_trunc('day', ts - INTERVAL 3 HOUR) + INTERVAL 3 HOUR AS bucket_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,
    "q34_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
  )
}
