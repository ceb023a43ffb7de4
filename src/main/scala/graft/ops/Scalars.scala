package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function operators: string/date/math/array/map/json
  * (SURVEY.md §2.8). All codegen'd built-ins — no UDFs in these paths.
  */
object Scalars {
  import Tables._

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")
  private def pct(c: Column): Column = round(c * 100, 0).cast("long")

  // O-05/O-44/O-57: wide-to-long unnest — the sizes.json map-of-map
  // flatten (ref rg.py:269-285): one row per metric cell, Generator op.
  // stack() instead of explode(map(...)): same rows, but no per-row map
  // allocation — stays inside whole-stage codegen (~5x at sf0.1).
  def q26ExplodeUnnest(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("""stack(3,
          'price_cents', CAST(round(l_extendedprice*100, 0) AS BIGINT),
          'qty', CAST(l_quantity AS BIGINT),
          'tax_pct', CAST(round(l_tax*100, 0) AS BIGINT))
          AS (metric, metric_value)"""))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  // O-39: string templating — the HTML anchor synthesis
  // (ref rg.py:338-343) plus standard string functions.
  def q27StringFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(lit("<a href=\"#"), col("c_custkey").cast("string"),
          lit("\">"), col("c_name"), lit("</a>")).as("html"),
        replace(col("c_name"), lit("Customer"), lit("Cust"))
          .as("name_short"))
      .orderBy(col("c_custkey"))

  // O-12/O-41: date arithmetic + the reference's 03:00Z-anchored day
  // (ref rg.py:61-68) + truncation/extraction.
  def q28DateFuncs(s: SparkSession, d: String): DataFrame =
    // range applied pre-conversion so it pushes to the scan
    eventsBetween(s, d, Some("2024-01-02 21:00:00"), Some("2024-01-10"))
      .select(col("event_id"),
        date_trunc("DAY", col("ts") - expr("INTERVAL 3 HOURS"))
          .as("anchored_day"),
        (col("ts") - expr("INTERVAL 1 DAY")).as("prev_day_ts"),
        date_trunc("HOUR", col("ts")).as("hour_bucket"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("hr"))
      .orderBy(col("event_id"))

  // O-43: integer/float math — round/abs/floor/ceil/sqrt/power
  // (ref rg.py:298; Tier B pct-change).
  def q29MathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 0).cast("long").as("price_round"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        (pct(col("l_discount")) - pct(col("l_tax"))).as("disc_minus_tax_pct"),
        abs(pct(col("l_discount")) - pct(col("l_tax"))).as("abs_pct"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        pow(col("l_quantity"), 2).cast("long").as("qty_sq"),
        pmod(col("l_orderkey"), lit(7L)).as("mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // O-46: array functions over the embedding column (Tier C).
  // Only order-independent derivations (min/max/count) — float SUMS are
  // accumulation-order-dependent and live in q37 behind round().
  def q30ArrayFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(col("embedding"), 64).as("last_val"),
        array_max(col("embedding")).as("max_val"),
        array_min(col("embedding")).as("min_val"),
        size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"))
      .orderBy(col("vec_id"))

  // O-45: JSON field extraction (ref rg.py:102 — data.json() key access;
  // the events.props fixture is the JSON-payload stand-in).
  def q31JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_explode_unnest" -> (q26ExplodeUnnest _),
    "q27_string_funcs" -> (q27StringFuncs _),
    "q28_date_funcs" -> (q28DateFuncs _),
    "q29_math_funcs" -> (q29MathFuncs _),
    "q30_array_funcs" -> (q30ArrayFuncs _),
    "q31_json_extract" -> (q31JsonExtract _),
  )

  val oracles: Map[String, String] = Map(
    "q26_explode_unnest" ->
      """SELECT l_orderkey, l_linenumber, metric, metric_value FROM (
        |  SELECT l_orderkey, l_linenumber, 'price_cents' AS metric,
        |    CAST(round(l_extendedprice*100,0) AS BIGINT) AS metric_value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'qty', CAST(l_quantity AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax_pct',
        |    CAST(round(l_tax*100,0) AS BIGINT)
        |  FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q27_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lower(c_mktsegment) AS seg_lower,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  concat('<a href="#', CAST(c_custkey AS VARCHAR), '">', c_name,
        |    '</a>') AS html,
        |  replace(c_name, 'Customer', 'Cust') AS name_short
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q28_date_funcs" ->
      """SELECT event_id,
        |  date_trunc('day', ts - INTERVAL 3 HOUR) AS anchored_day,
        |  ts - INTERVAL 1 DAY AS prev_day_ts,
        |  date_trunc('hour', ts) AS hour_bucket,
        |  CAST(EXTRACT(year FROM ts) AS INT) AS y,
        |  CAST(EXTRACT(month FROM ts) AS INT) AS m,
        |  CAST(EXTRACT(day FROM ts) AS INT) AS dom,
        |  CAST(EXTRACT(hour FROM ts) AS INT) AS hr
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03' - INTERVAL 3 HOUR
        |  AND ts < TIMESTAMP '2024-01-10'
        |ORDER BY event_id""".stripMargin,
    "q29_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice, 0) AS BIGINT) AS price_round,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(round(l_discount*100,0) AS BIGINT)
        |    - CAST(round(l_tax*100,0) AS BIGINT) AS disc_minus_tax_pct,
        |  abs(CAST(round(l_discount*100,0) AS BIGINT)
        |    - CAST(round(l_tax*100,0) AS BIGINT)) AS abs_pct,
        |  sqrt(l_quantity) AS sqrt_qty,
        |  CAST(power(l_quantity, 2) AS BIGINT) AS qty_sq,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q30_array_funcs" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_val,
        |  embedding[64] AS last_val,
        |  list_max(embedding) AS max_val,
        |  list_min(embedding) AS min_val,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q31_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
