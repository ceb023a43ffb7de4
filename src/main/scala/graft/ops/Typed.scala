package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row model for the lineitem slice used by the Dataset-API demo. */
case class LineSlim(l_returnflag: String, l_quantity: Double,
    l_extendedprice: Double)

/** Typed Dataset surface (SURVEY.md §1.4: `Dataset[T]` where compile-time
  * field checks help). q51 runs the q13 aggregation through
  * `groupByKey` + `mapGroups` — the typed escape hatch for logic that
  * genuinely can't be expressed as columns.
  *
  * Scale note, stated for the record: mapGroups has NO partial
  * aggregation — every row shuffles to its group's reducer. For additive
  * aggregates the column form (q13) is strictly better; the typed form
  * exists for non-algebraic per-group logic (sessionizers, model
  * scoring, ordered scans). The oracle proves result parity with the
  * columnar path.
  */
object Typed {
  import Tables._

  def q51TypedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[LineSlim]
    ds.groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L
        var qty = 0L
        var cents = 0L
        rows.foreach { r =>
          n += 1
          qty += r.l_quantity.toLong
          cents += math.round(r.l_extendedprice * 100)
        }
        (flag, n, qty, cents)
      }
      .toDF("l_returnflag", "n_rows", "sum_qty", "sum_base_cents")
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_typed_agg" -> (q51TypedAgg _))

  val oracles: Map[String, String] = Map(
    "q51_typed_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)
        |    AS sum_base_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
