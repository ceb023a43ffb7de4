package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed row model for the lineitem slice used by the Dataset-API demo. */
case class LineSlim(l_returnflag: String, l_quantity: Double,
    l_extendedprice: Double)

/** Mutable-free aggregation buffer for [[LineStatsAgg]]. */
case class LineBuf(n: Long, qty: Long, cents: Long)

/** Typed Aggregator over the case-class rows: exact integer sums (cents
  * for money), so the result is engine-exact. Unlike `mapGroups`, an
  * Aggregator participates in PARTIAL aggregation — each partition
  * reduces to one buffer per key map-side and the shuffle carries
  * buffers, not rows: the shape that survives a 100 TB scale-up. */
object LineStatsAgg extends Aggregator[LineSlim, LineBuf, LineBuf] {
  override def zero: LineBuf = LineBuf(0L, 0L, 0L)
  override def reduce(b: LineBuf, r: LineSlim): LineBuf =
    LineBuf(b.n + 1, b.qty + r.l_quantity.toLong,
      b.cents + math.round(r.l_extendedprice * 100))
  override def merge(a: LineBuf, b: LineBuf): LineBuf =
    LineBuf(a.n + b.n, a.qty + b.qty, a.cents + b.cents)
  override def finish(b: LineBuf): LineBuf = b
  override def bufferEncoder: Encoder[LineBuf] = Encoders.product[LineBuf]
  override def outputEncoder: Encoder[LineBuf] = Encoders.product[LineBuf]
}

/** Typed Dataset surface (SURVEY.md §1.4: `Dataset[T]` where compile-time
  * field checks help). q51 runs the q13 aggregation through
  * `groupByKey` + a typed [[Aggregator]] — custom per-group logic with
  * compile-time row types, WITHOUT giving up partial aggregation (the
  * `mapGroups` escape hatch, which shuffles every row to its group's
  * reducer, stays reserved for genuinely non-algebraic per-group logic;
  * the streaming s07 query demonstrates that shape). The oracle proves
  * result parity with the columnar path.
  */
object Typed {
  import Tables._

  def q51TypedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[LineSlim]
    ds.groupByKey(_.l_returnflag)
      .agg(LineStatsAgg.toColumn.name("stats"))
      .select(col("key").as("l_returnflag"),
        col("stats.n").as("n_rows"), col("stats.qty").as("sum_qty"),
        col("stats.cents").as("sum_base_cents"))
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
