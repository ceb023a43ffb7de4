package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md O-27/O-56): element-wise vector sum over
  * quantized embeddings — the reduction half of a centroid computation.
  *
  * Emits exact integer per-dimension SUMS (count comes from a plain
  * count(*) alongside) rather than a float mean: integer outputs are
  * engine- and order-exact, and the mean is a trivial post-division for
  * the consumer. The buffer is a mutable primitive array, so partial
  * aggregation (map-side combine) ships one 64-long array per group per
  * partition — the same merge shape a 1000-executor tree aggregation
  * uses at 100 TB.
  */
case class CentroidBuf(var sums: Array[Long], var n: Long)

object CentroidAgg extends Aggregator[Seq[Long], CentroidBuf, Seq[Long]] {

  override def zero: CentroidBuf = CentroidBuf(Array.empty[Long], 0L)

  override def reduce(b: CentroidBuf, a: Seq[Long]): CentroidBuf = {
    if (b.sums.length == 0) b.sums = new Array[Long](a.length)
    var i = 0
    val n = math.min(b.sums.length, a.length)
    while (i < n) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    if (x.sums.length == 0) y
    else if (y.sums.length == 0) x
    else {
      var i = 0
      val n = math.min(x.sums.length, y.sums.length)
      while (i < n) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
  }

  override def finish(b: CentroidBuf): Seq[Long] = b.sums.toSeq

  override def bufferEncoder: Encoder[CentroidBuf] =
    Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
