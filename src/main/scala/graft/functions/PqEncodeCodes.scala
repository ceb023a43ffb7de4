package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full PQ encode of one quantized
  * vector as ONE codegen'd loop — for each of the `m` sub-spaces, the
  * seed id minimizing the packed `dist*64 + seed` rule over a codebook
  * held as a reference object. Byte-identical codes to the
  * compositional encoder (pqSubVectors explode → broadcast seed join →
  * `min(dist*64+seed)` → m-sorted fold), because the packing is the
  * same integer tie-break: distance argmin, ties to the LOWEST seed
  * id; the `aa = dot(sv,sv)` term of the distance is constant across
  * seeds within one (vector, sub-space) and so cancels out of the
  * argmin — the loop scores `(bb - 2*dot)*64 + seed` directly.
  *
  * Why a custom Expression (SURVEY.md §7.3 exception, the
  * [[ArgmaxCodebookDot]] reasoning): the compositional form is correct
  * but pays an 8x row explode, a broadcast join, and two wide
  * aggregations per store build — all to compute something that is a
  * pure row-local function of (vector, frozen codebook). With the
  * codebook as a flattened `long[]` reference (constant-pool object,
  * O(1) plan size in k), the whole encode stays inside whole-stage
  * codegen and the store writers collapse to a single corpus scan.
  *
  * Null contract: a NULL vector, wrong-length vector, or NULL element
  * yields a NULL code array. (The compositional path emits an array of
  * NULL codes there instead — both are unusable sentinels on rows the
  * store's consumers never read; the fixture and the writers' inputs
  * are well-formed by construction. Divergence documented, not
  * hidden.)
  *
  * Overflow-free by construction: quantized components are <= 1e6,
  * sub-vectors <= 64 dims, so |bb - 2*dot| <= 3 * 64 * 1e12 and the
  * *64 packing stays far below 2^63 (the [[ArgmaxCodebookDot]]
  * argument).
  *
  * @param seedIds  codebook seed ids in STRICTLY ASCENDING order (the
  *                 tie-break order), shared by all sub-spaces; each
  *                 must fit the 6-bit pack (< 64)
  * @param flatCodebook sub-space-major seed matrix: the centroid of
  *                 (sub-space mi, seed index si) occupies
  *                 `[(mi*k + si)*subDim, (mi*k + si + 1)*subDim)`
  */
case class PqEncodeCodes(child: Expression, seedIds: Seq[Long],
    flatCodebook: Seq[Long], m: Int, subDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(seedIds.nonEmpty, "empty codebook (caller guards this)")
  require(seedIds.forall(s => s >= 0 && s < 64),
    "seed ids must fit the 6-bit dist*64+seed pack")
  require(seedIds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "seedIds must be strictly ascending (the tie-break order)")
  require(m >= 1 && subDim >= 1 &&
    flatCodebook.length == m * seedIds.length * subDim,
    s"codebook of ${flatCodebook.length} longs is not $m sub-spaces x " +
      s"${seedIds.length} seeds x $subDim dims")

  @transient private lazy val idArr: Array[Long] = seedIds.toArray
  @transient private lazy val cbArr: Array[Long] = flatCodebook.toArray
  // bb = dot(cv, cv) per (sub-space, seed), precomputed once
  @transient private lazy val bbArr: Array[Long] = {
    val out = new Array[Long](m * idArr.length)
    var i = 0
    while (i < out.length) {
      var s = 0L
      var j = 0
      val off = i * subDim
      while (j < subDim) { s += cbArr(off + j) * cbArr(off + j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def dim: Int = m * subDim

  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_codes"

  private def encode(a: ArrayData): ArrayData = {
    val k = idArr.length
    val codes = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      var best = 0L
      var bestScore = 0L
      var si = 0
      while (si < k) {
        val off = (mi * k + si) * subDim
        var dot = 0L
        var j = 0
        while (j < subDim) {
          dot += a.getLong(mi * subDim + j) * cbArr(off + j)
          j += 1
        }
        val score = (bbArr(mi * k + si) - 2L * dot) * 64L + idArr(si)
        if (si == 0 || score < bestScore) {
          bestScore = score; best = idArr(si)
        }
        si += 1
      }
      codes(mi) = best
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var d = 0
    while (d < dim) {
      if (a.isNullAt(d)) return null
      d += 1
    }
    encode(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ids = ctx.addReferenceObj("seedIds", idArr, "long[]")
    val cb = ctx.addReferenceObj("codebook", cbArr, "long[]")
    val bb = ctx.addReferenceObj("bb", bbArr, "long[]")
    val childGen = child.genCode(ctx)
    val a = ctx.freshName("arr")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    val mi = ctx.freshName("mi")
    val si = ctx.freshName("si")
    val j = ctx.freshName("j")
    val off = ctx.freshName("off")
    val dot = ctx.freshName("dot")
    val score = ctx.freshName("score")
    val best = ctx.freshName("best")
    val bestScore = ctx.freshName("bestScore")
    val codes = ctx.freshName("codes")
    val k = idArr.length
    ev.copy(code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = true;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $a =
        |    ${childGen.value};
        |  boolean $ok = $a.numElements() == $dim;
        |  for (int $d = 0; $ok && $d < $dim; $d++) {
        |    if ($a.isNullAt($d)) $ok = false;
        |  }
        |  if ($ok) {
        |    long[] $codes = new long[$m];
        |    for (int $mi = 0; $mi < $m; $mi++) {
        |      long $best = 0L;
        |      long $bestScore = 0L;
        |      for (int $si = 0; $si < $k; $si++) {
        |        int $off = ($mi * $k + $si) * $subDim;
        |        long $dot = 0L;
        |        for (int $j = 0; $j < $subDim; $j++) {
        |          $dot += $a.getLong($mi * $subDim + $j) * $cb[$off + $j];
        |        }
        |        long $score =
        |          ($bb[$mi * $k + $si] - 2L * $dot) * 64L + $ids[$si];
        |        if ($si == 0 || $score < $bestScore) {
        |          $bestScore = $score; $best = $ids[$si];
        |        }
        |      }
        |      $codes[$mi] = $best;
        |    }
        |    ${ev.isNull} = false;
        |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
        |      .UnsafeArrayData.fromPrimitiveArray($codes);
        |  }
        |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncodeCodes = copy(child = newChild)
}

object PqEncodeCodes {
  /** Column-level entry point over a pre-collected codebook (callers
    * guarantee an ARRAY<BIGINT> input and ascending seed ids). */
  def apply(qe: Column, seedIds: Seq[Long], flatCodebook: Seq[Long],
      m: Int, subDim: Int): Column =
    ColumnBridge.column(PqEncodeCodes(
      ColumnBridge.expression(qe), seedIds, flatCodebook, m, subDim))
}
