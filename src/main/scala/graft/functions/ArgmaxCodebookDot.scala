package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the coarse-quantizer assignment rule as
  * ONE codegen'd loop over a codebook held as a reference object —
  * `cell_id` of the centroid maximizing `dot(qe, centroid)`, ties to
  * the lowest cell_id.
  *
  * Why a custom Expression (SURVEY.md §7.3 exception): the composable
  * form inlines k centroid vectors as k LITERAL arrays inside an
  * `array(LongArrayDot(...), ...)` argmax — fine at k=16, but the plan
  * and generated Java grow O(k*dim) literals, which stresses Janino and
  * plan serialization at the k in the hundreds-to-thousands that a
  * 100 TB IVF layout actually runs. Here the codebook is a single
  * flattened `long[]` REFERENCE (constant-pool object, not source
  * literals), so plan size is O(1) in k and the assignment is a tight
  * two-level loop inside whole-stage codegen at any arity.
  *
  * Semantics contract (the one coarse-assignment rule, stated in
  * [[graft.ops.Similarity]].coarseAssign): argmax by strict `>` over
  * centroids in ascending cell_id order = lowest cell_id on ties —
  * byte-identical to a `row_number() OVER (ORDER BY cdot DESC,
  * cell_id)` rank. A NULL vector, wrong-length vector, or NULL element
  * makes every dot NULL; the window rank's `cdot DESC NULLS LAST,
  * cell_id` ordering then assigns the LOWEST cell_id, so this
  * expression returns `cellIds(0)` for those rows — never NULL. (The
  * literal-array predecessor's answer there was PATH-DEPENDENT:
  * `element_at(ids, NULL)` yields NULL through codegen but 0 through
  * the interpreted LocalRelation projection on Spark 4.1 — the
  * round-8 ADVICE oracle divergence, pinned to one answer here.)
  *
  * Plain long arithmetic: quantized unit-norm components are <= 1e6 in
  * magnitude and vectors <= 64 dims, so |dot| <= 6.4e13 — overflow is
  * impossible by construction, no ANSI-mode dependence (the
  * [[SignLshSignature]] reasoning).
  *
  * @param cellIds  centroid ids in STRICTLY ASCENDING order (the
  *                 tie-break order)
  * @param flatCodebook row-major centroid matrix: centroid i occupies
  *                 `[i*dim, (i+1)*dim)`
  */
case class ArgmaxCodebookDot(child: Expression, cellIds: Seq[Long],
    flatCodebook: Seq[Long], dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(cellIds.nonEmpty, "empty codebook (caller guards this)")
  require(dim >= 1 && flatCodebook.length == cellIds.length * dim,
    s"codebook of ${flatCodebook.length} longs is not " +
      s"${cellIds.length} centroids x $dim dims")
  require(cellIds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "cellIds must be strictly ascending (the tie-break order)")

  @transient private lazy val idArr: Array[Long] = cellIds.toArray
  @transient private lazy val cbArr: Array[Long] = flatCodebook.toArray

  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "argmax_codebook_dot"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return idArr(0)
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return idArr(0)
    var d = 0
    while (d < dim) {
      if (a.isNullAt(d)) return idArr(0)
      d += 1
    }
    var best = 0
    var bestDot = 0L
    var i = 0
    while (i < idArr.length) {
      var s = 0L
      var j = 0
      val off = i * dim
      while (j < dim) {
        s += a.getLong(j) * cbArr(off + j)
        j += 1
      }
      if (i == 0 || s > bestDot) { bestDot = s; best = i }
      i += 1
    }
    idArr(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ids = ctx.addReferenceObj("cellIds", idArr, "long[]")
    val cb = ctx.addReferenceObj("codebook", cbArr, "long[]")
    val childGen = child.genCode(ctx)
    val a = ctx.freshName("arr")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val off = ctx.freshName("off")
    val s = ctx.freshName("s")
    val best = ctx.freshName("best")
    val bestDot = ctx.freshName("bestDot")
    ev.copy(code =
      code"""
        |${childGen.code}
        |long ${ev.value} = $ids[0];
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $a =
        |    ${childGen.value};
        |  boolean $ok = $a.numElements() == $dim;
        |  for (int $d = 0; $ok && $d < $dim; $d++) {
        |    if ($a.isNullAt($d)) $ok = false;
        |  }
        |  if ($ok) {
        |    int $best = 0;
        |    long $bestDot = 0L;
        |    for (int $i = 0; $i < $ids.length; $i++) {
        |      long $s = 0L;
        |      int $off = $i * $dim;
        |      for (int $j = 0; $j < $dim; $j++) {
        |        $s += $a.getLong($j) * $cb[$off + $j];
        |      }
        |      if ($i == 0 || $s > $bestDot) { $bestDot = $s; $best = $i; }
        |    }
        |    ${ev.value} = $ids[$best];
        |  }
        |}
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ArgmaxCodebookDot = copy(child = newChild)
}

object ArgmaxCodebookDot {
  /** Column-level entry point over a pre-collected centroid table
    * (callers guarantee an ARRAY<BIGINT> input and ascending ids). */
  def apply(qe: Column, cellIds: Seq[Long], flatCodebook: Seq[Long],
      dim: Int): Column =
    ColumnBridge.column(ArgmaxCodebookDot(
      ColumnBridge.expression(qe), cellIds, flatCodebook, dim))
}
