package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: seeded kNN majority vote as ONE codegen'd
  * loop over a labeled seed set held as reference objects — the label
  * that the k nearest seeds (by exact integer dot over quantized
  * vectors) agree on, packed with its vote count.
  *
  * Why a custom Expression (SURVEY.md §7.3 exception — the
  * [[ArgmaxCodebookDot]] reasoning): the composable form is a corpus x
  * seeds broadcast join followed by a per-vector top-k window and a
  * majority aggregate — two corpus-sized hash exchanges for what is a
  * pure row-local function of (vector, fixed seed set). Here the seed
  * matrix rides as a flattened `long[]` reference (constant-pool
  * object, O(1) plan size in seed count) and the whole vote — dots,
  * top-k selection, majority — runs inside whole-stage codegen; the
  * corpus side needs NO exchange at all (the q65b decontaminateScan
  * posture, pinned in PlanShapeSpec).
  *
  * Semantics contract (stated once, replayed by the q98 oracle):
  *  - dots d_i = dot(qe, seed_i) over seeds in ascending seed-id order;
  *  - top-k = first `k` seeds ranked by (d_i DESC, seed index ASC) —
  *    byte-identical to `row_number() OVER (ORDER BY d DESC, sid)`;
  *  - winner = the top-k label with (count DESC, label ASC) — the
  *    deterministic majority;
  *  - return = (count << 32) | label (labels are validated non-negative
  *    ints by the caller, so the pack is lossless).
  * A NULL vector, wrong-length vector, or NULL element makes every dot
  * NULL; the window formulation's `d DESC NULLS LAST, sid` rank then
  * selects the FIRST k seeds by id, so this expression votes over
  * labels(0..k-1) for those rows — never NULL (the ArgmaxCodebookDot
  * pinned-answer convention; unreachable on the NULL-free fixtures).
  *
  * Plain long arithmetic: quantized unit-norm components are <= 1e6 and
  * vectors <= 64 dims, so |dot| <= 6.4e13 — overflow impossible, no
  * ANSI-mode dependence (the [[SignLshSignature]] reasoning).
  *
  * @param labels     seed labels in ascending seed-id order, each in
  *                   [0, 2^31) (the caller validates)
  * @param flatSeeds  row-major seed matrix: seed i occupies
  *                   `[i*dim, (i+1)*dim)`
  * @param k          neighbors to vote (capped at the seed count)
  */
case class KnnMajorityLabel(child: Expression, labels: Seq[Long],
    flatSeeds: Seq[Long], dim: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(labels.nonEmpty, "empty seed set (caller guards this)")
  require(dim >= 1 && flatSeeds.length == labels.length * dim,
    s"seed matrix of ${flatSeeds.length} longs is not " +
      s"${labels.length} seeds x $dim dims")
  require(k >= 1, s"k=$k must be >= 1")
  require(labels.forall(l => l >= 0 && l <= Int.MaxValue),
    "labels must fit a non-negative int (the packed-long contract)")

  @transient private lazy val labArr: Array[Long] = labels.toArray
  @transient private lazy val seedArr: Array[Long] = flatSeeds.toArray
  private def kk: Int = math.min(k, labels.length)

  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "knn_majority_label"

  override def eval(input: InternalRow): Any = {
    val n = labArr.length
    val top = kk
    val td = new Array[Long](top)
    val tl = new Array[Long](top)
    var filled = 0
    val v = child.eval(input)
    var ok = v != null
    val a = if (ok) v.asInstanceOf[ArrayData] else null
    if (ok && a.numElements() != dim) ok = false
    var d = 0
    while (ok && d < dim) {
      if (a.isNullAt(d)) ok = false
      d += 1
    }
    var i = 0
    while (i < n) {
      var s = 0L
      if (ok) {
        var j = 0
        val off = i * dim
        while (j < dim) { s += a.getLong(j) * seedArr(off + j); j += 1 }
      }
      // stable insertion: strict > keeps earlier (lower-id) seeds ahead
      // of equal-dot later ones — the (d DESC, sid ASC) rank
      var pos = filled
      while (pos > 0 && s > td(pos - 1)) pos -= 1
      if (pos < top) {
        val last = math.min(filled, top - 1)
        var m = last
        while (m > pos) { td(m) = td(m - 1); tl(m) = tl(m - 1); m -= 1 }
        td(pos) = s; tl(pos) = labArr(i)
        if (filled < top) filled += 1
      }
      i += 1
    }
    var bestLabel = 0L
    var bestCount = 0L
    i = 0
    while (i < filled) {
      var c = 0L
      var j = 0
      while (j < filled) { if (tl(j) == tl(i)) c += 1; j += 1 }
      if (c > bestCount || (c == bestCount && tl(i) < bestLabel)) {
        bestCount = c; bestLabel = tl(i)
      }
      i += 1
    }
    (bestCount << 32) | bestLabel
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val labs = ctx.addReferenceObj("knnLabels", labArr, "long[]")
    val seeds = ctx.addReferenceObj("knnSeeds", seedArr, "long[]")
    val top = kk
    // per-row scratch, allocated once per codegen instance
    val td = ctx.addMutableState("long[]", "knnTd",
      v => s"$v = new long[$top];")
    val tl = ctx.addMutableState("long[]", "knnTl",
      v => s"$v = new long[$top];")
    val childGen = child.genCode(ctx)
    val a = ctx.freshName("arr")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val m = ctx.freshName("m")
    val off = ctx.freshName("off")
    val s = ctx.freshName("s")
    val pos = ctx.freshName("pos")
    val last = ctx.freshName("last")
    val filled = ctx.freshName("filled")
    val c = ctx.freshName("c")
    val bl = ctx.freshName("bestLabel")
    val bc = ctx.freshName("bestCount")
    ev.copy(code =
      code"""
        |${childGen.code}
        |int $filled = 0;
        |boolean $ok = !${childGen.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData $a =
        |  $ok ? ${childGen.value} : null;
        |if ($ok && $a.numElements() != $dim) $ok = false;
        |for (int $d = 0; $ok && $d < $dim; $d++) {
        |  if ($a.isNullAt($d)) $ok = false;
        |}
        |for (int $i = 0; $i < $labs.length; $i++) {
        |  long $s = 0L;
        |  if ($ok) {
        |    int $off = $i * $dim;
        |    for (int $j = 0; $j < $dim; $j++) {
        |      $s += $a.getLong($j) * $seeds[$off + $j];
        |    }
        |  }
        |  int $pos = $filled;
        |  while ($pos > 0 && $s > $td[$pos - 1]) $pos--;
        |  if ($pos < $top) {
        |    int $last = $filled < ${top - 1} ? $filled : ${top - 1};
        |    for (int $m = $last; $m > $pos; $m--) {
        |      $td[$m] = $td[$m - 1]; $tl[$m] = $tl[$m - 1];
        |    }
        |    $td[$pos] = $s; $tl[$pos] = $labs[$i];
        |    if ($filled < $top) $filled++;
        |  }
        |}
        |long $bl = 0L;
        |long $bc = 0L;
        |for (int $i = 0; $i < $filled; $i++) {
        |  long $c = 0L;
        |  for (int $j = 0; $j < $filled; $j++) {
        |    if ($tl[$j] == $tl[$i]) $c++;
        |  }
        |  if ($c > $bc || ($c == $bc && $tl[$i] < $bl)) {
        |    $bc = $c; $bl = $tl[$i];
        |  }
        |}
        |long ${ev.value} = ($bc << 32) | $bl;
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : KnnMajorityLabel = copy(child = newChild)
}

object KnnMajorityLabel {
  /** Column-level entry point over a pre-collected seed table (callers
    * guarantee ARRAY<BIGINT> input, ascending seed-id order, and
    * non-negative int labels). */
  def apply(qe: Column, labels: Seq[Long], flatSeeds: Seq[Long],
      dim: Int, k: Int): Column =
    ColumnBridge.column(KnnMajorityLabel(
      ColumnBridge.expression(qe), labels, flatSeeds, dim, k))
}
