package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: |A ∩ B| of two ASCENDING-SORTED
  * ARRAY<BIGINT> columns with distinct elements, as a codegen'd
  * two-pointer merge — O(|A|+|B|) with zero allocation.
  *
  * Why a custom Expression (SURVEY.md §7.3 exception): the stock
  * `size(array_intersect(a, b))` builds a hash set per ROW; on the
  * near-dup verification join (q36e: ~10^5 candidate pairs × ~500-element
  * shingle sets) that per-row allocation + hashing is the query's floor.
  * The sets are already produced sorted (sort_array in the signature
  * aggregation), so the merge scan is free of both.
  *
  * Contract: both inputs sorted ascending with no duplicate elements —
  * the caller guarantees it (enforced upstream by array_distinct +
  * sort_array); unsorted input silently undercounts. NULL array yields
  * NULL; a NULL ELEMENT yields NULL only if the merge scan visits it —
  * elements past the point where one pointer EXHAUSTS are never
  * inspected (e.g. intersect([0], [1, NULL]) is 0 — the left side
  * exhausts before b[1] is read — while intersect([5], [1, NULL]) is
  * NULL, because advancing past 1 visits the NULL). Unlike
  * LongArrayDot, which scans every index, this is a short-circuiting
  * merge; interpreted and codegen paths agree.
  */
case class SortedLongArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_long_array_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongArrayIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedLongArrayIntersectSize {
  /** Column entry point (callers guarantee sorted ARRAY<BIGINT> inputs). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongArrayIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
