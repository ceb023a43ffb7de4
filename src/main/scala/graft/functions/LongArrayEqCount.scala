package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: count of ALIGNED positions where two
  * ARRAY<BIGINT> columns hold equal non-null elements — the MinHash
  * signature-agreement count (16 lanes here) that the near-dup verify
  * rule thresholds (`n_match * 2 >= NHashes`).
  *
  * Why a custom Expression (SURVEY.md §7.3 exception, the LongArrayDot
  * reasoning): the composable form
  * `aggregate(zip_with(a, b, (x, y) -> if(x = y, 1, 0)), 0, _+_)` is a
  * CodegenFallback HigherOrderFunction tree — one allocated
  * intermediate array plus interpreted lambda dispatch per element per
  * ROW, sitting inside the band-join hot path of q36b / q85 / s14
  * (every band-collision candidate pair pays it). This compiles to a
  * primitive loop inside whole-stage codegen.
  *
  * Semantics match the composable form exactly on every input so
  * call-site substitution is drop-in:
  *   - NULL if either ARRAY is NULL (zip_with/aggregate propagate);
  *   - positions are compared over min(|a|,|b|): zip_with pads the
  *     shorter side with NULL, `x = y` against NULL is NULL, and
  *     `if(NULL, 1, 0)` takes the else branch — padded positions
  *     contribute 0, they do not poison;
  *   - a NULL ELEMENT likewise contributes 0 (not NULL) — unlike
  *     LongArrayDot, whose multiply propagates element nulls.
  * Result is INT like the lambda form's literal arithmetic.
  */
case class LongArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_eq_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) {
         |    $c++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayEqCount =
    copy(left = newLeft, right = newRight)
}

object LongArrayEqCount {
  /** Column entry point (callers guarantee ARRAY<BIGINT> inputs). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayEqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
