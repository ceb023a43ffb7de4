package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: dot product of two ARRAY<BIGINT> columns.
  *
  * Why a custom Expression (SURVEY.md §7.3 exception): the composable form
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` allocates an intermediate
  * array and evaluates interpreted lambdas per element — measured ~20x
  * slower on the 2M-pair near-dup join (q36d). This expression compiles
  * to a tight primitive loop inside whole-stage codegen: no allocation,
  * no boxing, no virtual calls.
  *
  * Semantics match the composable form exactly — including the edges, so
  * graft.plans.DotProductRewrite may substitute this for the lambda tree:
  * NULL if either array is NULL, if the lengths differ (zip_with pads the
  * shorter side with NULL, and NULL poisons the sum), or if any element
  * is NULL. Overflow honors the session's ANSI mode, captured at
  * construction as [[failOnError]]: checked `Math.*Exact` arithmetic
  * (throws ArithmeticException, like the ANSI lambda form) when ANSI is
  * on, silent wraparound (legacy lambda semantics) when off.
  */
case class LongArrayDot(left: Expression, right: Expression,
    failOnError: Boolean = SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (failOnError)
        s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      else s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val step =
        if (failOnError)
          s"$s = java.lang.Math.addExact($s, " +
            s"java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else s"$s += $a.getLong($i) * $b.getLong($i);"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $step
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  /** Column-level entry point (callers guarantee ARRAY<BIGINT> inputs). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
