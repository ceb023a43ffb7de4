package graft.plans

import graft.functions.LongArrayEqCount
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: rewrite the declarative aligned-equality count
  *
  *   aggregate(zip_with(a, b, (x, y) -> if(x = y, 1, 0)),
  *             0, (acc, v) -> acc + v)
  *
  * (and the `when(x === y, 1).otherwise(0)` CaseWhen spelling the
  * Column API produces) into the codegen'd [[LongArrayEqCount]]
  * primitive loop — the MinHash signature-agreement count. Same
  * contract as [[DotProductRewrite]]: users keep writing the idiomatic
  * composable form, in Scala or SQL, and get the fast path from the
  * optimizer; the engine's own call sites use the expression directly
  * (as they do LongArrayDot), the rule serves the public surface.
  *
  * Edge-for-edge equivalent (see LongArrayEqCount's scaladoc): NULL
  * array → NULL; zip_with's pad-with-NULL on unequal lengths and NULL
  * elements both make `x = y` NULL, whose if/when takes the 0 branch —
  * exactly the expression's contribute-0 rule. No overflow mode: the
  * count is bounded by the array length.
  */
object EqCountRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** if(x = y, 1, 0) / CASE WHEN x = y THEN 1 ELSE 0 END over exactly
    * the two given lambda variables (either comparison order). */
  private def isEqIndicator(e: Expression,
      vars: Seq[NamedLambdaVariable]): Boolean = {
    def varsMatch(x: Expression, y: Expression): Boolean = (x, y) match {
      case (xv: NamedLambdaVariable, yv: NamedLambdaVariable) =>
        Set(xv.exprId, yv.exprId) == vars.map(_.exprId).toSet &&
          xv.exprId != yv.exprId
      case _ => false
    }
    e match {
      case If(EqualTo(x, y), Literal(1, IntegerType),
          Literal(0, IntegerType)) => varsMatch(x, y)
      case CaseWhen(Seq((EqualTo(x, y), Literal(1, IntegerType))),
          Some(Literal(0, IntegerType))) => varsMatch(x, y)
      case _ => false
    }
  }

  /** acc + v over exactly the two given lambda variables, either order. */
  private def isVarSum(e: Expression,
      vars: Seq[NamedLambdaVariable]): Boolean = e match {
    case Add(p: NamedLambdaVariable, q: NamedLambdaVariable, _) =>
      Set(p.exprId, q.exprId) == vars.map(_.exprId).toSet &&
        p.exprId != q.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(indicator,
              zipArgs @ Seq(_: NamedLambdaVariable, _: NamedLambdaVariable),
              _)),
            Literal(0, IntegerType),
            LambdaFunction(sum,
              aggArgs @ Seq(_: NamedLambdaVariable, _: NamedLambdaVariable),
              _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(finArg: NamedLambdaVariable), _))
          if isLongArray(a) && isLongArray(b) &&
            isEqIndicator(indicator,
              zipArgs.map(_.asInstanceOf[NamedLambdaVariable])) &&
            isVarSum(sum,
              aggArgs.map(_.asInstanceOf[NamedLambdaVariable])) &&
            fin.exprId == finArg.exprId =>
        LongArrayEqCount(a, b)
    }
}
