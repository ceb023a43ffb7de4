package graft.plans

import graft.functions.LongArrayDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the declarative integer dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[LongArrayDot]] primitive loop. Higher-order
  * function lambdas are CodegenFallback (interpreted, one intermediate
  * array per row); the rewrite was measured ~20x faster on the 2M-pair
  * embedding near-dup join. Users keep writing the idiomatic composable
  * form — in Scala or SQL — and get the fast path from the optimizer,
  * exactly the "declare the plan, let Catalyst pick the execution"
  * contract the engine is built on.
  *
  * Edge-for-edge equivalent (see LongArrayDot's scaladoc): NULL inputs,
  * unequal lengths, and NULL elements all yield NULL in both forms, and
  * Long overflow follows the session's ANSI mode in both forms — the
  * substituted LongArrayDot carries failOnError = conf.ansiEnabled, so
  * it throws under ANSI exactly where the lambda form would.
  *
  * Install: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or post-hoc via `GraftExtensions.install(spark)`
  * (spark.experimental.extraOptimizations).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** x * y over exactly the two given lambda variables, either order. */
  private def isVarProduct(e: Expression,
      vars: Seq[NamedLambdaVariable]): Boolean = e match {
    case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
      Set(x.exprId, y.exprId) == vars.map(_.exprId).toSet &&
        x.exprId != y.exprId
    case _ => false
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
            ZipWith(a, b, LambdaFunction(product,
              zipArgs @ Seq(_: NamedLambdaVariable, _: NamedLambdaVariable),
              _)),
            Literal(0L, LongType),
            LambdaFunction(sum,
              aggArgs @ Seq(_: NamedLambdaVariable, _: NamedLambdaVariable),
              _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(finArg: NamedLambdaVariable), _))
          if isLongArray(a) && isLongArray(b) &&
            isVarProduct(product,
              zipArgs.map(_.asInstanceOf[NamedLambdaVariable])) &&
            isVarSum(sum,
              aggArgs.map(_.asInstanceOf[NamedLambdaVariable])) &&
            fin.exprId == finArg.exprId =>
        LongArrayDot(a, b, conf.ansiEnabled)
    }
}
