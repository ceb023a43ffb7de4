package graft

import graft.functions.{LongArrayDot, SortedLongArrayIntersectSize}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: exposes the engine's custom Catalyst
  * expressions to SQL users, so `spark.sql("SELECT long_array_dot(a, b)")`
  * works next to the Scala Column API.
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}

object GraftExtensions {
  private[graft] val functionDescriptors = Seq(
    (new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (children: Seq[Expression]) => LongArrayDot(children(0), children(1))
        : Expression),
    (new FunctionIdentifier("sorted_long_array_intersect_size"),
      new ExpressionInfo(classOf[SortedLongArrayIntersectSize].getName,
        null, "sorted_long_array_intersect_size",
        // SQL callers don't see the Scaladoc, so the precondition that
        // makes the two-pointer merge correct is stated HERE: unsorted
        // or duplicate-bearing input silently undercounts.
        "_FUNC_(a, b) - Size of the intersection of two ARRAY<BIGINT> " +
          "columns that MUST each be sorted ascending with distinct " +
          "elements (e.g. via sort_array(array_distinct(x))); unsorted " +
          "input silently undercounts. NULL array, or a NULL element " +
          "reached by the merge scan, yields NULL.",
        "> SELECT _FUNC_(array(1L, 3L, 5L), array(3L, 4L, 5L));\n  2"),
      (children: Seq[Expression]) =>
        SortedLongArrayIntersectSize(children(0), children(1)): Expression),
  )

  /** Register on an already-built session (test/REPL convenience):
    * the SQL functions plus the dot-product optimizer rewrite (via the
    * public experimental extraOptimizations hook; idempotent). */
  def install(spark: SparkSession): Unit = {
    functionDescriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.DotProductRewrite)
  }

  /** Register the sf-dir parquet tables as temp views so the whole query
    * surface is reachable from `spark.sql` — the engine's SQL front door.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      ops.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    ops.Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }
}
