package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft.plans.DotProductRewrite: the declarative
  * aggregate(zip_with(a,b,*), 0L, +) dot product must be rewritten to the
  * codegen'd LongArrayDot primitive, with identical results including the
  * NULL edges (unequal lengths, null elements, null arrays).
  */
class DotProductRewriteSpec extends SparkSpec {

  private def declarativeDot(df: DataFrame): DataFrame =
    df.select(col("id"),
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("dot"))

  /** Parquet-backed so ConvertToLocalRelation can't eagerly evaluate the
    * plan into a LocalRelation (which would hide the rewrite). */
  private lazy val fixture: DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dot_fix_").toString
    Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (2L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](4L, 5L, 6L)),
      (3L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (4L, null, Seq[java.lang.Long](4L, 5L, 6L))
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rewrite fires and results match the lambda form edge-for-edge") {
    GraftExtensions.install(spark)
    val q = declarativeDot(fixture)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("long_array_dot"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"))
    val rows = q.orderBy(col("id")).collect()
    assert(rows(0).getLong(1) === 4 + 10 + 18)
    assert(rows(1).isNullAt(1)) // unequal lengths -> zip_with null pad
    assert(rows(2).isNullAt(1)) // null element poisons the sum
    assert(rows(3).isNullAt(1)) // null array
  }

  test("rewrite leaves non-matching folds alone") {
    GraftExtensions.install(spark)
    // max-combine instead of +: must NOT be rewritten
    val q = fixture.filter(col("id") === 1L).select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => greatest(acc, v)).as("m"))
    assert(!q.queryExecution.optimizedPlan.toString
      .contains("long_array_dot"))
    assert(q.collect().head.getLong(0) === 18L)
  }

  test("overflow follows the session's ANSI mode") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val key = "spark.sql.ansi.enabled"
    val prev = spark.conf.getOption(key)
    val df = {
      val dir = java.nio.file.Files.createTempDirectory("dot_ovf_").toString
      Seq((1L, Seq(Long.MaxValue, 0L), Seq(2L, 0L)))
        .toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    try {
      spark.conf.set(key, "false")
      // legacy: wraps like the lambda form (MaxValue * 2 == -2)
      assert(declarativeDot(df).collect().head.getLong(1) === -2L)
      spark.conf.set(key, "true")
      // ANSI: throws like the lambda form would
      intercept[Exception] { declarativeDot(df).collect() }
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("SQL form gets the same rewrite") {
    GraftExtensions.install(spark)
    val q = spark.sql(
      """SELECT aggregate(
        |  zip_with(array(1L, 2L), array(10L, 20L), (x, y) -> x * y),
        |  0L, (acc, v) -> acc + v) AS dot""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString
      .contains("long_array_dot"))
    assert(q.collect().head.getLong(0) === 50L)
  }
}
