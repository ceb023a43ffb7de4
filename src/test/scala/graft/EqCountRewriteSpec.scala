package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft.plans.EqCountRewrite: the declarative
  * aggregate(zip_with(a,b,(x,y)->if(x=y,1,0)), 0, +) agreement count
  * must be rewritten to the codegen'd LongArrayEqCount primitive, with
  * identical results including the edges (unequal lengths, null
  * elements contribute 0; null arrays yield NULL).
  */
class EqCountRewriteSpec extends SparkSpec {

  private def declarativeCount(df: DataFrame): DataFrame =
    df.select(col("id"),
      aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("n"))

  /** Parquet-backed so ConvertToLocalRelation can't eagerly evaluate
    * the plan into a LocalRelation (which would hide the rewrite). */
  private lazy val fixture: DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eqc_fix_").toString
    Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L, 3L)),
      (2L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 6L)),
      (3L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 5L, 3L)),
      (4L, null, Seq[java.lang.Long](4L, 5L, 6L))
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rewrite fires and results match the lambda form edge-for-edge") {
    GraftExtensions.install(spark)
    val q = declarativeCount(fixture)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("long_array_eq_count"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"))
    val rows = q.orderBy(col("id")).collect()
    assert(rows(0).getInt(1) === 2) // positions 0 and 2 agree
    assert(rows(1).getInt(1) === 2) // pad-with-NULL position contributes 0
    assert(rows(2).getInt(1) === 2) // null element contributes 0
    assert(rows(3).isNullAt(1))     // null array
  }

  test("rewrite leaves non-matching shapes alone") {
    GraftExtensions.install(spark)
    // a different indicator (x < y) must NOT be rewritten
    val q = fixture.filter(col("id") === 1L).select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => when(x < y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).as("n"))
    assert(!q.queryExecution.optimizedPlan.toString
      .contains("long_array_eq_count"))
    assert(q.collect().head.getInt(0) === 1) // only 2 < 9
  }

  test("SQL if-form gets the same rewrite") {
    GraftExtensions.install(spark)
    val q = spark.sql(
      """SELECT aggregate(
        |  zip_with(array(1L, 2L, 3L), array(1L, 5L, 3L),
        |    (x, y) -> if(x = y, 1, 0)),
        |  0, (acc, v) -> acc + v) AS n""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString
      .contains("long_array_eq_count"))
    assert(q.collect().head.getInt(0) === 2)
  }
}
