package graft

class ExtensionsSpec extends SparkSpec {

  test("long_array_dot callable from SQL after install") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(got === 4 + 10 + 18)
  }

  test("sorted_long_array_intersect_size callable from SQL after install") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT sorted_long_array_intersect_size(" +
        "array(1L, 3L, 5L, 9L), array(2L, 3L, 9L, 11L)) AS n")
      .collect().head.getLong(0)
    assert(got === 2L)
  }

  test("registerTables exposes the full surface to spark.sql") {
    GraftExtensions.registerTables(spark, sf)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 6000)
    val ev = spark.sql("SELECT max(ts) FROM events").collect().head
    assert(!ev.isNullAt(0)) // nanos ts converted, readable from SQL
  }
}
