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

  test("sign_lsh_signature callable from SQL; masks must be literal") {
    GraftExtensions.install(spark)
    // qe=[5,-3], mask bit0 set => plane (+1,-1): proj = 5+3 = 8 >= 0 ->
    // bit0; mask 0 => plane (-1,-1): proj = -2 < 0 -> bit1 clear
    val got = spark.sql(
      "SELECT sign_lsh_signature(array(5L, -3L), array(1L, 0L)) AS s")
      .collect().head.getLong(0)
    assert(got === 1L)
    // INT mask literals widen
    val gotInt = spark.sql(
      "SELECT sign_lsh_signature(array(5L, -3L), array(1, 0)) AS s")
      .collect().head.getLong(0)
    assert(gotInt === 1L)
    // non-literal masks are rejected at analysis time
    val err = intercept[Exception] {
      spark.sql("SELECT sign_lsh_signature(array(1L), array(rand()::BIGINT))")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
    // malformed masks surface the contract error, not NPE/CCE
    val errNull = intercept[Exception] {
      spark.sql(
        "SELECT sign_lsh_signature(array(1L), CAST(NULL AS ARRAY<BIGINT>))")
        .collect()
    }
    assert(errNull.getMessage.contains("non-NULL"), errNull.getMessage)
    val errElem = intercept[Exception] {
      spark.sql(
        "SELECT sign_lsh_signature(array(1L), array(1L, CAST(NULL AS BIGINT)))")
        .collect()
    }
    assert(errElem.getMessage.contains("NULL elements"), errElem.getMessage)
    val errType = intercept[Exception] {
      spark.sql("SELECT sign_lsh_signature(array(1L), 'xyz')").collect()
    }
    assert(errType.getMessage.contains("ARRAY<BIGINT>"), errType.getMessage)
  }

  test("rolling_hash_min callable from SQL after install") {
    GraftExtensions.install(spark)
    // both strings contain the 3-byte run "abc"; a shared window run
    // makes the shared min plausible — here asserted exactly via the
    // Scala Column API twin
    val row = spark.sql(
      "SELECT rolling_hash_min('abcabc', 3) AS a," +
        " rolling_hash_min('xy', 3) AS b").collect().head
    import org.apache.spark.sql.functions._
    val want = spark.range(1)
      .select(graft.functions.RollingHashMin(lit("abcabc"), 3))
      .collect().head.getLong(0)
    assert(row.getLong(0) === want)
    assert(row.isNullAt(1)) // shorter than the window -> NULL
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
