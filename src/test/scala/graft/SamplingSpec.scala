package graft

import org.apache.spark.sql.functions._

/** graft.ops.Sampling + TextAnalysis.q58TfidfTopk: semantic invariants
  * beyond the oracle hash-match. */
class SamplingSpec extends SparkSpec {

  test("hash split is stable, exhaustive, and roughly 80/10/10") {
    val out = ops.Sampling.q59HashSplit(spark, sf)
    val counts = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total === ops.Tables.documents(spark, sf).count())
    // md5 buckets are uniform: 80/10/10 within generous tolerance
    assert(counts("train") > total * 6 / 10)
    assert(counts("val") < total * 2 / 10)
    assert(counts("test") < total * 2 / 10)
    // determinism: same assignment on a re-run
    val again = ops.Sampling.q59HashSplit(spark, sf)
    assert(out.collect().toSeq === again.collect().toSeq)
  }

  test("source quota caps every source at 20 and ranks from 1") {
    val out = ops.Sampling.q60SourceQuota(spark, sf)
    val bySource = out.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), min(col("rn")).as("lo"),
        max(col("rn")).as("hi"))
      .collect()
    assert(bySource.nonEmpty)
    bySource.foreach { r =>
      assert(r.getLong(1) <= 20)
      assert(r.getInt(2) === 1)
      assert(r.getInt(3).toLong === r.getLong(1)) // ranks are dense 1..n
    }
  }

  test("tfidf top-k: at most 5 terms per doc, ranks dense, scores ordered") {
    val out = ops.TextAnalysis.q58TfidfTopk(spark, sf).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val ranked = rows.sortBy(_.getInt(5))
      assert(ranked.map(_.getInt(5)).toSeq === (1 to rows.length))
      // scores non-increasing with rank
      val scores = ranked.map(_.getLong(4)).toSeq
      assert(scores === scores.sorted(Ordering[Long].reverse))
    }
  }
}
