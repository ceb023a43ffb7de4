package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O-135 (q87f): the unified-dedup funnel — the q61c five-family weld
  * set consumed as a funnel stage (VERDICT r14 #3: the flagship
  * artifact was produced but never load-bearing end-to-end). */
class UnifiedFunnelSpec extends SparkSpec {

  private def byName(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("q87f: non-shingle welds drop documents the exact-Jaccard rule " +
    "keeps — the unified stage is strictly stronger than q87c's") {
    val uni = byName(ops.Dedup.q87fFunnelUnified(spark, sf))
    val ext = byName(ops.Dedup.q87cFunnelExtended(spark, sf))
    // same pipeline through the exact-dedup stage
    assert(uni("input") === ext("input"))
    assert(uni("exact_dedup") === ext("exact_dedup"))
    // the unified drop set CONTAINS the shingle drop set (a doc_b of
    // any exact-Jaccard pair shares a component with a lower id, so
    // keep-min drops it too) — and at this fixture the four extra
    // families (SimHash, emb_lsh paraphrase, image aHash, audio
    // ehash) weld documents the shingle rule cannot see, so the
    // survivor count must be STRICTLY smaller
    assert(uni("unified_dedup") < ext("near_dup"),
      s"unified stage kept ${uni("unified_dedup")} vs q87c's " +
        s"${ext("near_dup")} — no non-shingle weld dropped a document")
    assert(uni("unified_dedup") > 0)
  }

  test("q87i ship rule: the quality election keeps the LONGEST weld " +
    "member where the min-id rule keeps the truncated copy (O-139 " +
    "consumed)") {
    import spark.implicits._
    // doc 1 is a truncated scrape of doc 2 (40 of its 44 tokens) —
    // shingle Jaccard 38/42 >= 0.5 welds them into one component;
    // min-id ships the truncated 1, the election ships the full 2
    val full = (1 to 44).map(i => s"tw$i").mkString(" ")
    val truncated = (1 to 40).map(i => s"tw$i").mkString(" ")
    val docs = Seq((1L, truncated), (2L, full)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val minId = ops.Dedup
      .unifiedNonCanonical(docs, emb, noPairs, noPairs)
      .collect().map(_.getLong(0)).toSet
    val elected = ops.Dedup
      .unifiedNonElected(docs, emb, noPairs, noPairs)
      .collect().map(_.getLong(0)).toSet
    assert(minId === Set(2L))
    assert(elected === Set(1L))
  }
}
