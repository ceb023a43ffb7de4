package graft

import org.apache.spark.sql.DataFrame

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
}
