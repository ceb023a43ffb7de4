package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O-133/O-134: the incremental curation funnel (q87e) and its stream
  * twin's append protocol (s23). The core property is COMPOSITIONAL
  * incremental-equals-full-recompute: each stage's standing-store
  * admission is individually proven (q83, q85), but the verdict-r14
  * gap was the composition — so the split test here drives the exact
  * s23 protocol (two sequential halves, exact-survivor hash + band
  * appends between) and asserts the summed per-stage counts equal the
  * one-shot run against pristine stores. */
class IncrementalFunnelSpec extends SparkSpec {

  private def injected = ops.TextAnalysis.injectPii(
    ops.Tables.documents(spark, sf))

  private def batchAll: DataFrame = injected
    .filter(col("doc_id") >= 250)
    .unionByName(injected.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + ops.Dedup.ReKeyOffset))

  private def counts(df: DataFrame): Seq[(Int, String, Long)] =
    df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)

  /** One full pass over `batch` against the stores at `dir`,
    * returning the 8 stage counts; when `append` is set, runs s23's
    * steady-state index appends (exact-survivor hashes + band rows)
    * after screening — the protocol that makes a later half see this
    * half's documents. */
  private def runOnce(dir: String, batch: DataFrame,
      append: Boolean): Seq[(Int, String, Long)] = {
    val frames = ops.Dedup.incrementalFunnelFrames(spark, dir, batch)
    if (append) {
      val exactSurv = frames(2)._3
      ops.Dedup.dedupIndexWriteHashes(
        exactSurv.select(sha2(col("text").cast("binary"), 256)
          .as("content_hash")), s"$dir/exact", "append")
      ops.Dedup.neardupIndexWrite(exactSurv, s"$dir/neardup", "append")
    }
    val admitted = ops.Dedup.manifestAppendReadBack(spark, dir,
      frames.last._3, frames.head._3)
    counts(ops.Dedup.funnelCounts(
      frames :+ ((7, "manifest_append", admitted))))
  }

  test("q87e: stage counts are load-bearing — the planted re-keyed " +
    "exact duplicates all drop at the exact screen") {
    val got = counts(ops.Dedup.q87eIncrementalFunnel(spark, sf))
    assert(got.map(_._2) === Seq("input", "pii_scrub", "exact_screen",
      "neardup_screen", "repetition", "quality", "decontaminate",
      "manifest_append"))
    val byName = got.map(t => t._2 -> t._3).toMap
    // the 50 re-keyed corpus copies are exact duplicates of standing
    // corpus docs: the screen must reject every one of them
    assert(byName("exact_screen") <= byName("input") - 50)
    // monotone non-increasing from stage 1 on; manifest read-back
    // equals the admitted set
    got.map(_._3).sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(byName("manifest_append") === byName("decontaminate"))
    assert(byName("manifest_append") > 0)
  }

  test("incremental-equals-full-recompute composes: two sequential " +
    "halves with the s23 append protocol sum to the one-shot counts") {
    val oneDir = java.nio.file.Files
      .createTempDirectory("incfunnel_one_").toString
    ops.Dedup.incrementalFunnelStoresBuild(spark, sf, oneDir)
    val oneShot = runOnce(oneDir, batchAll, append = false)

    val splitDir = java.nio.file.Files
      .createTempDirectory("incfunnel_split_").toString
    ops.Dedup.incrementalFunnelStoresBuild(spark, sf, splitDir)
    // the s23 split: ids ascending across halves (the split-invariance
    // precondition — arrival order must be id order)
    val loHalf = batchAll.filter(col("doc_id") < 275)
    val hiHalf = batchAll.filter(col("doc_id") >= 275)
    val first = runOnce(splitDir, loHalf, append = true)
    val second = runOnce(splitDir, hiHalf, append = true)
    val summed = first.zip(second).map { case ((i, n, a), (j, m, b)) =>
      assert(i === j && n === m); (i, n, a + b)
    }
    assert(summed === oneShot,
      "splitting the batch changed the summed funnel counts — the " +
        "standing-store admission chain does not compose")
    // both halves did real work (guards against a degenerate split)
    assert(first.head._3 > 0 && second.head._3 > 0)
  }
}
