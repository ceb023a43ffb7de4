package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Planted-skew evidence for the shingle self-join (VERDICT r5 #3): a
  * 100 TB corpus has hot shingles, and AQE's skew-join rule cannot
  * split q36's join (user-repartition origin, one exchange reused by
  * both sides — see shingleSelfJoin scaladoc). These tests plant one
  * shingle in 30% of docs and measure that the salt knob actually
  * spreads the hot key's candidate fan-out, without changing results.
  */
class DedupSkewSpec extends SparkSpec {

  /** 300 docs; 30% share the hot leading shingle, each doc carries a
    * unique tail; three exact-duplicate pairs guarantee near-dup output
    * rows so the equality assertion is non-vacuous. */
  private lazy val skewedDocs = {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val tail = s"u${i}a u${i}b u${i}c u${i}d"
      val text =
        if (i % 10 < 3) s"alpha beta gamma $tail" // hot shingle carriers
        else s"c${i}x c${i}y c${i}z $tail"
      // 3 exact-dup pairs: docs 900+j duplicate docs j (j=0: hot pair)
      (i.toLong, text)
    } ++ (0 until 3).map(j => (900L + j, if (j == 0)
      "alpha beta gamma u0a u0b u0c u0d"
    else s"c${j}x c${j}y c${j}z u${j}a u${j}b u${j}c u${j}d"))
    rows.toDF("doc_id", "text")
  }

  test("salted nearDupPairs returns exactly the unsalted pairs") {
    val key = "spark.graft.neardup.saltBuckets"
    val unsalted = Dedup.nearDupPairs(skewedDocs).collect().toSeq
    assert(unsalted.nonEmpty) // the planted exact dups must surface
    spark.conf.set(key, "8")
    try {
      val salted = Dedup.nearDupPairs(skewedDocs).collect().toSeq
      assert(salted === unsalted)
    } finally spark.conf.unset(key)
  }

  test("salt spreads the hot shingle's candidate fan-out across tasks") {
    // AQE partition coalescing is disabled for the MEASUREMENT only: at
    // test scale every post-shuffle partition is a few KB, so AQE merges
    // all reads into one task and hides the per-key distribution — at
    // production scale a hot single-key partition is the one thing
    // coalescing can never split, which is the scenario under test.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    def partitionStats(saltBuckets: Int): (Long, Long) = {
      val sh = Dedup.hashedShingles(skewedDocs).repartition(col("h"))
      val row = Dedup.shingleSelfJoin(sh, saltBuckets)
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("mx"), sum(col("n")).as("total"))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    spark.conf.set(coalesceKey, "false")
    try {
      val (hotMax, total) = partitionStats(1)
      val (saltMax, saltTotal) = partitionStats(8)
      // identical matched multiset size either way
      assert(saltTotal === total)
      // unsalted: the ~91 hot-shingle docs produce ~4.1k candidate rows
      // in ONE task (measured 4103/8206); salted by 8 over 4 shuffle
      // partitions the max task drops ~3x (measured 1343 on the
      // 300-doc corpus). Assert a conservative 2x so hash placement
      // noise can't flake the test.
      assert(hotMax > total / 2,
        s"fixture not skewed enough: $hotMax/$total")
      assert(saltMax * 2 <= hotMax,
        s"salt did not spread the hot key: salted max $saltMax vs $hotMax")
    } finally spark.conf.unset(coalesceKey)
  }

  test("segmentDedup shuffle fallback agrees with forced broadcast on " +
      "a heavy-dup corpus") {
    import spark.implicits._
    // planted HEAVY duplication — the regime the broadcast assumption
    // breaks in: 200 docs of 3 segments each, middle segment shared by
    // ALL docs, first segment shared pairwise, last unique. The dup set
    // here is a large fraction of the segment vocabulary.
    val words = (tag: String, i: Int) =>
      (0 until 8).map(k => s"$tag${i}w$k").mkString(" ")
    val docs = (0 until 200).map { i =>
      val shared = (0 until 8).map(k => s"sharedw$k").mkString(" ")
      (i.toLong, s"${words("p", i / 2)} $shared ${words("u", i)}")
    }.toDF("doc_id", "text")
    val joinKey = "spark.graft.segdedup.dupJoin"
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    def run(mode: String, threshold: Option[String]) = {
      val prev = spark.conf.get(bcastKey)
      spark.conf.set(joinKey, mode)
      threshold.foreach(spark.conf.set(bcastKey, _))
      try Dedup.segmentDedup(docs).collect().map(_.toSeq).toSeq
      finally { spark.conf.unset(joinKey); spark.conf.set(bcastKey, prev) }
    }
    val broadcastPath = run("broadcast", None)
    // threshold -1 disables broadcast entirely: auto mode MUST take the
    // shuffle-join fallback and still produce identical output
    val shufflePath = run("auto", Some("-1"))
    assert(shufflePath === broadcastPath)
    // sanity on the semantics: every doc kept only its unique tail
    // (first+middle segments are all duplicated across docs)
    assert(broadcastPath.size === 200)
    assert(broadcastPath.forall(r => r(2).asInstanceOf[Long] === 1L))
  }
}
