package graft

import graft.ops.Windows
import graft.streaming.Streams

/** SURVEY.md §5.2.4: batch/stream parity — the same aggregation computed
  * through the batch plan (q33) and through a real streaming query (s01)
  * must produce identical results on a finite input. */
class BatchStreamParitySpec extends SparkSpec {

  test("streaming tumbling windows (s01) == batch time buckets (q33)") {
    val batch = Windows.q33TimeBucket(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = Streams.s01StreamTumbling(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
  }

  test("stream-stream interval join (s08) == batch interval join") {
    import org.apache.spark.sql.functions._
    val ev = ops.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
    val batch = clicks.join(errors,
      col("c_user") === col("e_user") &&
        col("err_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES") &&
        col("err_ts") <= col("click_ts"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("err_id"), col("click_ts"), col("err_ts"))
      .orderBy(col("click_id"), col("err_id"))
      .collect().map(_.toSeq).toSeq
    val stream = Streams.s08StreamStreamJoin(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
  }

  test("streaming decontamination (s11) == batch decontaminate (q65)") {
    // identical rows through the stream-static topology (the broadcast
    // of the static eval-shingle side is declared with an explicit
    // broadcast() hint in s11 itself; this test pins the semantics)
    val batch = ops.Dedup.decontaminate(
        ops.Tables.documents(spark, sf), "src0", 10L)
      .collect().map(_.toSeq).toSeq
    val streamDf = Streams.s11StreamDecontaminate(spark, sf)
    val stream = streamDf.collect().map(_.toSeq).toSeq
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("streaming outlier screen (s13) == batch centroid distances") {
    import org.apache.spark.sql.functions._
    val emb = ops.Tables.embeddings(spark, sf)
    val batch = ops.Similarity.centroidDist2(emb,
        ops.Similarity.flooredLabelCentroids(emb))
      .filter(col("dist2") >= ops.Similarity.OutlierScreenDist2)
      .orderBy(col("vec_id"))
      .collect().map(_.toSeq).toSeq
    val stream = Streams.s13StreamOutlierScreen(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("streaming vector ingest (s17) == batch frozen-model append (q88)") {
    // append-equals-rebuild composed across micro-batches: however
    // AvailableNow slices the arriving vectors, the drained store's
    // probe must equal the one-shot q88 append's (each ivfAppend is a
    // pure function of (vector, frozen model))
    val batch = ops.Similarity.q88IvfAppend(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = Streams.s17StreamVectorIngest(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("streaming tf maintenance (s18) == batch retrain (q72)") {
    // model additivity across micro-batches: however AvailableNow
    // slices the arriving docs, scoring against the stream-built store
    // must equal scoring against the in-query full retrain
    val batch = ops.TextAnalysis.q72CorpusFreqScore(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = Streams.s18StreamTfMaintain(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("stateful counter (s07) == batch per-user aggregate") {
    import org.apache.spark.sql.functions._
    val batch = ops.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
        max(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))
      .collect().map(_.toSeq).toSeq
    val stream = Streams.s07StatefulCounter(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
  }
}
