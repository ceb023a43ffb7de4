package graft

import org.apache.spark.sql.types._

/** Guard against the driver regenerating /root/testdata with a physical
  * encoding the engine cannot load (VERDICT r7: a NANOS→MICROS `events.ts`
  * swap crashed 24 queries with 36 opaque test failures). This spec fails
  * loudly with the OBSERVED type per table/column, turning a future
  * fixture change into a one-line diagnosis.
  *
  * Contract checked, per scale factor:
  *  1. every table opens and its schema contains the expected columns;
  *  2. `events.ts` (whatever its footer encoding) normalizes to
  *     session-TZ TimestampType via Tables.events, and the values land in
  *     a sane epoch range (not 1970 — the signature of a micros-as-nanos
  *     misread, which corrupts silently instead of crashing);
  *  3. the streaming reader agrees with the batch reader on both schema
  *     and the max(ts) high-water mark.
  */
class FixtureContractSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)

  private val expectedCols: Map[String, Seq[String]] = Map(
    "region"    -> Seq("r_regionkey", "r_name"),
    "nation"    -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"  -> Seq("c_custkey", "c_name", "c_nationkey"),
    "supplier"  -> Seq("s_suppkey", "s_name", "s_nationkey"),
    "part"      -> Seq("p_partkey", "p_name"),
    "orders"    -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
    "lineitem"  -> Seq("l_orderkey", "l_partkey", "l_quantity"),
    "events"    -> Seq("event_id", "ts", "user_id", "event_type", "value"),
    "documents" -> Seq("doc_id", "text", "source"),
    "embeddings"-> Seq("vec_id", "embedding"))

  for (d <- sfDirs) {
    test(s"all tables load with expected columns [$d]") {
      for ((name, cols) <- expectedCols) {
        val df =
          try {
            // events goes through the ENGINE reader (the type-adaptive
            // path is the load contract under test); a raw read would
            // reject encodings the engine handles (e.g. nanos)
            if (name == "events") graft.ops.Tables.events(spark, d)
            else graft.ops.Tables.table(spark, d, name)
          } catch {
            case e: Exception =>
              fail(s"$d/$name.parquet failed to open: ${e.getMessage}")
          }
        val have = df.schema.fieldNames.toSet
        val missing = cols.filterNot(have)
        assert(missing.isEmpty,
          s"$d/$name.parquet missing $missing; observed schema: " +
            df.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
              .mkString(", "))
        // touch actual data pages, not just the footer — a decode-level
        // break (illegal physical type, bad dictionary) only throws on
        // materialization, and at the smallest sf that's cheap
        if (d.endsWith("sf0.001")) {
          val n =
            try df.count()
            catch {
              case e: Exception =>
                fail(s"$d/$name.parquet opened but failed to DECODE " +
                  s"(schema ${df.schema.simpleString}): ${e.getMessage}")
            }
          assert(n > 0, s"$d/$name.parquet decoded but is empty")
        }
      }
    }

    test(s"tier-C key columns keep their engine-contract types [$d]") {
      // driver-side getters (getLong, getSeq[Long], getString) and the
      // quantize/probe pipelines bind these exact types; a fixture
      // regeneration that narrows doc_id/vec_id to int or widens the
      // embedding element to double should fail HERE with a one-line
      // diagnosis, not deep inside a probe (the round-7 events lesson,
      // applied to the tier-C tables)
      val docs = graft.ops.Tables.documents(spark, d)
      for ((c, t) <- Seq("doc_id" -> LongType, "text" -> StringType,
          "source" -> StringType, "n_chars" -> LongType))
        assert(docs.schema(c).dataType == t,
          s"$d/documents.parquet $c: expected ${t.simpleString}, got " +
            docs.schema(c).dataType.simpleString)
      val emb = graft.ops.Tables.embeddings(spark, d)
      assert(emb.schema("vec_id").dataType == LongType,
        s"$d/embeddings.parquet vec_id: got " +
          emb.schema("vec_id").dataType.simpleString)
      assert(emb.schema("embedding").dataType ==
        org.apache.spark.sql.types.ArrayType(FloatType, true) ||
        emb.schema("embedding").dataType ==
        org.apache.spark.sql.types.ArrayType(FloatType, false),
        s"$d/embeddings.parquet embedding: expected array<float>, got " +
          emb.schema("embedding").dataType.simpleString)
    }

    test(s"events.ts normalizes to TimestampType with sane values [$d]") {
      val ev = graft.ops.Tables.events(spark, d)
      val tsType = ev.schema("ts").dataType
      assert(tsType == TimestampType,
        s"Tables.events must yield session-TZ TimestampType; got " +
          s"${tsType.simpleString} — raw footer type is " +
          spark.read.parquet(s"$d/events.parquet").schema("ts")
            .dataType.simpleString)
      val row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").head()
      val lo = row.getTimestamp(0).toInstant
      val hi = row.getTimestamp(1).toInstant
      // a micros-read-as-nanos bug lands everything in Jan 1970; a
      // nanos-read-as-micros bug lands ~year 54000. Either is far
      // outside any plausible fixture range.
      val floor = java.time.Instant.parse("2000-01-01T00:00:00Z")
      val ceil  = java.time.Instant.parse("2100-01-01T00:00:00Z")
      assert(!lo.isBefore(floor) && hi.isBefore(ceil),
        s"events.ts range [$lo, $hi] is outside [2000, 2100) — the " +
          "reader is misinterpreting the parquet timestamp unit")
    }
  }

  test("streaming events reader agrees with the batch reader") {
    val d = sf // sf0.001 — cheapest full replay
    val batch = graft.ops.Tables.events(spark, d)
    val stream = graft.streaming.Streams.eventsStream(spark, d)
    assert(stream.schema("ts").dataType == TimestampType,
      s"eventsStream ts is ${stream.schema("ts").dataType.simpleString}, " +
        "expected TimestampType")
    assert(stream.schema.fieldNames.toSeq == batch.schema.fieldNames.toSeq,
      "batch/stream column order diverged: " +
        s"${batch.schema.fieldNames.toSeq} vs ${stream.schema.fieldNames.toSeq}")
    val name = "fixture_contract_hw"
    val q = stream.selectExpr("max(ts) AS hi")
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_fc_").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamHi = spark.table(name).head().getTimestamp(0)
    val batchHi = batch.selectExpr("max(ts)").head().getTimestamp(0)
    assert(streamHi == batchHi,
      s"stream max(ts)=$streamHi != batch max(ts)=$batchHi — the stream " +
        "schema is misinterpreting the timestamp encoding")
  }
}
