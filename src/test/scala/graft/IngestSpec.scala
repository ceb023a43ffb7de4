package graft

import java.sql.Timestamp

import graft.sources.{Ingest, Wrap32}
import org.apache.spark.sql.functions._

/** Golden end-to-end fixture tests (SURVEY.md §5.2.5, FIXTURES.md §2):
  * the reference's exact input shapes through our parsers. */
class IngestSpec extends SparkSpec {

  private val sizesJson =
    """{ "sizes": {
      |  "tests/unittests": {
      |    "samr21-xpro": {"bss": 11224, "text": 62418, "data": 596, "count": 1},
      |    "native":      {"bss": 24640, "text": 89337, "data": 1040} },
      |  "examples/hello-world": {
      |    "samr21-xpro": {"bss": 2424, "text": 8340, "data": 120} }
      |} }""".stripMargin

  test("flattenSizes: one row per cell, dec derived, count defaults 0") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2026-08-01 03:10:00")
    val raw = Seq((sizesJson, ts)).toDF("payload", "artifact_ts")
    val got = Ingest.flattenSizes(raw)
      .orderBy(col("test"), col("board"))
      .as[(Timestamp, String, String, Long, Long, Long, Long, Long)]
      .collect()
    assert(got.toSeq === Seq(
      (ts, "examples/hello-world", "samr21-xpro", 2424L, 8340L, 120L,
        10884L, 0L),
      (ts, "tests/unittests", "native", 24640L, 89337L, 1040L, 115017L, 0L),
      (ts, "tests/unittests", "samr21-xpro", 11224L, 62418L, 596L,
        74238L, 1L)))
  }

  test("parseCommitLog: \\x1f split, tz parse, first digit-run") {
    import spark.implicits._
    val us = "\u001f"
    val lines = Seq(
      s"8c03a1${us}2026-08-01 01:42:13 +0200${us}Merge pull request #21504 from maintainer/branch",
      s"4fe177${us}2026-07-31 22:10:05 +0000${us}Merge #21498: cpu/stm32: fix clock init",
      s"9a0b11${us}2026-07-30 08:00:00 +0000${us}Merge branch without digits"
    ).toDF("value")
    val got = Ingest.parseCommitLog(lines)
      .select(col("hash"), col("commit_ts").cast("string"), col("pr_num"))
      .as[(String, String, Option[Long])].collect().toSeq
    assert(got === Seq(
      // +0200 normalized to UTC (session tz)
      ("8c03a1", "2026-07-31 23:42:13", Some(21504L)),
      ("4fe177", "2026-07-31 22:10:05", Some(21498L)),
      ("9a0b11", "2026-07-30 08:00:00", None)))
  }

  test("wrap32 matches textwrap.wrap semantics at the fixture cases") {
    assert(Wrap32.wrap("short") === "short")
    assert(Wrap32.wrap("") === "")
    assert(Wrap32.wrap(null) === "")
    // 32-char boundary: no wrap at exactly 32
    val exact = "a" * 32
    assert(Wrap32.wrap(exact) === exact)
    val wrapped = Wrap32.wrap(
      "cpu/stm32: fix clock init for the l4 family boards")
    assert(wrapped === "cpu/stm32: fix clock init for<br>the l4 family boards")
    wrapped.split("<br>").foreach(line => assert(line.length <= 32))
  }

  test("fetcher golden path: localhost HTTP -> fromFetched -> backfill") {
    import graft.sources.{Fetcher, Pipeline}
    import spark.implicits._
    // a real HTTP round-trip with zero egress: the JDK's own HttpServer
    // serves the reference's artifact layout ({hash}/sizes.json with a
    // Last-Modified header, rg.py:96-104) on a loopback port, and the
    // real java.net.http client fetches it
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val body =
      """{"sizes":{"t1":{"b1":{"bss":1,"text":2,"data":3,"count":4}}}}"""
    server.createContext("/", { exchange =>
      val path = exchange.getRequestURI.getPath
      if (path.endsWith("/sizes.json") && !path.contains("missing")) {
        exchange.getResponseHeaders.set("Last-Modified",
          "Sat, 01 Aug 2026 10:05:00 GMT")
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } else exchange.sendResponseHeaders(404, -1L)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // one good artifact, one 404 probe (skipped, rg.py:75-82 semantics)
      val fetched = Fetcher.fetchAll(Iterator(
        s"$base/aaa111f/sizes.json", s"$base/missing0/sizes.json"))
      val artifacts = Ingest.artifactsFromFetched(
        Ingest.fromFetched(spark, fetched))
      val us = ""
      val lines = Seq(
        s"aaa111f${us}2026-08-01 10:00:00 +0000${us}Merge #7 x"
      ).toDF("value")
      val prDim = Seq((7L, "seven")).toDF("pr_num", "title")
      val (builds, events) = Pipeline.backfill(lines, artifacts, prDim)
      val rows = builds
        .select(col("ts").cast("string"), col("test"), col("board"),
          col("dec"), col("count"))
        .as[(String, String, String, Long, Long)].collect().toSeq
      // Last-Modified header became artifact_ts; the 404 never surfaced
      assert(rows === Seq(("2026-08-01 10:05:00", "t1", "b1", 6L, 4L)))
      assert(events.count() === 1L)
    } finally server.stop(0)
  }

  test("pulls-JSON golden path: localhost HTTP -> prDimFromFetched") {
    import graft.sources.Fetcher
    import spark.implicits._
    // the GitHub `pulls/{num}` twin of the sizes.json loopback test
    // (rg.py:356-362): same client, same fromFetched batching, with the
    // pulls payload carrying its own `number` key
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val path = exchange.getRequestURI.getPath
      val num = path.split("/").last
      if (path.contains("/pulls/") && num.forall(_.isDigit)) {
        val body =
          s"""{"number":$num,"title":"title-$num","state":"closed"}"""
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } else exchange.sendResponseHeaders(404, -1L)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // two live PRs and one 404 probe (skipped by the fetcher)
      val fetched = Fetcher.fetchAll(Iterator(
        s"$base/repos/RIOT-OS/RIOT/pulls/7",
        s"$base/repos/RIOT-OS/RIOT/pulls/102",
        s"$base/repos/RIOT-OS/RIOT/pulls/nope"))
      val prDim = Ingest.prDimFromFetched(Ingest.fromFetched(spark, fetched))
      val rows = prDim.as[(Long, String)].collect().toSeq.sorted
      assert(rows === Seq((7L, "title-7"), (102L, "title-102")))
      // the fetched dimension drives prEvents exactly like a literal one
      val us = ""
      val commits = Ingest.parseCommitLog(Seq(
        s"aaa111f${us}2026-08-01 10:00:00 +0000${us}Merge #7 x").toDF("value"))
      val ev = Ingest.prEvents(commits, prDim)
      assert(ev.select("description").as[String].collect().toSeq ===
        Seq("title-7"))
    } finally server.stop(0)
  }

  test("latest alias golden path: localhost HTTP -> resolveLatestAlias") {
    import graft.sources.{Fetcher, Pipeline}
    import spark.implicits._
    // the CI server's magic hash key (rg.py:90-91): /master/latest/
    // sizes.json serves the newest nightly, keyed only by Last-Modified.
    // The engine re-keys it to the last commit before the run
    // (README.md:19-20) and then backfill treats it like any artifact.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val latestBody =
      """{"sizes":{"t1":{"b1":{"bss":10,"text":20,"data":30}}}}"""
    val oldBody =
      """{"sizes":{"t1":{"b1":{"bss":1,"text":2,"data":3,"count":4}}}}"""
    server.createContext("/", { exchange =>
      val path = exchange.getRequestURI.getPath
      val (code, body, lm) =
        if (path == "/RIOT-OS/RIOT/master/latest/sizes.json")
          (200, latestBody, "Sun, 02 Aug 2026 05:10:00 GMT")
        else if (path == "/RIOT-OS/RIOT/master/aaa111f/sizes.json")
          (200, oldBody, "Sat, 01 Aug 2026 10:05:00 GMT")
        else (404, "", "")
      if (code == 200) {
        exchange.getResponseHeaders.set("Last-Modified", lm)
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      } else exchange.sendResponseHeaders(404, -1L)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetched = Fetcher.fetchAll(Iterator(
        s"$base/RIOT-OS/RIOT/master/aaa111f/sizes.json",
        s"$base/RIOT-OS/RIOT/master/latest/sizes.json"))
      val artifacts = Ingest.artifactsFromFetched(
        Ingest.fromFetched(spark, fetched))
      // the default pattern accepts the alias key verbatim
      assert(artifacts.select("hash").as[String].collect().toSet ===
        Set("aaa111f", "latest"))
      val us = ""
      // bbb222e is the last commit before the nightly's Last-Modified;
      // ccc333d lands after it and must NOT capture the alias
      val lines = Seq(
        s"aaa111f${us}2026-08-01 10:00:00 +0000${us}Merge #7 x",
        s"bbb222e${us}2026-08-02 04:00:00 +0000${us}Merge #8 y",
        s"ccc333d${us}2026-08-02 09:00:00 +0000${us}Merge #9 z"
      ).toDF("value")
      val commits = Ingest.parseCommitLog(lines)
      val resolved = Ingest.resolveLatestAlias(artifacts, commits)
      assert(resolved.select("hash").as[String].collect().toSet ===
        Set("aaa111f", "bbb222e"))
      // end-to-end: backfill day-ranks the resolved alias like any row
      val prDim = Seq((7L, "seven"), (8L, "eight")).toDF("pr_num", "title")
      val (builds, _) = Pipeline.backfill(lines, artifacts, prDim)
      val rows = builds
        .select(col("ts").cast("string"), col("test"), col("board"),
          col("dec"), col("count"))
        .as[(String, String, String, Long, Long)].collect().toSet
      assert(rows === Set(
        ("2026-08-01 10:05:00", "t1", "b1", 6L, 4L),
        ("2026-08-02 05:10:00", "t1", "b1", 60L, 0L)))
      // explicit fetch of the SAME commit wins over the resolved alias
      val dupAlias = Seq(
        ("aaa111f", oldBody, Timestamp.valueOf("2026-08-01 10:05:00")),
        ("latest", latestBody, Timestamp.valueOf("2026-08-01 12:00:00"))
      ).toDF("hash", "payload", "artifact_ts")
      val dupResolved = Ingest.resolveLatestAlias(dupAlias, commits)
      assert(dupResolved.count() === 1L)
      assert(dupResolved.select("payload").as[String].head() === oldBody)
      // alias with no commit at-or-before its ts is dropped
      val orphan = Seq(
        ("latest", latestBody, Timestamp.valueOf("2026-07-01 00:00:00"))
      ).toDF("hash", "payload", "artifact_ts")
      assert(Ingest.resolveLatestAlias(orphan, commits).count() === 0L)
      // two nightlies with no intervening commit both resolve to
      // bbb222e — only the newest survives (deterministic, no tied
      // key reaches backfill's day-rank window)
      val twoNightlies = Seq(
        ("latest", oldBody, Timestamp.valueOf("2026-08-02 05:10:00")),
        ("latest", latestBody, Timestamp.valueOf("2026-08-02 06:10:00"))
      ).toDF("hash", "payload", "artifact_ts")
      val merged = Ingest.resolveLatestAlias(twoNightlies, commits)
        .select(col("hash"), col("payload"),
          col("artifact_ts").cast("string"))
        .as[(String, String, String)].collect().toSeq
      assert(merged === Seq(
        ("bbb222e", latestBody, "2026-08-02 06:10:00")))
    } finally server.stop(0)
  }

  test("fromFetched batches without losing order-independent content") {
    import graft.sources.Fetcher
    val ts = new Timestamp(1000L)
    val many = (0 until 25).map(i => (s"u$i", s"p$i", ts))
    val df = Ingest.fromFetched(spark, many.iterator, batchSize = 10)
    assert(df.count() === 25L)
    assert(df.select("url").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet === many.map(_._1).toSet)
    assert(Ingest.fromFetched(spark, Iterator.empty).count() === 0L)
    // RFC-1123 parse + epoch fallback
    assert(Fetcher.parseLastModified(
      Some("Sat, 01 Aug 2026 10:05:00 GMT")).getTime ===
      java.time.Instant.parse("2026-08-01T10:05:00Z").toEpochMilli)
    assert(Fetcher.parseLastModified(Some("garbage")).getTime === 0L)
    assert(Fetcher.parseLastModified(None).getTime === 0L)
  }

  test("prEvents: html anchors + left join keeps PR-less commits") {
    import spark.implicits._
    val commits = Seq(
      ("8c03a1", Timestamp.valueOf("2026-08-01 01:42:13"), "Merge #1 x",
        Some(1L)),
      ("9a0b11", Timestamp.valueOf("2026-07-30 08:00:00"), "no digits",
        None: Option[Long])
    ).toDF("hash", "commit_ts", "msg", "pr_num")
    val dim = Seq((1L, "fix the frobnicator")).toDF("pr_num", "title")
    val got = Ingest.prEvents(commits, dim)
      .orderBy(col("hash"))
      .select(col("hash"), col("title"), col("description"))
      .as[(String, String, String)].collect().toSeq
    assert(got.head._2 ===
      "<a href=\"https://github.com/RIOT-OS/RIOT/pull/1\">#1</a>")
    assert(got.head._3 === "fix the frobnicator")
    assert(got(1)._3 === "") // absent PR -> empty description (rg.py:361)
  }
}
