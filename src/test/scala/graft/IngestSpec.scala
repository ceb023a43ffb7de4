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
