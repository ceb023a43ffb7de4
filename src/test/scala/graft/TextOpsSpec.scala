package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Unit coverage for the round-6 corpus operators beyond the driver
  * gate: containment asymmetry, repetition-filter degenerate shapes,
  * PII scrub on real match/no-match payloads. */
class TextOpsSpec extends SparkSpec {

  test("containment flags a short doc quoted inside a long one") {
    import spark.implicits._
    // doc 2 = the first third of doc 1 verbatim: containment(2 in 1)
    // = 1.0, while jaccard is ~1/3 (below q36's 0.5 -> invisible there)
    val contained = (0 until 10).map(i => s"w$i").mkString(" ")
    val container = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, container), (2L, contained), (3L, "x y z q r s"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs)
      .select("container_id", "contained_id", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 1.0)))
    // the symmetric query misses it
    assert(Dedup.nearDupPairs(docs).count() === 0)
  }

  test("repetition filter drops modal-token and modal-bigram spam") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam one two three"), // top token 5/8
      (2L, "ab cd ab cd ab cd ab cd ab cd"),          // top bigram dominates
      (3L, (0 until 50).map(i => s"u$i").mkString(" ")), // all distinct
      (4L, "solo"),                                   // 1 token, 0 bigrams
      (5L, "")                                        // empty
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFilter(docs)
      .select("doc_id", "n_tokens", "top_token_n", "n_bigrams",
        "top_bigram_n", "keep")
      .as[(Long, Int, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out(1L)._6 && out(1L)._3 === 5)
    assert(!out(2L)._6 && out(2L)._5 === 5) // "ab cd" x5 of 9 bigrams
    assert(out(3L)._6 && out(3L)._3 === 1)
    // degenerate shapes survive without dividing by zero
    assert(out(4L)._2 === 1 && out(4L)._4 === 0 && out(4L)._5 === 0)
    assert(out(5L)._2 === 0 && out(5L)._3 === 0)
  }

  test("pii scrub redacts emails and phones, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe+x@mail.example.org or 415-555-0199 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c.d@e-f.com and 111-222-3333 444-555-6666")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs)
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1 && out(1L)._3 === 1)
    assert(out(1L)._4 === "reach me at [EMAIL] or [PHONE] ok")
    assert(out(2L)._2 === 0 && out(2L)._3 === 0)
    assert(out(2L)._4 === "no pii here at all")
    assert(out(3L)._2 === 2 && out(3L)._3 === 2)
    assert(out(3L)._4 === "two mails [EMAIL] [EMAIL] and [PHONE] [PHONE]")
  }
}
