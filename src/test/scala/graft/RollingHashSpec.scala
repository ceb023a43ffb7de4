package graft

import graft.functions.RollingHashMin
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {

  /** Naive O(n*w) reference: hash every window from scratch. */
  private def naiveMin(s: String, w: Int): Option[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < w || w <= 0) return None
    val Mod = BigInt(RollingHashMin.Mod)
    val Base = BigInt(RollingHashMin.Base)
    val hashes = bytes.sliding(w).map { win =>
      win.foldLeft(BigInt(0))((acc, b) => (acc * Base + (b & 0xff)) % Mod)
    }
    Some(hashes.min.toLong)
  }

  test("rolling update matches the from-scratch reference hash") {
    import spark.implicits._
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa",
      "ab",
      "spark group query row data slow small filter customer line",
      "x" * 500 + "y" + "x" * 500)
    for (w <- Seq(3, 8, 32)) {
      val got = samples.toDF("text")
        .select(RollingHashMin(col("text"), w).as("fp"))
        .as[Option[Long]].collect().toSeq
      val want = samples.map(naiveMin(_, w))
      assert(got === want, s"window=$w")
    }
  }

  test("identical content yields identical fingerprints; null under window") {
    import spark.implicits._
    val df = Seq("same content here", "same content here", "tiny")
      .toDF("text")
      .select(RollingHashMin(col("text"), 8).as("fp"))
    val got = df.as[Option[Long]].collect().toSeq
    assert(got(0) === got(1))
    assert(got(0).isDefined)
    assert(got(2).isEmpty) // "tiny" is 4 bytes < 8 -> NULL
  }
}
