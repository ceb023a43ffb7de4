package graft

import graft.functions.SignLshSignature
import org.apache.spark.sql.functions._

class SignLshSpec extends SparkSpec {

  /** Naive reference: unpack each mask to +-1 components, dot, sign. */
  private def naiveSig(qe: Seq[Long], masks: Seq[Long]): Long =
    masks.zipWithIndex.foldLeft(0L) { case (sig, (m, p)) =>
      val proj = qe.zipWithIndex.map { case (v, i) =>
        if (i < 64 && ((m >>> i) & 1L) == 1L) v else -v
      }.sum
      if (proj >= 0) sig | (1L << p) else sig
    }

  private val masks = Seq(0x5555555555555555L, -1L, 0L, 0x00FF00FF00FF00FFL)

  test("codegen and interpreted paths match the naive reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs: Seq[Seq[Long]] = Seq(
      Seq.fill(64)(rnd.nextLong() % 1000000L),
      Seq.fill(64)(1000000L),
      Seq.fill(64)(-1000000L),
      Seq.fill(3)(rnd.nextLong() % 1000000L), // short vector
      Seq.empty[Long]) // empty -> every projection 0 -> all bits set
    val df = vecs.toDF("qe")
      .select(SignLshSignature(col("qe"), masks).as("sig"))
    val want = vecs.map(naiveSig(_, masks))
    // whole-stage codegen path
    assert(df.as[Long].collect().toSeq === want)
    // interpreted path (covers nullSafeEval)
    withCodegenOff {
      assert(df.as[Long].collect().toSeq === want)
    }
  }

  test("NULL array and NULL element both yield NULL") {
    import spark.implicits._
    val df = Seq[Option[Seq[Option[Long]]]](
      None,
      Some(Seq(Some(1L), None, Some(3L))),
      Some(Seq(Some(1L), Some(2L))))
      .toDF("qe")
      .select(SignLshSignature(col("qe"), masks).as("sig"))
    val got = df.as[Option[Long]].collect().toSeq
    assert(got(0).isEmpty)
    assert(got(1).isEmpty)
    assert(got(2).isDefined)
    withCodegenOff {
      assert(df.as[Option[Long]].collect().toSeq === got)
    }
  }

  private def withCodegenOff(body: => Unit): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val factoryKey = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    spark.conf.set(factoryKey, "NO_CODEGEN")
    try body finally {
      spark.conf.set(key, prev)
      spark.conf.unset(factoryKey)
    }
  }
}
