package graft

import java.sql.Timestamp

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks latest right row at-or-before left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (2L, ts("2024-01-01 12:00:00"), 7L),
      (3L, ts("2024-01-01 09:00:00"), 8L), // before any right row for key 8
      (4L, ts("2024-01-01 11:00:00"), 9L)  // key 9 has no right rows at all
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (101L, ts("2024-01-01 09:30:00"), 7L),
      (102L, ts("2024-01-01 10:00:00"), 7L), // ties left #1 exactly -> wins
      (103L, ts("2024-01-01 11:30:00"), 7L),
      (104L, ts("2024-01-01 10:30:00"), 8L)
    ).toDF("err_event_id", "err_ts", "user_id")

    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "err_ts",
        Seq("err_event_id"), tieBreak = Seq("err_event_id"))
      .select("event_id", "err_event_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(got(1L) === Some(102L)) // at-or-before is inclusive
    assert(got(2L) === Some(103L))
    assert(got(3L) === None)       // no right row yet
    assert(got(4L) === None)       // key never appears on the right
  }

  test("equal right timestamps break ties by the greatest tieBreak value") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (201L, ts("2024-01-01 09:00:00"), 7L),
      (202L, ts("2024-01-01 09:00:00"), 7L)
    ).toDF("err_event_id", "err_ts", "user_id")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "err_ts",
        Seq("err_event_id"), tieBreak = Seq("err_event_id"))
      .select(col("err_event_id")).as[Long].collect()
    assert(got.toSeq === Seq(202L))
  }
}
