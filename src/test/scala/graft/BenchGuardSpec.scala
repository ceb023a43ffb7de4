package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.Bench.measureAll: a crashed query must surface as an ERROR
  * marker, never as a fast success (VERDICT r11 "What's wrong #1" —
  * the q89/s15 sf0.1 masked-crash incident, where crashed queries
  * benched at 1.9 s and the composite looked BETTER). */
class BenchGuardSpec extends AnyFunSuite {

  test("a throwing query is recorded in the error map, not masked") {
    val (times, errs) = Bench.measureAll(Seq(
      "q_ok" -> (() => ()),
      "q_boom" -> (() => throw new IllegalStateException("store is torn")),
      "q_ok2" -> (() => ())))
    assert(times.keySet === Set("q_ok", "q_boom", "q_ok2"))
    assert(errs.keySet === Set("q_boom"))
    assert(errs("q_boom").contains("IllegalStateException"))
    assert(errs("q_boom").contains("store is torn"))
  }

  test("a clean pass reports zero errors") {
    val (times, errs) = Bench.measureAll(Seq("a" -> (() => ())))
    assert(times.contains("a") && errs.isEmpty)
  }

  test("a one-pass crash cannot displace the surviving pass's timing") {
    val out = Bench.combinePasses(
      Map("q" -> 0.1, "ok" -> 2.0, "boom" -> 0.2),
      Map("q" -> "crash fast", "boom" -> "crash"),
      Map("q" -> 5.0, "ok" -> 3.0, "boom" -> 0.3),
      Map("boom" -> "crash again"))
    assert(out("q") === 5.0) // NOT the crash's artificially fast 0.1
    assert(out("ok") === 2.0) // both valid -> plain min
    assert(out("boom") === 0.2) // both crashed -> flagged min survives
  }

  test("error messages are single-line and bounded (JSON-line safety)") {
    val (_, errs) = Bench.measureAll(Seq(
      "q_nl" -> (() => throw new RuntimeException("x\ny\tz " + "!" * 500))))
    assert(!errs("q_nl").contains("\n") && !errs("q_nl").contains("\t"))
    assert(errs("q_nl").length <= 200)
  }
}
