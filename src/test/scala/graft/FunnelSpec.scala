package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

/** Ordered-step funnel: strict ordering, null propagation from the first
  * missed step, and the conversion rollup.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val events = Seq(
    // user 1: full funnel in order
    (1L, ts(0), "signup"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
    // user 2: clicked BEFORE signing up — that click must not count; the
    // later click does, but there is no purchase after it
    (2L, ts(1), "click"), (2L, ts(2), "signup"), (2L, ts(3), "purchase"),
    (2L, ts(4), "click"),
    // user 3: signup only
    (3L, ts(0), "signup"),
    // user 4: never signed up — absent from the funnel
    (4L, ts(0), "click"), (4L, ts(1), "purchase"),
    // user 5: repeated steps — earliest qualifying chain wins
    (5L, ts(0), "signup"), (5L, ts(1), "signup"), (5L, ts(2), "click"),
    (5L, ts(3), "click"), (5L, ts(4), "purchase")
  ).toDF("user_id", "ts", "event_type")

  private val steps = Seq("signup", "click", "purchase")

  test("per-user chain is strictly ordered and earliest-qualifying") {
    val out = Funnel.userFunnel(events, steps)
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(out == Seq(
      (1L, Some(ts(0)), Some(ts(5)), Some(ts(9))),
      (2L, Some(ts(2)), Some(ts(4)), None),
      (3L, Some(ts(0)), None, None),
      (5L, Some(ts(0)), Some(ts(2)), Some(ts(4)))))
  }

  test("funnelCounts reports reach and step-over-step conversion") {
    val out = Funnel.funnelCounts(events, steps)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "signup", 4L, 1.0),
      (2, "click", 3L, 0.75),
      (3, "purchase", 2L, round4(2.0 / 3))))
  }

  private def round4(x: Double) = math.round(x * 1e4) / 1e4

  test("a step equal in time to the previous one does NOT count (strict >)") {
    val e = Seq((1L, ts(0), "signup"), (1L, ts(0), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.userFunnel(e, Seq("signup", "click"))
      .as[(Long, Option[Timestamp], Option[Timestamp])].collect().toSeq
    assert(out == Seq((1L, Some(ts(0)), None)))
  }

  test("duplicate step names are rejected") {
    val e = intercept[IllegalArgumentException] {
      Funnel.userFunnel(events, Seq("click", "click"))
    }
    assert(e.getMessage.contains("distinct"))
  }
}
