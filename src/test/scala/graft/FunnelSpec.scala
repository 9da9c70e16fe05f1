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

  test("retention: cohorts by first day, offsets counted once per user-day") {
    import spark.implicits._
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val events = Seq(
      (1L, ts(1, 9)), (1L, ts(1, 17)),   // day-0 twice: counts once
      (1L, ts(2, 9)),                    // day 1
      (2L, ts(1, 10)),                   // cohort 01-01, never returns
      (3L, ts(2, 10)), (3L, ts(4, 10))   // cohort 01-02, returns day 2
    ).toDF("user_id", "ts")
    val got = graft.ops.Funnel.retention(events, maxOffsetDays = 7)
      .orderBy("cohort_day", "day_offset")
      .select("cohort_day", "day_offset", "n_users", "retention")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 0.5),
      ("2024-01-02", 0L, 1L, 1.0),
      ("2024-01-02", 2L, 1L, 1.0)))
  }

  test("pathTransitions: adjacent pairs per user, (ts, id) order, outgoing share") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1: view -> click -> buy
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "buy"),
      // user 2: view -> click, plus a TIE at 10:05 broken by event_id
      (2L, ts(4), 4L, "view"), (2L, ts(5), 5L, "click"), (2L, ts(5), 6L, "view"),
      // user 3: single event — no transitions
      (3L, ts(9), 7L, "view")).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.Funnel.pathTransitions(events)
      .orderBy("from_step", "to_step")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("click", "buy", 1L, 0.5),
      ("click", "view", 1L, 0.5),   // the tie resolved view AFTER click (id 6 > 5)
      ("view", "click", 2L, 1.0)))
  }

  test("histogram: clamping, empty buckets, null drop") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(9.9), Some(10.0), Some(25.0),
      Some(99.0), Some(250.0), None).toDF("v")
    val got = graft.ops.Profile.histogram(spark, df, "v", bins = 10, lo = 0.0, hi = 100.0)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(got.size == 10)
    assert(got(0L) == 3)   // -5 clamps in, 0.0, 9.9
    assert(got(1L) == 1)   // 10.0
    assert(got(2L) == 1)   // 25.0
    assert(got(9L) == 2)   // 99.0 + 250 clamps into last
    assert((3L to 8L).forall(got(_) == 0))
  }
}
