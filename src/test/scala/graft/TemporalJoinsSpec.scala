package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoins

/** As-of and point-in-interval join semantics on handcrafted frames. */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("asOfJoin picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, "u1", ts(100)), // after r@50 and r@90  -> 90
      (2L, "u1", ts(90)),  // ties with r@90 (inclusive) -> 90
      (3L, "u1", ts(40)),  // before every right row -> null
      (4L, "u2", ts(100)), // other key, r@60 -> 60
      (5L, "u3", ts(100))  // key with no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(50), "a"), ("u1", ts(90), "b"), ("u1", ts(120), "c"),
      ("u2", ts(60), "d")
    ).toDF("k", "t", "v")

    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "t", Seq("t", "v"))
      .select("id", "t_r", "v_r").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ => (r.getTimestamp(1), r.getString(2))))
      .toMap
    assert(out(1L).contains((ts(90), "b")))
    assert(out(2L).contains((ts(90), "b")), "equal timestamps must match (inclusive)")
    assert(out(3L).isEmpty)
    assert(out(4L).contains((ts(60), "d")))
    assert(out(5L).isEmpty)
  }

  test("asOfJoin keeps every left row exactly once") {
    val left = (1 to 50).map(i => (i.toLong, "k", ts(i * 10))).toDF("id", "k", "t")
    val right = (1 to 9).map(i => ("k", ts(i * 50), i.toLong)).toDF("k", "t", "rid")
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "t", Seq("rid"))
    assert(out.count() == 50)
    assert(out.select("id").distinct().count() == 50)
    // spot-check: left t=260 -> latest right at 250 (rid 5)
    assert(out.where(col("id") === 26).select("rid_r").head().getLong(0) == 5L)
  }

  test("null right timestamps never match (dirty rows are dropped, not nulls-first)") {
    val left = Seq((1L, "u", ts(100))).toDF("id", "k", "t")
    val right = Seq(("u", null.asInstanceOf[Timestamp], "bad"), ("u", ts(200), "late"))
      .toDF("k", "t", "v")
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "t", Seq("v")).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("v_r")),
      "left row with no valid prior right row must get null, not the null-ts row")
  }

  test("inverted intervals (end < start) match nothing and explode no buckets") {
    val intervals = Seq(("u", 1L, ts(500000), ts(0))).toDF("k", "iid", "lo", "hi")
    val points = Seq((1L, "u", ts(100))).toDF("pid", "k", "t")
    val out = TemporalJoins.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketSeconds = 60)
    assert(out.count() == 0)
  }

  test("pointInInterval matches inclusively and across bucket boundaries") {
    // interval spans many 60 s buckets; points at/inside/outside bounds
    val intervals = Seq(("u", 1L, ts(100), ts(500)), ("u", 2L, ts(900), ts(950)))
      .toDF("k", "iid", "lo", "hi")
    val points = Seq(
      (1L, "u", ts(100)),  // at lo (inclusive)
      (2L, "u", ts(500)),  // at hi (inclusive)
      (3L, "u", ts(300)),  // inside, different bucket than lo/hi
      (4L, "u", ts(99)),   // just before
      (5L, "u", ts(501)),  // just after
      (6L, "u", ts(920)),  // second interval
      (7L, "x", ts(300))   // wrong key
    ).toDF("pid", "k", "t")
    val out = TemporalJoins.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketSeconds = 60)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 1L), (6L, 2L)))
  }

  test("pointInInterval emits one row per matching pair (no bucket dups)") {
    // one point inside an interval covering 100+ buckets
    val intervals = Seq(("u", 1L, ts(0), ts(10000))).toDF("k", "iid", "lo", "hi")
    val points = Seq((1L, "u", ts(5000))).toDF("pid", "k", "t")
    val out = TemporalJoins.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketSeconds = 60)
    assert(out.count() == 1)
  }

  test("overlapping intervals all match a contained point") {
    val intervals = Seq(("u", 1L, ts(0), ts(200)), ("u", 2L, ts(100), ts(300)))
      .toDF("k", "iid", "lo", "hi")
    val points = Seq((1L, "u", ts(150))).toDF("pid", "k", "t")
    val out = TemporalJoins.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketSeconds = 60)
      .select("iid").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }
}
