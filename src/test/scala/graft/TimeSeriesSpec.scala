package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

/** Resample bucketing and gap-fill/LOCF semantics on handcrafted series. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("resample truncates to the unit and aggregates per key+bucket") {
    val df = Seq(
      ("a", ts(1, 10), 1.0), ("a", ts(1, 50), 2.0),
      ("a", ts(3, 0), 4.0), ("b", ts(1, 30), 8.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resample(df, "t", "hour", Seq("k"),
        Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    assert(out === Set(
      ("a", "2024-01-01 01:00:00.0", 2L, 3.0),
      ("a", "2024-01-01 03:00:00.0", 1L, 4.0),
      ("b", "2024-01-01 01:00:00.0", 1L, 8.0)))
  }

  test("gapFillLocf densifies per-key ranges and carries values forward") {
    val series = Seq(
      ("a", ts(1), 10.0), ("a", ts(4), 40.0), // gaps at 2, 3
      ("b", ts(2), 20.0)                      // single point: no gaps
    ).toDF("k", "bucket", "v")
    val out = TimeSeries.gapFillLocf(series, Seq("k"), "bucket", "1 hour", Seq("v"))
      .orderBy("k", "bucket")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("a", "2024-01-01 01:00:00.0", 10.0, false),
      ("a", "2024-01-01 02:00:00.0", 10.0, true),
      ("a", "2024-01-01 03:00:00.0", 10.0, true),
      ("a", "2024-01-01 04:00:00.0", 40.0, false),
      ("b", "2024-01-01 02:00:00.0", 20.0, false)))
  }

  test("gapFillLocf grid is per-key: no rows outside a key's own range") {
    val series = Seq(
      ("a", ts(1), 1.0), ("a", ts(10), 2.0),
      ("b", ts(5), 3.0), ("b", ts(6), 4.0)
    ).toDF("k", "bucket", "v")
    val out = TimeSeries.gapFillLocf(series, Seq("k"), "bucket", "1 hour", Seq("v"))
    assert(out.where($"k" === "a").count() === 10)
    assert(out.where($"k" === "b").count() === 2)
  }

  test("multiple value columns fill independently") {
    val series = Seq(
      ("a", ts(1), Some(1.0), None: Option[Double]),
      ("a", ts(2), None: Option[Double], Some(5.0)),
      ("a", ts(4), Some(3.0), Some(7.0))
    ).toDF("k", "bucket", "x", "y")
    val out = TimeSeries.gapFillLocf(series, Seq("k"), "bucket", "1 hour",
        Seq("x", "y"))
      .orderBy("bucket")
      .collect().map(r => (Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))
    // x carries 1.0 through hours 2-3; y is null until hour 2 then carries
    assert(out.toSeq === Seq(
      (Some(1.0), None, false),
      (Some(1.0), Some(5.0), false),
      (Some(1.0), Some(5.0), true),
      (Some(3.0), Some(7.0), false)))
  }

  test("anomalies: per-key z-scores, constant series flags nothing") {
    import spark.implicits._
    // key a: 9 points at 10 + one spike at 100; key b: constant
    val rows = ((1 to 9).map(i => ("a", i, 10.0)) :+ ("a", 10, 100.0)) ++
      (1 to 5).map(i => ("b", i, 7.0))
    val df = rows.toDF("k", "bucket", "v")
    val out = graft.ops.TimeSeries.anomalies(df, Seq("k"), "v", zThreshold = 2.0)
    val flagged = out.where("is_anomaly").select("k", "bucket")
      .as[(String, Int)].collect().toSeq
    assert(flagged == Seq(("a", 10)))
    // constant key: zscore null, never anomalous
    val b = out.where("k = 'b'").select("zscore", "is_anomaly")
      .as[(Option[Double], Boolean)].collect()
    assert(b.forall { case (z, f) => z.isEmpty && !f })
    // z matches the hand formula for the spike
    val mu = (9 * 10.0 + 100.0) / 10
    val sd = math.sqrt(rows.filter(_._1 == "a").map(r =>
      math.pow(r._3 - mu, 2)).sum / 9)
    val z = out.where("k = 'a' AND bucket = 10").select("zscore")
      .as[Double].head()
    assert(math.abs(z - (100.0 - mu) / sd) < 1e-12)
  }
}
