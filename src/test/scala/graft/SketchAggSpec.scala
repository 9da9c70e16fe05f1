package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.SketchAggregates

/** Accuracy + merge contracts of the mergeable sketch aggregates. */
class SketchAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL distinct estimate within 5% at 20k cardinality") {
    val df = (0 until 60000).map(i => i % 20000).toDF("x")
    val est = df.agg(SketchAggregates.approxDistinct(col("x")).as("d"))
      .head().getLong(0)
    assert(math.abs(est - 20000) <= 1000, s"estimate $est vs 20000")
  }

  test("HLL small cardinalities are near-exact (linear counting range)") {
    val df = (0 until 5000).map(i => s"v${i % 100}").toDF("s")
    val est = df.agg(SketchAggregates.approxDistinct(col("s")).as("d"))
      .head().getLong(0)
    assert(est == 100, s"estimate $est vs 100")
  }

  test("HLL estimate is identical under any partitioning (register-max merge)") {
    val vals = (0 until 30000).map(i => i * 7919L)
    def estimate(parts: Int): Long =
      vals.toDF("x").repartition(parts)
        .agg(SketchAggregates.approxDistinct(col("x")).as("d")).head().getLong(0)
    assert(estimate(3) == estimate(17))
  }

  test("HLL works per group and ignores nulls") {
    val df = (0 until 10000)
      .map(i => (if (i % 2 == 0) "a" else "b", if (i % 100 == 0) null else s"u${i % 500}"))
      .toDF("g", "x")
    val out = df.groupBy("g").agg(SketchAggregates.approxDistinct(col("x")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~250 distinct per group (evens also hit the null slots)
    assert(out.keySet == Set("a", "b"))
    out.values.foreach(v => assert(math.abs(v - 250) <= 15, s"$out"))
  }

  test("t-digest p50/p95 within 2% relative on a skewed distribution") {
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(50000)(math.pow(rnd.nextDouble(), 3) * 1000) // heavy left skew
    val df = xs.toSeq.toDF("x")
    val Array(p50, p95) = df
      .agg(SketchAggregates.approxQuantiles(col("x"), Seq(0.5, 0.95)).as("q"))
      .head().getSeq[Double](0).toArray
    val sorted = xs.sorted
    val e50 = sorted((0.5 * xs.length).toInt)
    val e95 = sorted((0.95 * xs.length).toInt)
    assert(math.abs(p50 - e50) / e50 < 0.02, s"p50 $p50 vs $e50")
    assert(math.abs(p95 - e95) / e95 < 0.02, s"p95 $p95 vs $e95")
  }

  test("t-digest tail quantiles stay sharp (arcsine scale)") {
    val df = (1 to 100000).map(_.toDouble).toDF("x")
    val Array(p01, p999) = df
      .agg(SketchAggregates.approxQuantiles(col("x"), Seq(0.01, 0.999)).as("q"))
      .head().getSeq[Double](0).toArray
    assert(math.abs(p01 - 1000) < 150, s"p01 $p01")
    assert(math.abs(p999 - 99900) < 150, s"p999 $p999")
  }

  test("heavy hitters retains planted frequent items over a long-tail vocab") {
    // 50 hot items (200x each) + 20k singleton tail, capacity 1000:
    // anything above n/capacity = 30 occurrences is guaranteed retained
    val rnd = new scala.util.Random(13)
    val rows = rnd.shuffle(
      (0 until 50).flatMap(h => Seq.fill(200)(s"hot$h")) ++
        (0 until 20000).map(i => s"tail$i"))
    val top = rows.toDF("w").repartition(8)
      .agg(SketchAggregates.heavyHitters(col("w"), 50, 1000).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item").as[String].collect().toSet
    assert((0 until 50).forall(h => top.contains(s"hot$h")),
      s"missing hot items: ${(0 until 50).map(h => s"hot$h").filterNot(top.contains)}")
  }

  test("heavy hitters is exact when the vocabulary fits the capacity") {
    val rows = (0 until 10000).map(i => s"w${i % 200}")
    val sketch = rows.toDF("w").repartition(5)
      .agg(SketchAggregates.heavyHitters(col("w"), 10, 1024).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.count").as[(String, Long)].collect().toSeq
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (s, c) => (-c, s) }.take(10)
    assert(sketch == exact)
  }

  test("sketchProfile one-pass shape matches exact profile within tolerance") {
    val df = (0 until 20000).map(i => (i.toLong % 4000, (i % 1000).toDouble)).toDF("a", "b")
    val prof = graft.ops.Profile.sketchProfile(spark, df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = prof("a")
    assert(math.abs(a.getAs[Long]("approx_distinct") - 4000) <= 200)
    assert(a.getAs[Double]("min") == 0.0 && a.getAs[Double]("max") == 3999.0)
    val b = prof("b")
    assert(math.abs(b.getAs[Double]("p50") - 499.5) < 25, s"p50 ${b.getAs[Double]("p50")}")
  }

  test("sketchProfileChecked emits a row per in-tolerance column, drops violators") {
    val df = (0 until 20000).map(i => (i.toLong % 4000, (i % 1000).toDouble)).toDF("a", "b")
    // healthy sketches: every column survives the contract filter
    val ok = graft.ops.Profile.sketchProfileChecked(spark, df, Seq("a", "b"))
    assert(ok.count() == 2)
    // an impossible tolerance flunks the rank-coverage check for every
    // column — rows vanish instead of reporting out-of-contract numbers
    val strict = graft.ops.Profile.sketchProfileChecked(spark, df, Seq("a", "b"),
      ndTol = 0.0, rankTol = -1.0)
    assert(strict.count() == 0)
    // heavy median atom: half the mass on one value — the atom-aware
    // strict/inclusive rank pair must cover q=0.5 instead of flunking a
    // perfect estimate
    val atom = (0 until 10000).map(i => (if (i < 5000) 7.0 else i.toDouble))
      .toDF("x")
    assert(graft.ops.Profile.sketchProfileChecked(spark, atom, Seq("x")).count() == 1)
  }
}
