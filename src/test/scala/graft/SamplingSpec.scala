package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Deterministic splits and mixtures. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = (0L until 10000L).map(i => (i, s"src${i % 4}"))
    .toDF("id", "source")

  test("hash split is deterministic, exhaustive, and near the weights") {
    val slot = Sampling.hashSlot(col("id"))
    val split = Sampling.withSplit(rows, slot, Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test"))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000) < 150)
    // same key -> same split across invocations
    val again = Sampling.withSplit(rows, slot, Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test"))
    assert(split.select("id", "split").except(again.select("id", "split")).isEmpty)
  }

  test("stratified sample takes exactly n per stratum, deterministically") {
    val out = Sampling.stratifiedSample(rows, "source", 7,
      Sampling.hashSlot(col("id")), col("id"))
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("src0" -> 7L, "src1" -> 7L, "src2" -> 7L, "src3" -> 7L))
    // same rows on a rerun (no rand())
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(rows, "source", 7,
      Sampling.hashSlot(col("id")), col("id")).select("id").as[Long].collect().toSet
    assert(a == b)
    // a stratum smaller than n returns all its rows
    val small = rows.where(col("id") < 2)
    assert(Sampling.stratifiedSample(small, "source", 7,
      Sampling.hashSlot(col("id")), col("id")).count() == 2)
  }

  test("mixture keeps configured rates per source, others untouched") {
    val slot = Sampling.hashSlot(col("id"))
    val mixed = Sampling.mixture(rows, slot, "source", Map("src0" -> 0.5))
    val counts = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("src1") == 2500 && counts("src2") == 2500 && counts("src3") == 2500)
    assert(math.abs(counts("src0") - 1250) < 200, s"src0=${counts("src0")}")
    // kept set is a subset determined by key, not order
    assert(Sampling.mixture(rows.orderBy(rand(7)), slot, "source", Map("src0" -> 0.5))
      .count() == mixed.count())
  }

  test("weightedSample: deterministic, excludes non-positive weights, k caps") {
    import spark.implicits._
    val df = (1 to 200).map(i =>
      (i.toLong, if (i % 50 == 0) 0.0 else i.toDouble)).toDF("id", "w")
    val a = Sampling.weightedSample(df, col("w"), 20, 7L, Seq("id"))
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.weightedSample(df, col("w"), 20, 7L, Seq("id"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 20)
    assert(a.forall(_ % 50 != 0), "zero-weight rows must never be drawn")
    // different seed, different sample (with overwhelming probability)
    val c = Sampling.weightedSample(df, col("w"), 20, 8L, Seq("id"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a != c)
    // k >= candidates returns every positive-weight row
    val all = Sampling.weightedSample(df, col("w"), 1000, 7L, Seq("id"))
    assert(all.count() == 196)
  }

  test("keepTopQuantile: value-cutoff filter, ties kept, approx close to exact") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val exact = Sampling.keepTopQuantile(df, "score", 0.25, exact = true)
      .select("id").as[Long].collect().sorted.toSeq
    // p75 of 1..100 (linear interpolation) = 75.25 → keep 76..100
    assert(exact == (76L to 100L))
    val approx = Sampling.keepTopQuantile(df, "score", 0.25)
      .count()
    assert(math.abs(approx - 25L) <= 2, s"approx kept $approx")
    // keepFraction 1.0 is the identity
    assert(Sampling.keepTopQuantile(df, "score", 1.0).count() == 100)
    // ties at the cutoff all survive
    val tied = ((1 to 8).map(i => (i.toLong, 1.0)) ++
      (9 to 10).map(i => (i.toLong, 5.0))).toDF("id", "score")
    val kept = Sampling.keepTopQuantile(tied, "score", 0.2, exact = true)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(9L, 10L))
    intercept[IllegalArgumentException] {
      Sampling.keepTopQuantile(df, "score", 0.0)
    }
  }

  test("keepTopQuantileByGroup: each group filters by its OWN cutoff") {
    import spark.implicits._
    // group a: scores 1..10 (median 5.5 → keep 6..10); group b: 100..104
    // (median 102 → keep 102..104) — a global cutoff would keep all of b
    // and none of a
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      (100 to 104).map(i => ("b", i.toLong, i.toDouble))).toDF("g", "id", "score")
    val kept = Sampling.keepTopQuantileByGroup(df, "g", "score", 0.5, exact = true)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(kept == ((6L to 10L).map("a" -> _) ++ (102L to 104L).map("b" -> _)).toSet)
  }

  test("temperatureMixture: composition tilts to n^alpha, smallest source kept whole") {
    import spark.implicits._
    // sources of 1000 / 250 rows; alpha=0.5 → big keeps (1000/250)^-0.5 = 50%
    val df = ((0 until 1000).map(i => (i.toLong, "big")) ++
      (1000 until 1250).map(i => (i.toLong, "small"))).toDF("id", "source")
    val slot = org.apache.spark.sql.functions.pmod(
      col("id") * 997, org.apache.spark.sql.functions.lit(Sampling.Slots))
    val kept = Sampling.temperatureMixture(df, slot, "source", 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 250, "smallest source must survive whole")
    // modulo slot is uniform-ish; expected 500 from `big`
    assert(kept("big") > 400 && kept("big") < 600, s"big kept ${kept("big")}")
    // alpha = 1 keeps the natural mix untouched
    val natural = Sampling.temperatureMixture(df, slot, "source", 1.0).count()
    assert(natural == 1250)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, slot, "source", 0.0)
    }
  }

  test("weightedSample: a dominating weight is effectively always included") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, 1.0)) :+ (999L, 1e9))
      .toDF("id", "w")
    (0 until 10).foreach { seed =>
      val ids = Sampling.weightedSample(df, col("w"), 5, seed.toLong, Seq("id"))
        .select("id").as[Long].collect()
      assert(ids.contains(999L), s"seed=$seed")
    }
  }
}
