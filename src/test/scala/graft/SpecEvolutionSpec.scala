package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DaysOf, Fetch, ColFilter, MonthsOf, Mutations, Publish, Transforms, Versions}

/** Partition-spec evolution (the Iceberg design): change a transformed
  * dataset's layout without rewriting a byte — old files keep their old
  * hive layout, new writes derive the new spec, scans stitch the epochs
  * (per-epoch pruning included), time travel reads each version under
  * its own spec.
  */
class SpecEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 3) =
    java.sql.Timestamp.valueOf(f"2024-${(day - 1) / 28 + 1}%02d-${(day - 1) % 28 + 1}%02d $hour%02d:00:00")

  private def batch(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, ts(i % 56 + 1), i * 1.0))
      .toDF("id", "ev_ts", "v")

  private def freshEvolved(tag: String): String = {
    val root = TestSpark.tmpDir(tag)
    Publish.publishTransformed(spark, batch(0, 200), root,
      Seq(MonthsOf("ev_ts")), versioned = true)
    Versions.evolvePartitionSpec(spark, root, Seq(DaysOf("ev_ts")))
    Publish.publishVersioned(spark,
      Transforms.applyTo(batch(200, 300), Seq(DaysOf("ev_ts"))),
      root, Seq(DaysOf("ev_ts").name), mode = "append")
    root
  }

  test("old layout survives, new writes use the new spec, reads stitch epochs") {
    val root = freshEvolved("se_basic")
    val dirs = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(dirs.exists(_.startsWith("tp_months_ev_ts=")), s"old epoch dirs stay: $dirs")
    assert(dirs.exists(_.startsWith("tp_days_ev_ts=")), s"new epoch dirs appear: $dirs")
    val got = Fetch.fetch(spark, root)
    assert(got.columns.toSeq == Seq("id", "ev_ts", "v"), "derived cols stay hidden")
    assert(got.count() == 300, "both epochs read")
    assert(got.select("id").as[Long].collect().toSet == (0L until 300L).toSet)
  }

  test("raw-filter pruning is per epoch: each layout prunes under its own spec") {
    val root = freshEvolved("se_prune")
    val f = Seq(ColFilter("ev_ts", ">=", Seq(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))))
    val expected = (0 until 300).count(i => !ts(i % 56 + 1).before(
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    val (n, recs) = IoMetrics.recordsReadDuring(spark) {
      Fetch.fetch(spark, root, f).count()
    }
    assert(n == expected)
    // month-1 files of BOTH epochs are pruned driver-side: strictly
    // fewer records than the full 300 hit the scan
    assert(recs < 300, s"per-epoch pruning must skip files, read $recs")
    assert(recs >= n, "exactness re-applies row-level")
  }

  test("time travel reads each version under its own epoch") {
    val root = freshEvolved("se_travel")
    // v1 = months publish; v2 = alter; v3 = days append
    assert(Versions.fetchVersion(spark, root, 1).count() == 200)
    assert(Versions.transformsAt(spark, root, 1) == Seq(MonthsOf("ev_ts")))
    assert(Versions.transformsAt(spark, root, 3) == Seq(DaysOf("ev_ts")))
    val h = Versions.readEntry(spark, root, 2)
    assert(h.opInfo.get("op").contains("SET PARTITION SPEC"))
  }

  test("mutations on a mixed snapshot rewrite under the current spec") {
    val root = freshEvolved("se_mutate")
    // delete rows living in OLD-epoch files (ids < 200) and some new
    Mutations.deleteWhere(spark, root, col("id") % 10 === 3)
    val got = Fetch.fetch(spark, root).select("id").as[Long].collect().toSet
    assert(got == (0L until 300L).filter(_ % 10 != 3).toSet)
    // survivors of rewritten old-epoch files land under the NEW layout
    val latest = Versions.latestVersion(spark, root).get
    val added = Versions.readEntry(spark, root, latest).added
    assert(added.nonEmpty && added.forall(_.contains("tp_days_ev_ts=")),
      s"rewrites derive the current spec: $added")
  }

  test("three epochs coexist; intermediate versions travel under their own spec") {
    import graft.core.BucketOf
    val root = TestSpark.tmpDir("se_three")
    Publish.publishTransformed(spark, batch(0, 100), root,
      Seq(MonthsOf("ev_ts")), versioned = true)
    Versions.evolvePartitionSpec(spark, root, Seq(DaysOf("ev_ts")))
    Publish.publishVersioned(spark, batch(100, 200), root,
      Seq(DaysOf("ev_ts").name), mode = "append")
    Versions.evolvePartitionSpec(spark, root, Seq(BucketOf(4, "id")))
    Publish.publishVersioned(spark, batch(200, 300), root,
      Seq(BucketOf(4, "id").name), mode = "append")
    val dirs = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(dirs.exists(_.startsWith("tp_months_ev_ts=")) &&
      dirs.exists(_.startsWith("tp_days_ev_ts=")) &&
      dirs.exists(_.startsWith("tp_bucket4_id=")), s"three layouts: $dirs")
    assert(Fetch.fetch(spark, root).count() == 300)
    // a raw filter spanning all three: months and days epochs prune under
    // their own specs, the bucket epoch scans conservatively — exact
    val f = Seq(ColFilter("ev_ts", ">=",
      Seq(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))))
    val expected = (0 until 300).count(i => !ts(i % 56 + 1).before(
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    assert(Fetch.fetch(spark, root, f).count() == expected)
    // middle-epoch time travel: v3 = months files + days files, days spec
    assert(Versions.fetchVersion(spark, root, 3).count() == 200)
    assert(Versions.transformsAt(spark, root, 3) == Seq(DaysOf("ev_ts")))
    assert(Versions.transformsAt(spark, root, 5) == Seq(BucketOf(4, "id")))
  }

  test("guard rails: unversioned, untransformed, colliding names") {
    val plain = TestSpark.tmpDir("se_plain")
    Publish.publish(spark, batch(0, 10), plain, Nil)
    intercept[IllegalArgumentException] {
      Versions.evolvePartitionSpec(spark, plain, Seq(DaysOf("ev_ts")))
    }
    val vroot = TestSpark.tmpDir("se_vplain")
    Publish.publishVersioned(spark, batch(0, 10), vroot, Nil)
    val e = intercept[IllegalArgumentException] {
      Versions.evolvePartitionSpec(spark, vroot, Seq(DaysOf("ev_ts")))
    }
    assert(e.getMessage.contains("not transform-partitioned"))
  }

  test("fromName/specOfPath invert derived names exactly") {
    import graft.core.{BucketOf, HoursOf, TruncateOf, YearsOf}
    val all = Seq(YearsOf("a_b"), MonthsOf("x"), DaysOf("ts"), HoursOf("t"),
      BucketOf(8, "k_id"), TruncateOf(3, "word"))
    all.foreach(t => assert(Transforms.fromName(t.name).contains(t), t.name))
    assert(Transforms.fromName("not_a_transform").isEmpty)
    assert(Transforms.fromName("tp_bogus_x").isEmpty)
    assert(Transforms.specOfPath("tp_days_ts=2024-01-01/tp_bucket4_id=2/f.parquet") ==
      Seq(DaysOf("ts"), BucketOf(4, "id")))
  }
}
