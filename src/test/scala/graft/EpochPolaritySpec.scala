package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DaysOf, Fetch, MonthsOf, Publish, StatsIndex, Transforms, Versions}

/** EPOCH-POLARITY audit (r16, judge task #2): every fast path that parses
  * partition values out of file DIRS must stay exact — or refuse loudly —
  * on a spec-evolved dataset, where old-epoch files spell a layout that
  * is not the current spec (partition-spec evolution is metadata-only, so
  * "freshly evolved" means EVERY live file is stale). The dangerous
  * polarity is aggressive: treating a missing dir as "does not match" /
  * "no value" silently drops rows. `Fetch`'s pruning is the conservative
  * template (missing dir keeps the file); these specs pin the remaining
  * dir-parsing surfaces.
  */
class EpochPolaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 03:00:00")

  private def batch(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, ts(i % 6 + 1), i * 1.0))
      .toDF("id", "ev_ts", "v")

  /** Months-partitioned versioned publish, metadata-only evolution to
    * days; `withNewWrite` appends a post-evolution batch (mixed epochs)
    * or leaves every live file stale (the single-old-epoch state).
    */
  private def evolved(tag: String, withNewWrite: Boolean): String = {
    val root = TestSpark.tmpDir(tag)
    Publish.publishTransformed(spark, batch(0, 60), root,
      Seq(MonthsOf("ev_ts")), versioned = true)
    // a second pre-evolution append: ≥2 old-epoch files, so small-file
    // OPTIMIZE has something to pack
    Publish.publishVersioned(spark,
      Transforms.applyTo(batch(60, 120), Seq(MonthsOf("ev_ts"))),
      root, Seq(MonthsOf("ev_ts").name), mode = "append")
    Versions.evolvePartitionSpec(spark, root, Seq(DaysOf("ev_ts")))
    if (withNewWrite)
      Publish.publishVersioned(spark,
        Transforms.applyTo(batch(120, 180), Seq(DaysOf("ev_ts"))),
        root, Seq(DaysOf("ev_ts").name), mode = "append")
    root
  }

  test("partition-value listings refuse loudly when files predate the spec") {
    val root = evolved("ep_listings", withNewWrite = true)
    val part = DaysOf("ev_ts").name
    // all three listing-only introspections would silently OMIT the
    // old-epoch files' values — each must throw instead
    val e = intercept[IllegalStateException] {
      Fetch.getAllPartitionValues(spark, root, part)
    }
    assert(e.getMessage.contains("predate the current partition spec"))
    intercept[IllegalStateException] {
      Fetch.getMaxPartitionValue(spark, root, part)
    }
    intercept[IllegalStateException] {
      Fetch.getDiffPartitionValues(spark, root, part, Seq("2024-01-03"))
    }
    // fetchLatest rides getMaxPartitionValue — same loud refusal
    intercept[IllegalStateException] {
      Fetch.fetchLatest(spark, root, part)
    }
    // a NON-evolved transformed dataset still answers from listings
    val ok = TestSpark.tmpDir("ep_listings_ok")
    Publish.publishTransformed(spark, batch(0, 60), ok,
      Seq(DaysOf("ev_ts")), versioned = true)
    val vals = Fetch.getAllPartitionValues(spark, ok, part)
    assert(vals.toSet == (1 to 6).map(d => java.sql.Date.valueOf(f"2024-01-0$d")).toSet)
  }

  test("statsCountByPartition refuses path-grouping on stale epochs (no phantom null group)") {
    val root = evolved("ep_stats", withNewWrite = true)
    StatsIndex.build(spark, root, Seq("id"))
    // path-derived grouping would land 120 old-epoch rows in a NULL
    // tp_days group; the sidecar fast path must decline instead
    assert(StatsIndex.statsCountByPartition(spark, root).isEmpty,
      "stale-epoch snapshot must fall back to a real GROUP BY")
    // and the real scan stays exact: every row accounted for, no nulls
    val real = Fetch.fetch(spark, root).groupBy(to_date(col("ev_ts")).as("d"))
      .count().collect()
    assert(real.map(_.getLong(1)).sum == 180L && !real.exists(_.isNullAt(0)))
    // the single-epoch fast path still answers (same shape, fresh root)
    val ok = TestSpark.tmpDir("ep_stats_ok")
    Publish.publishTransformed(spark, batch(0, 60), ok,
      Seq(DaysOf("ev_ts")), versioned = true)
    StatsIndex.build(spark, ok, Seq("id"))
    val byPart = StatsIndex.statsCountByPartition(spark, ok)
    assert(byPart.isDefined && byPart.get.collect().map(_.getLong(1)).sum == 60L)
  }

  test("unversioned compactSmallFiles refuses a spec-evolved src; versioned OPTIMIZE re-layouts exactly") {
    val root = evolved("ep_compact", withNewWrite = false)
    val e = intercept[IllegalArgumentException] {
      Fetch.compactSmallFiles(spark, root, TestSpark.tmpDir("ep_compact_dst"))
    }
    assert(e.getMessage.contains("Versions.compactSmall"))
    // the versioned OPTIMIZE handles the all-stale snapshot: every row
    // survives and the packed files land under the CURRENT (days) spec
    Versions.compactSmall(spark, root, smallBytes = 1L << 30)
    val got = Fetch.fetch(spark, root)
    assert(got.count() == 120)
    assert(got.select("id").as[Long].collect().toSet == (0L until 120L).toSet)
    val latest = Versions.latestVersion(spark, root).get
    val added = Versions.readEntry(spark, root, latest).added
    assert(added.nonEmpty && added.forall(_.contains("tp_days_ev_ts=")),
      s"OPTIMIZE must re-derive the current spec, got $added")
    // ...after which the listing introspections work again
    assert(Fetch.getAllPartitionValues(spark, root, DaysOf("ev_ts").name).size == 6)
  }

  test("general mutations on an all-stale snapshot re-derive the current spec row-level") {
    val root = evolved("ep_mutate", withNewWrite = false)
    // delete by the CURRENT derived column on a snapshot whose files all
    // predate it — the readFiles recompute (not the dirs) must answer
    graft.core.Mutations.deleteWhere(spark, root,
      col("tp_days_ev_ts") === lit(java.sql.Date.valueOf("2024-01-03")))
    val got = Fetch.fetch(spark, root).select("id").as[Long].collect().toSet
    assert(got == (0L until 120L).filterNot(i => i % 6 == 2).toSet,
      "exactly day-3 rows (i % 6 + 1 == 3) removed")
  }
}
