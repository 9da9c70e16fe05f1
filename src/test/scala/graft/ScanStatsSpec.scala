package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, Publish, ScanEstimate, StatsIndex, Versions}

/** V2 scan statistics ([[graft.core.ScanEstimate]] through
  * `SupportsReportStatistics`): a small graft table must AUTO-broadcast in
  * a join — at PLAN time, from the commit log's file sizes, not after an
  * AQE-repaired shuffle. Estimates are conservative by construction:
  * pushed partition filters shrink them only on current-epoch layouts,
  * and every unknown degrades to Spark's default size.
  */
class ScanStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def publishDim(versioned: Boolean): String = {
    val root = TestSpark.tmpDir("stats_dim")
    val dim = (0 until 50).map(i => (i.toLong, s"name_$i", if (i % 2 == 0) "A" else "B"))
      .toDF("id", "name", "grp")
    if (versioned) Publish.publishVersioned(spark, dim, root, Seq("grp"))
    else Publish.publish(spark, dim, root, Seq("grp"))
    root
  }

  private def onDiskBytes(root: String): Long =
    Publish.listDataFilesWithSize(spark, root).map(_._2).sum

  test("estimate = on-disk bytes + exact rows; filters shrink it; epoch-stale stays full") {
    val root = publishDim(versioned = true)
    StatsIndex.build(spark, root, Seq("id"))
    val (bytes, rows) = ScanEstimate.estimate(spark, root, None, Nil)
    assert(bytes.contains(onDiskBytes(root)), s"full-size estimate, got $bytes")
    assert(rows.contains(50L), s"stats-sidecar row count, got $rows")

    // a partition filter prunes the estimate to one partition's bytes
    val aBytes = Publish.listDataFilesWithSize(spark, root)
      .filter(_._1.contains("grp=A")).map(_._2).sum
    val (fBytes, fRows) = ScanEstimate.estimate(spark, root, None,
      Seq(ColFilter("grp", "==", Seq("A"))))
    assert(fBytes.contains(aBytes), s"pruned estimate, got $fBytes vs $aBytes")
    assert(fRows.isEmpty, "row count is unknown under filters")
    assert(fBytes.get < bytes.get)
  }

  test("versionAsOf estimates that snapshot's bytes, not the live one's") {
    val root = publishDim(versioned = true)
    val v1Bytes = onDiskBytes(root)
    Publish.publishVersioned(spark,
      (50 until 200).map(i => (i.toLong, s"name_$i", "C")).toDF("id", "name", "grp"),
      root, Seq("grp"), mode = "append")
    val (live, _) = ScanEstimate.estimate(spark, root, None, Nil)
    val (pinned, _) = ScanEstimate.estimate(spark, root, Some(1), Nil)
    assert(pinned.contains(v1Bytes))
    assert(live.get > pinned.get, "the appended snapshot is bigger")
  }

  test("small graft dim auto-broadcasts at plan time (no hint, AQE off)") {
    val root = publishDim(versioned = true)
    val fact = spark.range(0, 100000).select(
      (col("id") % 50).as("dim_id"), (col("id") * 2).as("v"))
    val dim = spark.read.format("graft").load(root)
    val joined = fact.join(dim, fact("dim_id") === dim("id"))
      .groupBy("grp").agg(sum("v").as("sv"))
    // the INITIAL plan (pre-AQE) reflects logical stats: a broadcast here
    // can only come from the scan's reported size
    val initial = joined.queryExecution.sparkPlan.toString
    assert(initial.contains("BroadcastHashJoin"),
      s"graft dim must broadcast from reported stats, plan:\n$initial")
    assert(joined.collect().map(_.getString(0)).toSet == Set("A", "B"))
  }

  test("change-feed reads report unknown (never a snapshot's size)") {
    val root = publishDim(versioned = true)
    val cf = spark.read.format("graft")
      .option("changeFeed", "true").option("startingVersion", "1").load(root)
    // pre-AQE plan must NOT broadcast the feed from phantom stats when
    // joined as the small side of nothing — assert via relation stats
    val stats = cf.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes == spark.sessionState.conf.defaultSizeInBytes,
      s"change feed size must stay default, got ${stats.sizeInBytes}")
  }

  test("spec-evolved snapshot: filter pruning declines, estimate stays full (conservative)") {
    val root = TestSpark.tmpDir("stats_evolved")
    val df = (0 until 40).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-${i % 4 + 1} 10:00:00"), i * 1.0))
      .toDF("id", "ts", "v")
    Publish.publishTransformed(spark, df, root,
      graft.core.Transforms.parseSpec("days(ts)"), versioned = true)
    Versions.evolvePartitionSpec(spark, root,
      graft.core.Transforms.parseSpec("bucket(4, id)"))
    // all-old-epoch snapshot: dir signatures predate the current spec —
    // the estimator must keep every file, not wrong-prune on stale dirs
    val full = onDiskBytes(root)
    val (bytes, _) = ScanEstimate.estimate(spark, root, None,
      Seq(ColFilter("tp_bucket_id", "==", Seq("2"))))
    assert(bytes.contains(full), s"stale-epoch estimate must stay full, got $bytes vs $full")
  }
}
