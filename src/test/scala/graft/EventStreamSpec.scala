package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Structured Streaming windowed aggregation over a MemoryStream. */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermarked tumbling windows aggregate by event type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val query = EventStream.windowedAgg(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("ev_agg")
      .outputMode(OutputMode.Complete()).start()

    input.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 10:20:00"), "view", 5.0),
      (Timestamp.valueOf("2024-01-01 11:10:00"), "click", 7.0))
    query.processAllAvailable()

    val rows = spark.table("ev_agg")
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    query.stop()

    assert(rows == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1L, 5.0),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "click", 1L, 7.0)))
  }

  test("streamToDatasetDedup lands replayed batches exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_test/stream_dedup_sink"
    val ckpt = "/tmp/graft_test/stream_dedup_ckpt"
    Seq(root, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDF().toDF("id", "p", "v")
    val query = EventStream.streamToDatasetDedup(spark, events, root,
      Seq("p"), Seq("id"), ckpt)
    input.addData((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
    query.processAllAvailable()
    // replay: the same rows again (at-least-once delivery), plus one new
    input.addData((2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
    query.processAllAvailable()
    query.stop()
    val got = graft.core.Fetch.fetch(spark, root)
    assert(got.count() == 4, "replayed rows must not duplicate")
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("streamToVersionedDataset commits one version per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_test/stream_versioned_sink"
    val ckpt = "/tmp/graft_test/stream_versioned_ckpt"
    Seq(root, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDF().toDF("id", "p", "v")
    val query = EventStream.streamToVersionedDataset(spark, events, root, Seq("p"), ckpt)
    input.addData((1L, "a", 1.0), (2L, "b", 2.0))
    query.processAllAvailable()
    input.addData((3L, "a", 3.0))
    query.processAllAvailable()
    query.stop()
    import graft.core.Versions
    assert(Versions.latestVersion(spark, root).contains(2))
    // time travel to batch 1; snapshot sees both; CDC reads only batch 2
    assert(Versions.fetchVersion(spark, root, 1).select("id")
      .as[Long].collect().toSet == Set(1L, 2L))
    assert(graft.core.Fetch.fetch(spark, root).count() == 3)
    assert(Versions.addedBetween(spark, root, 1, 2).select("id")
      .as[Long].collect().toSeq == Seq(3L))
    // compact bounds the per-batch file accumulation: content identical,
    // one more (overwrite) version in the history
    Versions.compact(spark, root)
    assert(Versions.latestVersion(spark, root).contains(3))
    assert(graft.core.Fetch.fetch(spark, root).select("id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("listing introspection on a stream-sink root sees only committed files") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_test/stream_sink_listing"
    val ckpt = "/tmp/graft_test/stream_sink_listing_ckpt"
    Seq(root, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDF().toDF("id", "p", "v")
    val query = EventStream.streamToDataset(spark, events, root, Seq("p"), ckpt)
    input.addData((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
    query.processAllAvailable()
    query.stop()
    val committed = graft.core.Fetch.allFiles(spark, root)
    assert(committed.nonEmpty)

    // simulate a crashed micro-batch: an orphan parquet file in an
    // existing partition and a whole orphan partition dir — present on
    // disk, absent from the sink commit log
    val orphanDirA = new java.io.File(s"$root/p=a")
    val orphanDirC = new java.io.File(s"$root/p=c")
    orphanDirC.mkdirs()
    // copy a real committed file's bytes as the orphans (valid parquet)
    val src = new java.io.File(committed.head)
    val orphanA = new java.io.File(orphanDirA, "part-orphan-a.parquet")
    val orphanC = new java.io.File(orphanDirC, "part-orphan-c.parquet")
    java.nio.file.Files.copy(src.toPath, orphanA.toPath)
    java.nio.file.Files.copy(src.toPath, orphanC.toPath)

    // listings: the orphans are invisible
    val files = graft.core.Fetch.allFiles(spark, root)
    assert(files.toSet == committed.toSet, "orphan files must not appear in listings")
    assert(graft.core.Fetch.getAllPartitionValues(spark, root, "p").toSet == Set("a", "b"),
      "an uncommitted partition dir must not appear in partition values")
    // fetch agrees with the listing surface (scan honors the log natively)
    assert(graft.core.Fetch.fetch(spark, root).count() == 3)
    // diff against a published comparison dataset is exact
    val cmp = "/tmp/graft_test/stream_sink_listing_cmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cmp))
    graft.core.Publish.publish(spark,
      Seq((10L, "a", 0.0)).toDF("id", "p", "v"), cmp, Seq("p"))
    val diff = graft.core.Fetch.fetchDiff(spark, root, cmp, "p")
    assert(diff.select("p").distinct().as[String].collect().toSet == Set("b"),
      "fetchDiff must diff committed partitions only")
  }

  test("sink-fed dataset: version-checked manifest plans fetchIndexed; new commits void it") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_test/stream_sink_manifest"
    val ckpt = "/tmp/graft_test/stream_sink_manifest_ckpt"
    Seq(root, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val input = MemoryStream[(Long, String, Double)]
    val query = EventStream.streamToDataset(spark,
      input.toDF().toDF("id", "p", "v"), root, Seq("p"), ckpt)
    input.addData((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
    query.processAllAvailable()
    // standalone maintenance (what a nightly job runs when the writer
    // doesn't index): stamps a marker carrying the sink-log version
    graft.core.StatsIndex.syncSinkDataset(spark, root, Seq("v"))
    assert(graft.core.StatsIndex.manifestColumns(spark, root).contains(Seq("v")))
    val meta = graft.core.DatasetMeta.read(spark, root).get
    val all = graft.core.StatsIndex.candidateFiles(spark, root, meta, Nil)
    assert(all.nonEmpty)
    // manifest mode never surfaces an uncommitted orphan: it plans from
    // the sidecar, which was built from the commit log
    val orphan = new java.io.File(s"$root/p=a/part-orphan.parquet")
    java.nio.file.Files.copy(new java.io.File(all.head).toPath, orphan.toPath)
    assert(graft.core.StatsIndex.candidateFiles(spark, root, meta, Nil).toSet == all.toSet)
    assert(graft.core.Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(graft.core.ColFilter("v", ">=", Seq(3.0)))).count() == 1)
    // a NEW commit voids the claim (the sink added files outside the
    // marker protocol) — readers fall back to the log path, still exact
    input.addData((4L, "b", 9.0))
    query.processAllAvailable()
    assert(graft.core.StatsIndex.manifestColumns(spark, root).isEmpty,
      "a marker stamped at batch v must be void once batch v+1 commits")
    assert(graft.core.Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(graft.core.ColFilter("v", ">=", Seq(3.0)))).count() == 2)
    // re-sync: claim restored, the appended batch's file is covered
    graft.core.StatsIndex.syncSinkDataset(spark, root, Seq("v"))
    assert(graft.core.StatsIndex.manifestColumns(spark, root).contains(Seq("v")))
    assert(graft.core.Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(graft.core.ColFilter("v", ">=", Seq(3.0)))).count() == 2)
    query.stop()
  }

  test("streamToDataset with statsCols auto-syncs the manifest off query progress") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_test/stream_sink_autosync"
    val ckpt = "/tmp/graft_test/stream_sink_autosync_ckpt"
    Seq(root, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val input = MemoryStream[(Long, String, Double)]
    val query = EventStream.streamToDataset(spark,
      input.toDF().toDF("id", "p", "v"), root, Seq("p"), ckpt, statsCols = Seq("v"))
    input.addData((1L, "a", 1.0), (2L, "b", 5.0))
    query.processAllAvailable()
    // the listener syncs asynchronously after the batch commits
    val deadline = System.currentTimeMillis() + 60000
    while (graft.core.StatsIndex.manifestColumns(spark, root).isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(graft.core.StatsIndex.manifestColumns(spark, root).contains(Seq("v")),
      "the progress listener must establish the manifest claim")
    assert(graft.core.Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(graft.core.ColFilter("v", ">=", Seq(5.0)))).count() == 1)
    query.stop()
  }

  test("streaming dedup drops within-watermark duplicate keys across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "payload")

    val query = EventStream.dedupStream(events, Seq("event_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("ev_dedup")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a"),
      (Timestamp.valueOf("2024-01-01 10:00:30"), 2L, "b"),
      (Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "a-dup-same-batch"))
    query.processAllAvailable()
    input.addData(
      (Timestamp.valueOf("2024-01-01 10:02:00"), 2L, "b-dup-next-batch"),
      (Timestamp.valueOf("2024-01-01 10:03:00"), 3L, "c"))
    query.processAllAvailable()

    val ids = spark.table("ev_dedup").select("event_id", "payload")
      .as[(Long, String)].collect().toSet
    query.stop()
    assert(ids == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("stream-stream interval join pairs events within the lookback window") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val views = MemoryStream[(Timestamp, Long, String)]
    val pdf = purchases.toDF().toDF("ts", "user_id", "amount")
    val vdf = views.toDF().toDF("ts", "user_id", "page")

    val joined = EventStream.intervalJoinStream(
      pdf, vdf, Seq("user_id"), "ts", "ts", lookbackSeconds = 300)
    val query = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()

    views.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "home"),   // 4 min before -> in window
      (Timestamp.valueOf("2024-01-01 09:50:00"), 1L, "old"),    // 14 min before -> out
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "late"),   // after purchase -> out
      (Timestamp.valueOf("2024-01-01 10:03:00"), 2L, "other"))  // other user
    purchases.addData((Timestamp.valueOf("2024-01-01 10:04:00"), 1L, 9.99))
    query.processAllAvailable()

    val rows = spark.table("ss_join").select("user_id", "amount", "page_r")
      .as[(Long, Double, String)].collect().toSet
    query.stop()
    assert(rows == Set((1L, 9.99, "home")))
  }

  test("interval join works identically on batch frames") {
    val p = Seq((Timestamp.valueOf("2024-01-01 10:04:00"), 1L, 9.99))
      .toDF("ts", "user_id", "amount")
    val v = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "home"),
      (Timestamp.valueOf("2024-01-01 09:50:00"), 1L, "old"))
      .toDF("ts", "user_id", "page")
    val out = EventStream.intervalJoinStream(p, v, Seq("user_id"), "ts", "ts", 300)
      .select("page_r").as[String].collect().toSeq
    assert(out == Seq("home"))
  }

  test("batch and streaming share window semantics") {
    val batch = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0)
    ).toDF("ts", "event_type", "value")
    val out = EventStream.windowedAgg(batch)
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(out == Seq((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0)))
  }
}
