package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, Fetch, Publish, Versions}

/** Versioned datasets: time travel, snapshot isolation of logical
  * overwrite, schema change across versions, vacuum semantics, and the
  * log-awareness of live reads / listings / introspection.
  */
class VersionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshVersioned(): String = {
    val root = TestSpark.tmpDir("versions")
    // v1: overwrite ids 0-9, v2: append ids 10-14, v3: logical overwrite
    // with ONLY ids 100-102
    Publish.publishVersioned(spark,
      (0 until 10).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"),
      root, Seq("grp"))
    Publish.publishVersioned(spark,
      (10 until 15).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"),
      root, Seq("grp"), mode = "append")
    Publish.publishVersioned(spark,
      (100 until 103).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"),
      root, Seq("grp"))
    root
  }

  test("fetchVersion reads each version exactly; latest wins for fetch") {
    val root = freshVersioned()
    assert(Versions.latestVersion(spark, root).contains(3))
    assert(Versions.fetchVersion(spark, root, 1).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 10L))
    assert(Versions.fetchVersion(spark, root, 2).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 15L))
    assert(Versions.fetchVersion(spark, root, 3).select("id")
      .as[Long].collect().sorted.toSeq == (100L until 103L))
    // live reads see the latest snapshot, NOT the ghost files
    assert(Fetch.fetch(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == (100L until 103L))
    assert(Versions.fetchSnapshot(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == (100L until 103L))
  }

  test("logical overwrite keeps old files on disk but hides them everywhere") {
    val root = freshVersioned()
    // physical files of all three versions are present...
    val physical = Publish.listPhysicalDataFilesWithSize(spark, root).map(_._1)
    val live = Publish.listDataFiles(spark, root)
    assert(physical.size > live.size, s"expected ghosts: $physical vs $live")
    // ...but listings and introspection see only the live set
    assert(live.toSet == physical.filter(f =>
      Versions.snapshotAt(spark, root, 3)._1.exists(r => f.endsWith(r))).toSet)
    // partition filters still prune on the snapshot read
    val g0 = Fetch.fetch(spark, root, Seq(ColFilter("grp", "==", Seq("g0"))))
    assert(g0.select("id").as[Long].collect().sorted.toSeq == Seq(100L, 102L))
  }

  test("schema may change across overwrite versions; each version pins its own") {
    val root = TestSpark.tmpDir("versions_schema")
    Publish.publishVersioned(spark,
      Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    Publish.publishVersioned(spark,
      Seq((2L, "extra", "a")).toDF("id", "note", "grp"), root, Seq("grp"))
    assert(Versions.fetchVersion(spark, root, 1).columns.toSeq == Seq("id", "grp"))
    assert(Versions.fetchVersion(spark, root, 2).columns.toSeq == Seq("id", "note", "grp"))
    assert(Versions.fetchVersion(spark, root, 2).select("note")
      .as[String].collect().toSeq == Seq("extra"))
    // versioned APPEND with a mismatched schema is rejected
    val e = intercept[IllegalArgumentException] {
      Publish.publishVersioned(spark,
        Seq((3L, 9.9, "a")).toDF("id", "other", "grp"), root, Seq("grp"),
        mode = "append")
    }
    assert(e.getMessage.contains("schema"))
  }

  test("history lists one row per commit") {
    val root = freshVersioned()
    val h = Versions.history(spark, root)
      .select("version", "action").as[(Int, String)].collect().toSeq
    assert(h == Seq((1, "overwrite"), (2, "append"), (3, "overwrite")))
  }

  test("history surfaces operation metadata (the commitInfo shape)") {
    val root = freshVersioned()
    graft.core.Mutations.deleteWhere(spark, root,
      org.apache.spark.sql.functions.col("id") === 101) // live at v3
    Versions.compact(spark, root, zorderCols = Seq("id"))
    Versions.restore(spark, root, 3)
    val h = Versions.history(spark, root)
      .select("version", "operation", "op_params")
      .as[(Int, String, String)].collect().sortBy(_._1)
    val byOp = h.groupBy(_._2).map { case (k, v) => k -> v.head._3 }
    assert(byOp("DELETE").contains("predicate==(id, 101)"),
      s"delete commit must carry the predicate: $byOp")
    assert(byOp("OPTIMIZE").contains("zorder=id"))
    assert(byOp("RESTORE").contains("version=3"))
    // un-annotated commits fall back to the action verb
    assert(h.head._2 == "overwrite" && h.head._3.isEmpty)
  }

  test("vacuum deletes only dead files and makes old versions fail loudly") {
    val root = freshVersioned()
    val deadBefore = Publish.listPhysicalDataFilesWithSize(spark, root).size
    val deleted = Versions.vacuum(spark, root, keepFrom = 3, graceMs = 0)
    assert(deleted.nonEmpty)
    val after = Publish.listPhysicalDataFilesWithSize(spark, root).map(_._1)
    assert(after.size == deadBefore - deleted.size)
    // latest still reads exactly
    assert(Versions.fetchVersion(spark, root, 3).select("id")
      .as[Long].collect().sorted.toSeq == (100L until 103L))
    // vacuumed versions are refused, not partially served
    val e = intercept[IllegalArgumentException] {
      Versions.fetchVersion(spark, root, 1)
    }
    assert(e.getMessage.contains("vacuum"))
    // history survives vacuum (the log is never truncated)
    assert(Versions.history(spark, root).count() == 3)
  }

  test("a corrupt commit entry fails fast with repair guidance, not a stall") {
    val root = freshVersioned()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entry = new org.apache.hadoop.fs.Path(root, "_graft_versions/v00000002.json")
    val out = f.create(entry, true)
    try out.write("{\"version\": 2, \"action\"".getBytes("UTF-8")) finally out.close()
    val t0 = System.nanoTime()
    val e = intercept[IllegalStateException] { Versions.readEntry(spark, root, 2) }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("crashed mid-write"))
    assert(e.getMessage.contains("delete this entry file") ||
      e.getMessage.contains("repair"), e.getMessage)
    // the old behavior stalled 10s PER READ on every replay/history call
    assert(sec < 5, s"corrupt-entry read took ${sec}s — retry cap regressed")
  }

  test("addedBetween reads exactly the delta files of the commit range") {
    val root = freshVersioned()
    assert(Versions.addedBetween(spark, root, 1, 2).select("id")
      .as[Long].collect().sorted.toSeq == (10L until 15L))
    // crossing the overwrite boundary re-delivers the new snapshot
    assert(Versions.addedBetween(spark, root, 2, 3).select("id")
      .as[Long].collect().sorted.toSeq == (100L until 103L))
    // full range from before v1
    assert(Versions.addedBetween(spark, root, 0, 2).count() == 15)
    val e = intercept[IllegalArgumentException] {
      Versions.addedBetween(spark, root, 2, 2)
    }
    assert(e.getMessage.contains("from < to"))
    // input-metrics check is indirect: the v1→v2 delta is 5 of 15 rows,
    // so a rescan of the dataset would return 15
  }

  test("compact rewrites the snapshot into fewer files with identical content") {
    val root = TestSpark.tmpDir("versions_compact")
    // 12 tiny appends → at least 12 fragment files
    (0 until 12).foreach { i =>
      Publish.publishVersioned(spark,
        Seq((i.toLong, s"g${i % 2}")).toDF("id", "grp"), root, Seq("grp"),
        mode = "append")
    }
    val fragmented = Publish.listDataFiles(spark, root).size
    Versions.compact(spark, root)
    assert(Versions.latestVersion(spark, root).contains(13))
    val compacted = Publish.listDataFiles(spark, root).size
    assert(compacted < fragmented, s"$compacted !< $fragmented")
    assert(Fetch.fetch(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 12L))
    // pre-compaction versions still time-travel until vacuumed
    assert(Versions.fetchVersion(spark, root, 3).count() == 3)
    Versions.vacuum(spark, root, keepFrom = 13, graceMs = 0)
    assert(Fetch.fetch(spark, root).count() == 12)
  }

  test("rowDiff classifies added/removed/changed and drops unchanged") {
    val root = TestSpark.tmpDir("versions_rowdiff")
    Publish.publishVersioned(spark,
      Seq((1L, "keep", "a"), (2L, "old", "a"), (3L, "gone", "b"))
        .toDF("id", "payload", "grp"), root, Seq("grp"))
    Publish.publishVersioned(spark,
      Seq((1L, "keep", "a"), (2L, "new", "a"), (4L, "fresh", "b"))
        .toDF("id", "payload", "grp"), root, Seq("grp"))
    val diff = Versions.rowDiff(spark, root, 1, 2, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(diff == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("rowDiff ignores columns only one version has (additive evolution)") {
    val root = TestSpark.tmpDir("versions_rowdiff_evolve")
    Publish.publishVersioned(spark,
      Seq((1L, "x", "a")).toDF("id", "payload", "grp"), root, Seq("grp"))
    Publish.publishVersioned(spark,
      Seq((1L, "x", "extra", "a")).toDF("id", "payload", "note", "grp"),
      root, Seq("grp"))
    assert(Versions.rowDiff(spark, root, 1, 2, Seq("id")).count() == 0)
  }

  test("versioned and unversioned publishes cannot mix") {
    val root = TestSpark.tmpDir("versions_mix")
    Publish.publish(spark, Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    val e = intercept[IllegalArgumentException] {
      Publish.publishVersioned(spark, Seq((2L, "b")).toDF("id", "grp"),
        root, Seq("grp"))
    }
    assert(e.getMessage.contains("version log"))
  }

  test("partition columns are fixed across versions") {
    val root = TestSpark.tmpDir("versions_parts")
    Publish.publishVersioned(spark, Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    val e = intercept[IllegalArgumentException] {
      Publish.publishVersioned(spark, Seq((2L, "b")).toDF("id", "grp"), root, Nil)
    }
    assert(e.getMessage.contains("partition"))
  }

  test("introspection on a versioned root reflects the live snapshot only") {
    val root = TestSpark.tmpDir("versions_introspect")
    Publish.publishVersioned(spark,
      Seq((1L, "old1"), (2L, "old2")).toDF("id", "grp"), root, Seq("grp"))
    Publish.publishVersioned(spark,
      Seq((3L, "new1")).toDF("id", "grp"), root, Seq("grp"))
    assert(Fetch.getAllPartitionValues(spark, root, "grp").toSet == Set("new1"))
  }

  test("append after evolved overwrite null-fills old files on snapshot reads") {
    val root = TestSpark.tmpDir("versions_evolve_read")
    Publish.publishVersioned(spark, Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    // overwrite to an EVOLVED schema, then append under it
    Publish.publishVersioned(spark,
      Seq((2L, "n2", "a")).toDF("id", "note", "grp"), root, Seq("grp"))
    Publish.publishVersioned(spark,
      Seq((3L, "n3", "b")).toDF("id", "note", "grp"), root, Seq("grp"), mode = "append")
    val v3 = Versions.fetchVersion(spark, root, 3)
      .orderBy("id").select("id", "note").as[(Long, String)].collect().toSeq
    assert(v3 == Seq((2L, "n2"), (3L, "n3")))
  }

  test("versionAsOf resolves by commit time; fetchAsOf reads that snapshot") {
    val root = freshVersioned()
    // pin distinct, ordered commit instants (same-ms commits are legal but
    // untestable) — commit times live IN the entries since ICT landed
    val base = 1700000000000L
    (1 to 3).foreach(v => EntryEdit.setTs(root, v, base + v * 1000L))
    assert(Versions.versionAsOf(spark, root, base + 1500) == 1)
    assert(Versions.versionAsOf(spark, root, base + 2000) == 2)
    assert(Versions.versionAsOf(spark, root, base + 999999) == 3)
    assert(Versions.fetchAsOf(spark, root, base + 2500).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 15L))
    val e = intercept[IllegalArgumentException] {
      Versions.versionAsOf(spark, root, base)
    }
    assert(e.getMessage.contains("no version"))
  }

  test("consumeChanges drains commits exactly once; failed fn redelivers") {
    val root = TestSpark.tmpDir("versions_cdc")
    val ckpt = TestSpark.tmpDir("versions_cdc_ckpt")
    def app(ids: Range): Unit = Publish.publishVersioned(spark,
      ids.map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"),
      root, Seq("grp"), mode = if (ids.start == 0) "overwrite" else "append")
    app(0 until 5)
    app(5 until 8)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r1 = Versions.consumeChanges(spark, root, ckpt) { df =>
      seen ++= df.select("id").as[Long].collect()
    }
    assert(r1.contains((0, 2)) && seen.sorted.toSeq == (0L until 8L))
    // caught up: nothing redelivered
    assert(Versions.consumeChanges(spark, root, ckpt)(_ => fail("no new data")).isEmpty)
    // new commit delivers only its own rows
    app(8 until 10)
    seen.clear()
    val r2 = Versions.consumeChanges(spark, root, ckpt) { df =>
      seen ++= df.select("id").as[Long].collect()
    }
    assert(r2.contains((2, 3)) && seen.sorted.toSeq == Seq(8L, 9L))
    // a crashing fn leaves the offset untouched -> the batch redelivers
    app(10 until 12)
    intercept[RuntimeException] {
      Versions.consumeChanges(spark, root, ckpt)(_ => throw new RuntimeException("sink down"))
    }
    seen.clear()
    Versions.consumeChanges(spark, root, ckpt) { df =>
      seen ++= df.select("id").as[Long].collect()
    }
    assert(seen.sorted.toSeq == Seq(10L, 11L))
  }

  test("compact with zorderCols rewrites the snapshot z-clustered (OPTIMIZE ZORDER BY)") {
    val root = TestSpark.tmpDir("versions_zopt")
    (0 until 4).foreach { b =>
      Publish.publishVersioned(spark,
        (0 until 250).map(i => (b * 250L + i, (i * 7 % 100).toLong, (i * 13 % 100).toLong))
          .toDF("id", "x", "y"),
        root, Nil, mode = if (b == 0) "overwrite" else "append")
    }
    Versions.compact(spark, root, zorderCols = Seq("x", "y"), zorderPartitions = 4)
    // content identical
    assert(Versions.fetchSnapshot(spark, root).count() == 1000)
    assert(Versions.fetchSnapshot(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 1000L))
    // clustering effect: per-file x-ranges must be narrower than the
    // global range (an unclustered rewrite of 4 uniform batches gives
    // every file the full 0-99 span)
    val (files, meta) = Versions.snapshotAt(spark, root,
      Versions.latestVersion(spark, root).get)
    val spans = files.map { f =>
      val d = spark.read.parquet(new java.io.File(root, f).toString)
        .agg(min("x"), max("x")).head()
      d.getLong(1) - d.getLong(0)
    }
    assert(spans.exists(_ < 99), s"expected at least one narrowed x-span, got $spans")
  }

  test("restore rolls back metadata-only; vacuum keeps restored files alive") {
    val root = freshVersioned() // v1: ids 0-9, v2: +10-14, v3: overwrite 100-102
    val before = Publish.listPhysicalDataFilesWithSize(spark, root).size
    val v4 = Versions.restore(spark, root, 2)
    assert(v4 == 4)
    // zero data copied: physical file count unchanged
    assert(Publish.listPhysicalDataFilesWithSize(spark, root).size == before)
    assert(Versions.fetchSnapshot(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 15L))
    // vacuum to the restore point: v1/v2's files survive (v4 references
    // them), v3's logically-abandoned files die, v3 reads fail loudly
    val dead = Versions.vacuum(spark, root, keepFrom = 4, graceMs = 0)
    assert(dead.nonEmpty)
    assert(Versions.fetchSnapshot(spark, root).count() == 15)
    val e = intercept[IllegalArgumentException] {
      Versions.fetchVersion(spark, root, 3)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("snapshotAt memoizes: repeat costs one entry read, growth only the delta") {
    val root = TestSpark.tmpDir("versions_memo")
    Publish.publishVersioned(spark,
      Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    (2 to 6).foreach(i => Publish.publishVersioned(spark,
      Seq((i.toLong, "a")).toDF("id", "grp"), root, Seq("grp"), mode = "append"))
    def reads(body: => Unit): Long = {
      val before = Versions.entryReads.get(); body
      Versions.entryReads.get() - before
    }
    val (files6, _) = Versions.snapshotAt(spark, root, 6) // populates the memo
    // repeat resolve = exactly the one witness read, not a 6-entry replay
    assert(reads { assert(Versions.snapshotAt(spark, root, 6)._1 == files6) } == 1)
    // a 7th append: resolving v7 seeds from the memoized v6 — the new entry
    // plus the ancestor witness, never the whole chain
    Publish.publishVersioned(spark,
      Seq((7L, "a")).toDF("id", "grp"), root, Seq("grp"), mode = "append")
    assert(reads {
      assert(Versions.fetchVersion(spark, root, 7).select("id")
        .as[Long].collect().sorted.toSeq == (1L to 7L))
    } <= 2)
  }

  test("snapshot memo does not survive dataset re-creation at the same path") {
    val root = TestSpark.tmpDir("versions_memo_recreate")
    Publish.publishVersioned(spark,
      Seq((1L, "a"), (2L, "a")).toDF("id", "grp"), root, Seq("grp"))
    Versions.snapshotAt(spark, root, 1) // memoized under this (root, 1)
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    // same path, same version number, DIFFERENT dataset: the memo's
    // entry-content witness must reject the stale live set
    Publish.publishVersioned(spark,
      Seq((7L, "a")).toDF("id", "grp"), root, Seq("grp"))
    assert(Versions.fetchVersion(spark, root, 1).select("id")
      .as[Long].collect().toSeq == Seq(7L))
  }
}
