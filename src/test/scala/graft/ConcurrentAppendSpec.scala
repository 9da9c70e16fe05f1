package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DatasetLock, DatasetMeta, Fetch, Publish, Versions}

/** Optimistic concurrent appends: racing versioned appenders land as
  * consecutive versions without serializing their data writes on the
  * dataset lock; the non-commuting interleave (schema-changing overwrite)
  * is rejected at the commit CAS.
  */
class ConcurrentAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("racing appenders land as consecutive versions with no lost rows") {
    val root = TestSpark.tmpDir("concurrent_append")
    Publish.publishVersioned(spark,
      (0 until 40).map(i => (i.toLong, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    val writers = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val results = (0 until writers).map { w =>
      pool.submit(new java.util.concurrent.Callable[Seq[String]] {
        override def call(): Seq[String] = {
          start.await()
          Publish.publishVersioned(spark,
            (0 until 10).map(i => (1000L + w * 100 + i, s"g${i % 2}", -1.0))
              .toDF("id", "grp", "v"),
            root, Seq("grp"), mode = "append")
        }
      })
    }
    start.countDown()
    val added = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // consecutive versions 2..5, one per appender, every one an append
    assert(Versions.latestVersion(spark, root).contains(1 + writers))
    val entries = (2 to 1 + writers).map(Versions.readEntry(spark, root, _))
    assert(entries.forall(_.action == "append"))
    // each version's files are exactly ONE appender's files — no
    // misattribution between racing writers
    val entryFiles = entries.map(_.added.toSet)
    val writerFiles = added.map(_.map(a =>
      a.split("/concurrent_append", 2).last.split("/", 2).last).toSet)
    assert(entryFiles.toSet == writerFiles.toSet,
      s"commit entries $entryFiles must match writer file sets $writerFiles")
    assert(entryFiles.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty })
    // no rows lost, base rows untouched; direct-write appends never
    // create a staging dir at all
    val ids = Fetch.fetch(spark, root).select("id").as[Long].collect().sorted.toSeq
    val expect = ((0L until 40L) ++
      (0 until writers).flatMap(w => (0 until 10).map(i => 1000L + w * 100 + i))).sorted
    assert(ids == expect)
    assert(!new java.io.File(root, "_graft_stage").exists())
    // every intermediate snapshot is readable and monotone in size
    val counts = (1 to 1 + writers).map(v =>
      Versions.fetchVersion(spark, root, v).count())
    assert(counts == counts.sorted && counts.head == 40 && counts.last == 80)
  }

  test("an append completes while another writer holds the dataset lock") {
    val root = TestSpark.tmpDir("concurrent_append_lock")
    Publish.publishVersioned(spark,
      (0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    val holding = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => DatasetLock.withLock(spark, root) {
      holding.countDown()
      release.await(60, TimeUnit.SECONDS); ()
    })
    holder.start()
    try {
      assert(holding.await(30, TimeUnit.SECONDS))
      // the append must NOT serialize on the held lock (pre-CAS behavior
      // was a 10-minute wait) — unindexed dataset, so no stats step either
      val t0 = System.nanoTime()
      Publish.publishVersioned(spark,
        Seq((100L, -1.0)).toDF("id", "v"), root, Nil, mode = "append")
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 60, s"append blocked ${sec}s on the dataset lock")
      assert(Versions.latestVersion(spark, root).contains(2))
    } finally {
      release.countDown()
      holder.join(60000)
    }
    assert(Fetch.fetch(spark, root).count() == 11)
  }

  test("vacuum during the write->commit window keeps the appender's files") {
    // The race the grace horizon closes: an optimistic appender's files
    // are written into the live tree BEFORE its commit entry exists, so a
    // concurrent vacuum sees them as unreferenced. With the default grace
    // horizon the just-written (freshly restamped) files survive while
    // genuinely old ghosts are reclaimed; the append then commits a
    // version whose every file is intact.
    val root = TestSpark.tmpDir("vacuum_append_race")
    Publish.publishVersioned(spark,
      (0 until 20).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    val v1Files = Versions.readEntry(spark, root, 1).added
    // v2 overwrite makes v1's files dead; age BOTH sets past the horizon
    // so the test distinguishes "kept by grace" from "kept because young"
    Publish.publishVersioned(spark,
      (100 until 120).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    Publish.listPhysicalDataFilesWithSize(spark, root).foreach { case (p, _) =>
      f.setTimes(new org.apache.hadoop.fs.Path(p), old, -1)
    }
    val renamed = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    Publish.postWriteHook = () => { renamed.countDown(); proceed.await(60, TimeUnit.SECONDS); () }
    val pool = Executors.newSingleThreadExecutor()
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[Seq[String]] {
        override def call(): Seq[String] =
          Publish.publishVersioned(spark,
            (200 until 210).map(i => (i.toLong, -1.0)).toDF("id", "v"),
            root, Nil, mode = "append")
      })
      assert(renamed.await(60, TimeUnit.SECONDS), "append never reached the post-write window")
      // vacuum fires inside the window, default grace: v1's aged ghosts go,
      // the appender's renamed-but-uncommitted files stay
      val dead = Versions.vacuum(spark, root, keepFrom = 2)
      assert(dead.map(_.split("/").last).toSet ==
        v1Files.map(_.split("/").last).toSet,
        s"vacuum must reclaim exactly v1's ghosts, got $dead")
      proceed.countDown()
      val appended = fut.get(60, TimeUnit.SECONDS)
      // the commit landed and references only files that still exist
      assert(Versions.latestVersion(spark, root).contains(3))
      appended.foreach(a => assert(f.exists(new org.apache.hadoop.fs.Path(a)),
        s"appended file $a was vacuumed before its commit"))
      val ids = Fetch.fetch(spark, root).select("id").as[Long].collect().sorted.toSeq
      assert(ids == ((100L until 120L) ++ (200L until 210L)).sorted)
    } finally {
      Publish.postWriteHook = () => ()
      pool.shutdownNow()
    }
    // with the appends quiesced, a zero-grace vacuum is allowed to reclaim
    // anything unreferenced — nothing is, so it deletes nothing
    assert(Versions.vacuum(spark, root, keepFrom = 3, graceMs = 0).isEmpty)
    assert(Fetch.fetch(spark, root).count() == 30)
  }

  test("append racing a schema-changing overwrite is rejected, not mixed") {
    val root = TestSpark.tmpDir("concurrent_append_conflict")
    val oldSchema = Seq((1L, 1.0)).toDF("id", "v").schema
    Publish.publishVersioned(spark, Seq((1L, 1.0)).toDF("id", "v"), root, Nil)
    // the overwrite changes the schema under the (already-staged) append
    Publish.publishVersioned(spark,
      Seq((1L, "x")).toDF("id", "s"), root, Nil)
    val e = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "append", Nil, DatasetMeta(oldSchema, Nil))
    }
    assert(e.getMessage.contains("schema-changing overwrite"))
    // same-schema interleaves commit fine (appends commute with them)
    Versions.commit(spark, root, "append", Nil,
      DatasetMeta(Seq((1L, "x")).toDF("id", "s").schema, Nil))
    assert(Versions.latestVersion(spark, root).contains(3))
    // the guard is UNCONDITIONAL on the latest entry: a same-schema append
    // landing after the overwrite must not launder a still-staler append
    // (the latest entry is no longer the overwrite itself, but it carries
    // the governing schema forward)
    val e2 = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "append", Nil, DatasetMeta(oldSchema, Nil))
    }
    assert(e2.getMessage.contains("schema-changing overwrite"))
    assert(Versions.latestVersion(spark, root).contains(3))
  }
}
