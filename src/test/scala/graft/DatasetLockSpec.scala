package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, DatasetLock, Fetch, Publish, StatsIndex}

/** The concurrent-writer contract: appends serialize under the dataset's
  * writer lock, crashed writers' locks break as stale, and the guarantees
  * that motivated the lock (exactly-once dedup append across WRITERS, a
  * trustworthy completeness marker) hold under real interleaving.
  */
class DatasetLockSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("concurrent overlapping dedup-appends yield every key exactly once") {
    // Two writers deliver OVERLAPPING halves at the same time. Unlocked,
    // both bloom probes can run before either write and the overlap
    // double-inserts; the lock serializes the whole read-prove-append
    // cycle, so the result is exactly one row per key.
    val r = "/tmp/graft_test/lock_dedup_race"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    Publish.publishDedupAppend(spark,
      spark.range(100).select(col("id"), lit("seed").as("src")), r, Seq("id"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def deliver(lo: Int, hi: Int) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        Publish.publishDedupAppend(spark,
          spark.range(lo, hi).select(col("id"), lit("batch").as("src")), r, Seq("id"))
      }
    })
    val a = deliver(100, 300) // overlap: 200..299
    val b = deliver(200, 400)
    start.countDown()
    a.get(120, TimeUnit.SECONDS)
    b.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val got = Fetch.fetch(spark, r)
    assert(got.count() == 400, "every key exactly once")
    assert(got.groupBy("id").count().where(col("count") > 1).isEmpty,
      "no key may be double-inserted by racing writers")
  }

  test("concurrent plain appends keep the manifest marker trustworthy") {
    val r = "/tmp/graft_test/lock_manifest_race"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    Publish.publish(spark, spark.range(100).select(col("id"),
      col("id").cast("double").as("v")), r, Nil, statsCols = Seq("v"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def append(offset: Long) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        // no statsCols: relies on the marker auto-maintenance path, the
        // one a lost race would leave claiming completeness over
        // unindexed files
        Publish.publish(spark, spark.range(100).select((col("id") + offset).as("id"),
          (col("id").cast("double") + offset).as("v")), r, Nil, mode = "append")
      }
    })
    val a = append(10000L)
    val b = append(20000L)
    start.countDown()
    a.get(120, TimeUnit.SECONDS)
    b.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // the marker survived both appends AND every file is indexed: each
    // append's rows are findable through the manifest-planned read
    assert(StatsIndex.manifestColumns(spark, r).contains(Seq("v")))
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("v", ">=", Seq(10000.0)), ColFilter("v", "<", Seq(10100.0))))
      .count() == 100)
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("v", ">=", Seq(20000.0)))).count() == 100)
    assert(Fetch.fetch(spark, r).count() == 300)
  }

  test("a crashed writer's stale lock breaks; a live one is waited out") {
    val r = "/tmp/graft_test/lock_stale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    new java.io.File(r).mkdirs()
    // a lock whose MOD-TIME is far in the past = a writer that died
    // mid-publish (staleness is judged by mod-time, never contents)
    val lockFile = new java.io.File(r, DatasetLock.FileName)
    java.nio.file.Files.writeString(lockFile.toPath,
      (System.currentTimeMillis() - 3600L * 1000).toString)
    assert(lockFile.setLastModified(System.currentTimeMillis() - 3600L * 1000))
    var ran = false
    DatasetLock.withLock(spark, r, staleMs = 60000L) { ran = true }
    assert(ran, "a stale lock must be broken, not waited on forever")
    assert(!lockFile.exists(), "the lock releases after the critical section")
    // a FRESH foreign lock is honored: a bounded wait times out
    java.nio.file.Files.writeString(lockFile.toPath,
      System.currentTimeMillis().toString)
    val e = intercept[IllegalStateException] {
      DatasetLock.withLock(spark, r, waitMs = 400L) { fail("must not enter") }
    }
    assert(e.getMessage.contains("writer lock"))
    lockFile.delete()
  }

  test("an EMPTY fresh lock (holder between create and close) is honored, not broken") {
    // The pre-hardening bug: an unreadable/empty stamp was treated as
    // stale (stampedAt=0) and a LIVE writer's lock could be deleted in the
    // window where HDFS reports length 0. Mod-time-based staleness must
    // wait on it instead.
    val r = "/tmp/graft_test/lock_empty_fresh"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    new java.io.File(r).mkdirs()
    val lockFile = new java.io.File(r, DatasetLock.FileName)
    assert(lockFile.createNewFile()) // zero bytes, mod-time = now
    val e = intercept[IllegalStateException] {
      DatasetLock.withLock(spark, r, waitMs = 500L) { fail("must not enter") }
    }
    assert(e.getMessage.contains("writer lock"))
    assert(lockFile.exists(), "a live (fresh, empty) lock must never be deleted")
    lockFile.delete()
  }

  test("the holder's keepalive keeps the lock mod-time fresh past staleMs") {
    // A live writer whose critical section outlives staleMs must not look
    // crashed to a cross-process contender: the holder touches the lock's
    // mod-time every staleMs/4, so the observed age never approaches the
    // stale threshold no matter how long the write runs.
    val r = "/tmp/graft_test/lock_keepalive"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    new java.io.File(r).mkdirs()
    val lockFile = new java.io.File(r, DatasetLock.FileName)
    var maxAge = 0L
    DatasetLock.withLock(spark, r, staleMs = 1000L) {
      val deadline = System.currentTimeMillis() + 2500
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        maxAge = math.max(maxAge, System.currentTimeMillis() - lockFile.lastModified)
      }
    }
    assert(maxAge < 1000,
      s"holder ran 2.5x past staleMs; a contender would have seen age ${maxAge}ms and broken a LIVE lock")
    assert(!lockFile.exists())
  }

  test("a sub-floor staleMs is clamped: the keepalive still outruns staleness") {
    // For staleMs below MinStaleMs the first keepalive touch (at staleMs/4,
    // floored at 200ms) could land AFTER the lock already looked stale to a
    // contender, silently voiding the live-holder guarantee. withLock clamps
    // staleMs up to the floor, so the observed age stays inside it.
    val r = "/tmp/graft_test/lock_stale_floor"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    new java.io.File(r).mkdirs()
    val lockFile = new java.io.File(r, DatasetLock.FileName)
    var maxAge = 0L
    DatasetLock.withLock(spark, r, staleMs = 100L) { // clamped to MinStaleMs
      val deadline = System.currentTimeMillis() + 1500
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        maxAge = math.max(maxAge, System.currentTimeMillis() - lockFile.lastModified)
      }
    }
    assert(maxAge < DatasetLock.MinStaleMs,
      s"with the clamp, a contender judging staleness at the effective floor " +
        s"must always see a fresh lock; observed age ${maxAge}ms")
    assert(!lockFile.exists())
  }

  test("a persistently unbreakable stale lock times out instead of spinning") {
    // A filesystem that denies rename but allows create/stat (an ACL'd
    // object-store mount) makes every tryBreakStale fail. The acquire loop
    // must then reach the waitMs deadline at poll cost — before the fix it
    // spun create->stat->failed-break at 100% CPU forever.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.norename.impl", classOf[NoRenameLocalFs].getName)
    val r = "norename:/tmp/graft_test/lock_norename"
    val local = "/tmp/graft_test/lock_norename"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(local))
    new java.io.File(local).mkdirs()
    val lockFile = new java.io.File(local, DatasetLock.FileName)
    assert(lockFile.createNewFile())
    assert(lockFile.setLastModified(System.currentTimeMillis() - 3600L * 1000))
    val started = System.currentTimeMillis()
    val e = intercept[IllegalStateException] {
      DatasetLock.withLock(spark, r, waitMs = 1500L, staleMs = 60000L) {
        fail("must not enter: the stale lock cannot be broken on this fs")
      }
    }
    assert(e.getMessage.contains("timed out"))
    val elapsed = System.currentTimeMillis() - started
    assert(elapsed >= 1500L, s"deadline honored, got ${elapsed}ms")
    assert(lockFile.exists(), "the unbreakable lock is left in place")
    lockFile.delete()
  }

  test("two contenders racing the same stale lock: exactly one breaks it") {
    // Rename-first breaking: rename is atomic, so of N contenders that all
    // judged one lock stale, exactly one wins the break; the losers fall
    // back to the create race instead of blind-deleting a lock a third
    // party may have re-acquired fresh.
    val r = "/tmp/graft_test/lock_break_race"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    new java.io.File(r).mkdirs()
    val p = new org.apache.hadoop.fs.Path(r, DatasetLock.FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to 20).foreach { _ =>
      val out = fs.create(p, false); out.close()
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      val tasks = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = { start.await(); DatasetLock.tryBreakStale(fs, p) }
        })
      }
      start.countDown()
      val breakers = tasks.count(_.get(30, TimeUnit.SECONDS))
      pool.shutdown()
      assert(breakers == 1, s"exactly one contender may break a stale lock, got $breakers")
      assert(!fs.exists(p), "the broken lock is gone")
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(r)).isEmpty,
        "no tombstone litter after the break")
    }
  }

  test("compaction racing a concurrent append to its destination serializes") {
    // The remaining writer pair: compactSmallFiles builds `dest` under the
    // dest lock while an appender targets the same root. The lock must
    // force one of the two SERIALIZED outcomes — never a torn interleaving
    // where the marker claims completeness over files the index missed:
    //  - compact then append: src rows + appended rows
    //  - append then compact: compaction's overwrite publish clobbers the
    //    append (last-writer-wins overwrite is the documented semantic),
    //    leaving exactly the src rows
    // In BOTH cases the manifest-planned read must agree with the plain
    // read (trustworthy marker), or the reader degrades to listing mode —
    // either way fetchIndexed == fetch under the same filter.
    val src = "/tmp/graft_test/lock_compact_src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
    Publish.publish(spark, spark.range(500).select(col("id"),
      col("id").cast("double").as("v")), src, Nil, statsCols = Seq("v"))
    Publish.publish(spark, spark.range(500, 1000).select(col("id"),
      col("id").cast("double").as("v")), src, Nil, mode = "append")
    val srcCount = 1000L
    (1 to 3).foreach { round =>
      val dest = s"/tmp/graft_test/lock_compact_dest_$round"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dest))
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val compactF = pool.submit(new Runnable {
        def run(): Unit = { start.await(); Fetch.compactSmallFiles(spark, src, dest) }
      })
      val appendF = pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          Publish.publish(spark, spark.range(100).select((col("id") + 50000L).as("id"),
            (col("id").cast("double") + 50000.0).as("v")), dest, Nil, mode = "append")
        }
      })
      start.countDown()
      compactF.get(120, TimeUnit.SECONDS)
      appendF.get(120, TimeUnit.SECONDS)
      pool.shutdown()
      val total = Fetch.fetch(spark, dest).count()
      assert(total == srcCount || total == srcCount + 100,
        s"round $round: torn state — $total rows is neither serialized outcome")
      // marker trustworthiness: the manifest-planned read and the plain
      // read must agree on the appended slice, whichever ordering won
      val appended = Fetch.fetch(spark, dest).where(col("v") >= 50000.0).count()
      assert(appended == (total - srcCount))
      val indexed = Fetch.fetchIndexed(spark, dest,
        dataFilters = Seq(ColFilter("v", ">=", Seq(50000.0)))).count()
      assert(indexed == appended,
        s"round $round: manifest-planned read sees $indexed rows where the plain read sees $appended")
    }
  }

  test("the lock is re-entrant per thread (dedup append publishes under its own lock)") {
    val r = "/tmp/graft_test/lock_reentrant"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    new java.io.File(r).mkdirs()
    var depth = 0
    DatasetLock.withLock(spark, r) {
      depth += 1
      DatasetLock.withLock(spark, r, waitMs = 200L) { depth += 1 }
    }
    assert(depth == 2)
    assert(!new java.io.File(r, DatasetLock.FileName).exists())
  }
}

/** Local filesystem whose rename always fails — models a mount where the
  * writer may create/stat but not rename (so stale locks are unbreakable).
  * Instantiated by Hadoop via reflection from `fs.norename.impl`.
  */
class NoRenameLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = false
}
