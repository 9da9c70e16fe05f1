package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DirectWriteCommitProtocol, Fetch, Publish, Versions}

/** Direct-write commit protocol: versioned-root physical appends write
  * every byte exactly once, directly at its final path — no `_temporary`
  * tree, no staging dir, no rename — with the committed file list coming
  * back from the protocol (no post-write listing), and every failure mode
  * degrading to an invisible, vacuumable orphan.
  */
class DirectWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def listAll(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    here ++ here.filter(_.isDirectory).flatMap(listAll)
  }

  test("protocol writes task files at final paths, no _temporary, list captured") {
    val clone = org.apache.spark.sql.graft.shim.cloneSession(spark)
    clone.conf.set(DirectWriteCommitProtocol.ConfKey,
      classOf[DirectWriteCommitProtocol].getName)
    val dir = TestSpark.tmpDir("direct_write_raw")
    val df = (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(2)
    val cdf = org.apache.spark.sql.graft.shim.ofRows(clone, df.queryExecution.logical)
    val token = java.util.UUID.randomUUID().toString
    val files = DirectWriteCommitProtocol.capture(token) {
      cdf.write.mode("append")
        .option("maxRecordsPerFile", 3) // forces multi-file tasks: the
        .option(DirectWriteCommitProtocol.TokenKey, token)
        .parquet(dir)                   // per-task counter suffix must keep names unique
    }
    // ≥ 4 files for 10 rows at 3/file over 2 tasks; all distinct, all
    // final-named (split-attempt-jobId), all actually present
    assert(files.size >= 4 && files.distinct.size == files.size)
    files.foreach { f =>
      val name = f.split("/").last
      assert(name.matches("part-\\d{5}-\\d+-.*\\.parquet"), s"unexpected name $name")
      assert(new java.io.File(new java.net.URI(f).getPath).exists
        || new java.io.File(f.stripPrefix("file:")).exists, s"missing $f")
    }
    // nothing but the data files ever existed: no _temporary, no _SUCCESS
    // (the local ChecksumFileSystem's hidden .crc sidecars are a
    // RawLocalFileSystem artifact, not protocol output)
    val leftovers = listAll(new java.io.File(dir)).map(_.getName)
      .filterNot(_.matches("part-.*\\.parquet")).filterNot(_.startsWith("."))
    assert(leftovers.isEmpty, s"non-data entries under a direct write: $leftovers")
    // captured list is exactly the readable data
    assert(spark.read.parquet(dir).count() == 10)
    assert(files.size == listAll(new java.io.File(dir))
      .count(f => f.isFile && !f.getName.startsWith(".")))
  }

  test("versioned append lands files in partition dirs with no staging or temp dirs") {
    val root = TestSpark.tmpDir("direct_write_versioned")
    Publish.publishVersioned(spark,
      (0 until 20).map(i => (i.toLong, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    // observe the tree mid-window too: the hook runs after the write,
    // before the commit — no staging/_temporary may exist even then
    var midWindow: Seq[String] = null
    Publish.postWriteHook = () =>
      midWindow = listAll(new java.io.File(root)).map(_.getName)
        .filter(n => n == "_graft_stage" || n == "_temporary")
    try {
      val added = Publish.publishVersioned(spark,
        (100 until 110).map(i => (i.toLong, s"g${i % 2}", -1.0)).toDF("id", "grp", "v"),
        root, Seq("grp"), mode = "append")
      assert(midWindow != null && midWindow.isEmpty,
        s"staging/temp dirs existed mid-append: $midWindow")
      // every appended file sits under its hive partition dir
      assert(added.nonEmpty && added.forall(_.contains("/grp=")))
      // commit entry references exactly the files the protocol captured
      val entry = Versions.readEntry(spark, root, 2)
      assert(entry.added.toSet ==
        added.map(_.split("/direct_write_versioned", 2).last.split("/", 2).last).toSet)
      assert(Fetch.fetch(spark, root).count() == 30)
    } finally Publish.postWriteHook = () => ()
  }

  test("one write per byte: task output bytes equal the committed file bytes") {
    // The point of the protocol: the old stage-then-rename append wrote
    // every byte once and COPIED it once more on object stores (rename =
    // copy there). Task output metrics now account for every byte the
    // engine writes; equality with the committed files' sizes (modulo the
    // local ChecksumFileSystem's ~1% hidden .crc sidecars) shows nothing
    // is written twice and nothing is moved after the write.
    val root = TestSpark.tmpDir("direct_write_iometrics")
    Publish.publishVersioned(spark,
      (0 until 50).map(i => (i.toLong, s"payload-$i" * 20)).toDF("id", "s"), root, Nil)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) bytes.addAndGet(t.taskMetrics.outputMetrics.bytesWritten)
    }
    org.apache.spark.graft.TestShim.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    val added =
      try {
        val a = Publish.publishVersioned(spark,
          (100 until 150).map(i => (i.toLong, s"payload-$i" * 20)).toDF("id", "s"),
          root, Nil, mode = "append")
        org.apache.spark.graft.TestShim.drainListenerBus(spark.sparkContext)
        a
      } finally spark.sparkContext.removeSparkListener(listener)
    val committedBytes = added.map(f => new java.io.File(f).length()).sum
    assert(committedBytes > 0)
    assert(bytes.get >= committedBytes,
      s"metrics ${bytes.get} < committed $committedBytes — files moved outside task writes?")
    assert(bytes.get <= (committedBytes * 1.1).toLong,
      s"metrics ${bytes.get} vs committed $committedBytes — bytes written more than once")
  }

  test("a failed append leaves the snapshot untouched and orphans vacuumable") {
    val root = TestSpark.tmpDir("direct_write_failed")
    Publish.publishVersioned(spark,
      (0 until 20).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    val poison = udf((id: Long) =>
      if (id == 7L) throw new RuntimeException("poisoned row") else id)
    val bad = (0 until 10).map(i => (i.toLong, -1.0)).toDF("id", "v")
      .withColumn("id", poison(col("id")))
    intercept[Exception] {
      Publish.publishVersioned(spark, bad, root, Nil, mode = "append")
    }
    // no commit happened; the committed snapshot reads exactly as before
    assert(Versions.latestVersion(spark, root).contains(1))
    assert(Fetch.fetch(spark, root).count() == 20)
    // any partials the aborts missed are unreferenced orphans: a
    // zero-grace vacuum reclaims them and the snapshot still reads whole
    Versions.vacuum(spark, root, keepFrom = 1, graceMs = 0)
    assert(Fetch.fetch(spark, root).select("id").as[Long].collect().sorted.toSeq
      == (0L until 20L))
  }
}
