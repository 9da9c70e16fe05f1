package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, DatasetMeta, Fetch, Publish, StatsIndex}

/** The 100 TB contract of the stats index: maintenance cost is O(the
  * batch being written), never O(dataset), and pruning never collects
  * the manifest to the driver. Asserted with real input metrics (records
  * read during the operation) and a synthetic many-file manifest.
  */
class StatsIndexScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recordsReadDuring[T](body: => T): (T, Long) =
    IoMetrics.recordsReadDuring(spark)(body)

  test("append maintains the index without re-reading the dataset") {
    val r = "/tmp/graft_test/stats_incr_append"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val baseRows = 20000
    val base = spark.range(baseRows).select(col("id"), (col("id") % 100).cast("double").as("v"))
    Publish.publish(spark, base, r, Nil, statsCols = Seq("v"))

    val batchRows = 500
    val batch = spark.range(batchRows).select((col("id") + baseRows).as("id"),
      (col("id").cast("double") + 10000.0).as("v"))
    val (newFiles, read) = recordsReadDuring {
      Publish.publish(spark, batch, r, Nil, mode = "append", statsCols = Seq("v"))
    }
    assert(newFiles.nonEmpty)
    // A full StatsIndex.build would re-read all 20k base rows; the
    // incremental path reads the appended files (+ the tiny sidecar) only.
    assert(read < baseRows / 2,
      s"append should not rescan the dataset for its index: read $read records")

    // the appended files' stats rows are live: a filter inside the
    // appended range prunes every base file, and vice versa
    val meta = DatasetMeta.read(spark, r).get
    val appended = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("v", ">=", Seq(10000.0))))
    assert(appended.toSet == newFiles.toSet,
      s"appended-range filter must keep exactly the appended files")
    // correctness end-to-end
    val got = Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("v", ">=", Seq(10000.0))))
    assert(got.count() == batchRows)
    val below = Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("v", "<", Seq(100.0))))
    assert(below.count() == baseRows)
  }

  test("appending with different stats columns falls back to a full rebuild") {
    val r = "/tmp/graft_test/stats_incr_recol"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val df = spark.range(1000).select(col("id"), col("id").cast("double").as("v"),
      (col("id") * 2).cast("double").as("w"))
    Publish.publish(spark, df, r, Nil, statsCols = Seq("v"))
    val more = spark.range(1000, 1100).select(col("id"), col("id").cast("double").as("v"),
      (col("id") * 2).cast("double").as("w"))
    Publish.publish(spark, more, r, Nil, mode = "append", statsCols = Seq("v", "w"))
    // the rebuild covers BOTH columns over ALL files
    val meta = DatasetMeta.read(spark, r).get
    assert(StatsIndex.indexedColumns(spark, r) == Seq("v", "w"))
    val hit = StatsIndex.candidateFiles(spark, r, meta, Seq(ColFilter("w", ">=", Seq(2000.0))))
    val all = Fetch.allFiles(spark, r)
    assert(hit.size < all.size, "w-range filter should prune old files after rebuild")
    assert(Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("w", ">=", Seq(2000.0))))
      .count() == 100)
  }

  test("a 10k-file manifest prunes distributed-side to the exact survivor set") {
    // Synthetic manifest: candidateFiles only lists + prunes, so 0-byte
    // .parquet files + a hand-written sidecar exercise the exact path a
    // million-file dataset takes, without writing a million real files.
    val root = "/tmp/graft_test/stats_manifest10k"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val n = 10000
    val dir = new java.io.File(root)
    dir.mkdirs()
    (0 until n).foreach { i =>
      new java.io.File(dir, f"part-$i%05d.parquet").createNewFile()
    }
    // 10 extra files UNKNOWN to the index: must always survive
    (0 until 10).foreach { i =>
      new java.io.File(dir, f"extra-$i%02d.parquet").createNewFile()
    }
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val meta = DatasetMeta(schema, Nil)
    DatasetMeta.write(spark, root, meta)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val qualified = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(rootPath).toUri.getPath
    val sidecar = (0 until n).map { i =>
      (f"$qualified/part-$i%05d.parquet", "v", i.toDouble, i.toDouble + 0.5)
    }.toDF("file", "column", "min_v", "max_v")
    sidecar.write.mode("overwrite").parquet(s"$root/${StatsIndex.DirName}")

    val got = StatsIndex.candidateFiles(spark, root, meta,
      Seq(ColFilter("v", ">=", Seq(9900.0)))).toSet
    val want = ((9900 until n).map(i => f"$qualified/part-$i%05d.parquet") ++
      (0 until 10).map(i => f"$qualified/extra-$i%02d.parquet")).toSet
    assert(got == want,
      s"expected ${want.size} survivors (100 in-range + 10 unknown), got ${got.size}")
    // an equality filter narrows to one known file + the unknowns
    val one = StatsIndex.candidateFiles(spark, root, meta,
      Seq(ColFilter("v", "==", Seq(4242.25)))).toSet
    assert(one == (Set(f"$qualified/part-04242.parquet") ++
      (0 until 10).map(i => f"$qualified/extra-$i%02d.parquet")))
    // BOTH driver-collection modes must yield identical survivor sets: the
    // selective filters above prune >half the manifest (survivor-collect
    // mode); this broad one prunes only 100 files (pruned-collect mode)
    val broad = StatsIndex.candidateFiles(spark, root, meta,
      Seq(ColFilter("v", ">=", Seq(100.0)))).toSet
    val wantBroad = ((100 until n).map(i => f"$qualified/part-$i%05d.parquet") ++
      (0 until 10).map(i => f"$qualified/extra-$i%02d.parquet")).toSet
    assert(broad == wantBroad,
      s"pruned-collect mode: expected ${wantBroad.size} survivors, got ${broad.size}")
  }

  test("a complete manifest plans the scan with no filesystem listing") {
    // The sidecar + completeness marker are AUTHORITATIVE: survivors come
    // from the manifest, not a directory walk. Proven in both directions —
    // paths only the sidecar knows are returned (they don't exist on
    // disk), and stray on-disk files the sidecar doesn't know are NOT
    // (a listing would have surfaced them).
    val root = "/tmp/graft_test/stats_manifest_nolist"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val n = 10000
    new java.io.File(root).mkdirs()
    // stray files a listing WOULD see; the manifest must not return them
    (0 until 5).foreach { i =>
      new java.io.File(root, f"stray-$i.parquet").createNewFile()
    }
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val meta = DatasetMeta(schema, Nil)
    DatasetMeta.write(spark, root, meta)
    val sidecar = (0 until n).map { i =>
      (f"/nonexistent/manifest_only/part-$i%05d.parquet", "v", i.toDouble, i.toDouble + 0.5,
        null.asInstanceOf[String], null.asInstanceOf[String])
    }.toDF("file", "column", "min_v", "max_v", "min_s", "max_s")
    sidecar.write.mode("overwrite").parquet(s"$root/${StatsIndex.DirName}")
    StatsIndex.writeMarker(spark, root, Seq("v"))

    val got = StatsIndex.candidateFiles(spark, root, meta,
      Seq(ColFilter("v", ">=", Seq(9900.0)))).toSet
    val want = (9900 until n).map(i => f"/nonexistent/manifest_only/part-$i%05d.parquet").toSet
    assert(got == want,
      s"manifest mode must return exactly the sidecar survivors: got ${got.size}, want ${want.size}")
    // no data filters: the manifest IS the file list — still no listing
    val all = StatsIndex.candidateFiles(spark, root, meta, Nil)
    assert(all.size == n && !all.exists(_.contains("stray")),
      "unfiltered manifest plan must come from the sidecar, not the directory")
  }

  test("append without statsCols keeps a complete manifest complete") {
    val r = "/tmp/graft_test/stats_manifest_keep"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val base = spark.range(2000).select(col("id"), (col("id") % 100).cast("double").as("v"))
    Publish.publish(spark, base, r, Nil, statsCols = Seq("v"))
    assert(StatsIndex.manifestColumns(spark, r).contains(Seq("v")))
    // the caller forgets statsCols: maintenance still runs for the
    // marker's recorded columns, so the manifest claim survives
    val batch = spark.range(100).select((col("id") + 2000).as("id"),
      (col("id").cast("double") + 50000.0).as("v"))
    Publish.publish(spark, batch, r, Nil, mode = "append")
    assert(StatsIndex.manifestColumns(spark, r).contains(Seq("v")),
      "an indexed-complete dataset must stay complete across a no-statsCols append")
    // the appended file is indexed: an in-range filter finds its rows and
    // an out-of-range one prunes it
    val got = Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("v", ">=", Seq(50000.0))))
    assert(got.count() == 100)
    val meta = DatasetMeta.read(spark, r).get
    val appendedOnly = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("v", ">=", Seq(50000.0))))
    assert(appendedOnly.nonEmpty && appendedOnly.size < Fetch.allFiles(spark, r).size,
      "base files must prune under the appended-range filter")
  }

  test("a missing marker falls back to the conservative listing path") {
    val r = "/tmp/graft_test/stats_manifest_fallback"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val base = spark.range(1000).select(col("id"), (col("id") % 100).cast("double").as("v"))
    Publish.publish(spark, base, r, Nil, statsCols = Seq("v"))
    assert(StatsIndex.manifestColumns(spark, r).isDefined)
    // a foreign write drops a file in WITHOUT index maintenance, voiding
    // the claim (here: simulated by copying a data file + deleting the
    // marker, the state any crash window or foreign writer leaves behind)
    val files = Fetch.allFiles(spark, r)
    val srcFile = new java.io.File(files.head)
    val foreign = new java.io.File(srcFile.getParent, "foreign-copy.parquet")
    org.apache.commons.io.FileUtils.copyFile(srcFile, foreign)
    new java.io.File(s"$r/${StatsIndex.DirName}/_complete.json").delete()
    assert(StatsIndex.manifestColumns(spark, r).isEmpty)
    val meta = DatasetMeta.read(spark, r).get
    // listing mode: the unknown file has no stats row and must survive
    // every filter
    val got = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("v", ">=", Seq(1e9))))
    assert(got.exists(_.endsWith("foreign-copy.parquet")),
      s"unknown file must always be scanned in listing mode: $got")
  }

  test("compaction migrates the index; only re-encoded fragments are re-read") {
    val src = "/tmp/graft_test/stats_compact_src"
    val dest = "/tmp/graft_test/stats_compact_dest"
    Seq(src, dest).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val baseRows = 20000
    val base = spark.range(baseRows).select(col("id"), col("id").cast("double").as("v"))
    Publish.publish(spark, base, src, Nil, statsCols = Seq("v"))
    // append a tiny fragment batch
    val frag = spark.range(baseRows, baseRows + 50)
      .select(col("id"), col("id").cast("double").as("v"))
    Publish.publish(spark, frag, src, Nil, mode = "append", statsCols = Seq("v"))

    val threshold = 10L << 10 // 10 KB: the 50-row file is a fragment, base files are not
    val sizes = Publish.listDataFilesWithSize(spark, src)
    assert(sizes.exists(_._2 < threshold) && sizes.exists(_._2 >= threshold),
      s"setup must yield both fragments and healthy files: ${sizes.map(_._2)}")

    val ((copied, rewritten), read) = recordsReadDuring {
      Fetch.compactSmallFiles(spark, src, dest, smallBytesThreshold = threshold)
    }
    assert(copied > 0 && rewritten > 0)
    assert(read < baseRows / 2,
      s"compaction must not re-read healthy files for the index: read $read records")

    // the migrated sidecar is exactly what a from-scratch build produces
    def rows(root: String): Set[(String, String, Double, Double)] =
      StatsIndex.read(spark, root).get.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSet
    val migrated = rows(dest)
    StatsIndex.build(spark, dest, Seq("v"))
    assert(rows(dest) == migrated, "migrated index must equal a from-scratch rebuild")
    // and it prunes + serves exact results on the new root
    val got = Fetch.fetchIndexed(spark, dest,
      dataFilters = Seq(ColFilter("v", ">=", Seq(baseRows.toDouble)))).count()
    assert(got == 50)
  }

  test("string pruneExpr and mightMatchString decide identically (lockstep)") {
    val meta = DatasetMeta(StructType(Seq(StructField("s", StringType))), Nil)
    val rnd = new scala.util.Random(20260812L)
    val vocab = Seq("", "a", "ab", "abc", "b", "ba", "code", "web", "z")
    def v() = vocab(rnd.nextInt(vocab.size))
    val intervals = (0 until 100).map { i =>
      val (a, b) = (v(), v())
      (i, if (a <= b) a else b, if (a <= b) b else a)
    }
    val df = intervals.toDF("i", "min_s", "max_s")
      .withColumn("column", lit("s"))
      .withColumn("min_v", lit(null).cast("double"))
      .withColumn("max_v", lit(null).cast("double")).cache()
    val ops = Seq("==", "!=", ">", "<", ">=", "<=")
    val filters = (0 until 40).map { _ =>
      val op = ops(rnd.nextInt(ops.size))
      val nVals = if (op == "==" || op == "!=") 1 + rnd.nextInt(3) else 1
      ColFilter("s", op, Seq.fill(nVals)(v()))
    }
    filters.foreach { f =>
      val prunedIds = df.where(StatsIndex.pruneExpr(f, meta))
        .select("i").as[Int].collect().toSet
      intervals.foreach { case (i, lo, hi) =>
        val keepScalar = StatsIndex.mightMatchString(f, lo, hi)
        assert(prunedIds.contains(i) == !keepScalar,
          s"filter $f on [$lo,$hi]: scalar keep=$keepScalar, distributed prune=${prunedIds.contains(i)}")
      }
    }
    df.unpersist()
  }

  test("pruneExpr and mightMatch decide identically (distributed twin lockstep)") {
    val meta = DatasetMeta(StructType(Seq(StructField("v", DoubleType))), Nil)
    val rnd = new scala.util.Random(20260812L)
    val vals = Seq(-7.5, -2.0, -1.0, 0.0, 0.5, 1.0, 2.5, 3.0, 9.0, 42.0)
    def v() = vals(rnd.nextInt(vals.size))
    // one interval frame, reused for every filter
    val intervals = (0 until 120).map { i =>
      val (a, b) = (v(), v())
      (i, math.min(a, b), math.max(a, b))
    }
    val df = intervals.toDF("i", "min_v", "max_v").withColumn("column", lit("v")).cache()
    val ops = Seq("==", "!=", ">", "<", ">=", "<=")
    val filters = (0 until 40).map { _ =>
      val op = ops(rnd.nextInt(ops.size))
      val nVals = if (op == "==" || op == "!=") 1 + rnd.nextInt(3) else 1
      ColFilter("v", op, Seq.fill(nVals)(v()))
    }
    filters.foreach { f =>
      val prunedIds = df.where(StatsIndex.pruneExpr(f, meta))
        .select("i").as[Int].collect().toSet
      intervals.foreach { case (i, lo, hi) =>
        val keepScalar = StatsIndex.mightMatch(f, lo, hi, meta)
        assert(prunedIds.contains(i) == !keepScalar,
          s"filter $f on [$lo,$hi]: scalar keep=$keepScalar, distributed prune=${prunedIds.contains(i)}")
      }
    }
    df.unpersist()
  }
}
