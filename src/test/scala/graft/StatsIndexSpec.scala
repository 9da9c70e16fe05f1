package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, DatasetMeta, Fetch, Mutations, Publish, StatsIndex}

/** File-level data-skipping: the index must (1) never change results,
  * (2) actually drop files when the layout clusters the filtered column,
  * (3) stay conservative for files it has never seen (append after build).
  */
class StatsIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val root = "/tmp/graft_test/stats_lineitem"

  private lazy val src = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  private def published: String = {
    // z-order on the two filtered columns + stats over them: 16 range
    // tasks -> 16 files, each a tight hyper-rectangle
    if (!new java.io.File(s"$root/${graft.core.DatasetMeta.FileName}").exists()) {
      Publish.publish(spark, src, root, Nil,
        zorderCols = Seq("l_extendedprice", "l_quantity"), zorderPartitions = 16,
        statsCols = Seq("l_extendedprice", "l_quantity"))
    }
    root
  }

  test("fetchIndexed equals the unindexed filter exactly") {
    val r = published
    val got = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("l_extendedprice", ">=", Seq(5000.0)),
        ColFilter("l_quantity", "<", Seq(10.0))))
    val want = src.where(col("l_extendedprice") >= 5000.0 && col("l_quantity") < 10.0)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("index prunes most files for a tight range on z-ordered data") {
    val r = published
    val meta = DatasetMeta.read(spark, r).get
    val all = Fetch.allFiles(spark, r)
    val tight = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("l_extendedprice", ">=", Seq(90000.0))))
    assert(all.size >= 8, s"layout should have many files, got ${all.size}")
    // ">= half skipped": the z-range boundaries come from RangePartitioner's
    // reservoir sample, whose seed shifts with RDD ids (i.e. with how many
    // jobs ran earlier in the JVM) — the strict "< half" form sat exactly on
    // the 8-of-16 boundary and flapped with unrelated suite ordering
    assert(tight.size <= all.size / 2,
      s"tight top-of-range filter should skip >=half the files: ${tight.size}/${all.size}")
    // and the pruned read still returns the exact rows
    val got = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("l_extendedprice", ">=", Seq(90000.0)))).count()
    val want = src.where(col("l_extendedprice") >= 90000.0).count()
    assert(got == want)
  }

  test("string stats skip files on equality filters (category pruning)") {
    val r = "/tmp/graft_test/stats_string"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    // three appends, one category each: every file's [min_s, max_s] is a
    // single category value
    Seq("books", "code", "web").zipWithIndex.foreach { case (src0, i) =>
      val batch = spark.range(i * 100, i * 100 + 100)
        .select(col("id"), lit(src0).as("src"), (col("id") * 2).cast("double").as("v"))
      Publish.publish(spark, batch, r, Nil,
        mode = if (i == 0) "overwrite" else "append", statsCols = Seq("src", "v"))
    }
    val meta = DatasetMeta.read(spark, r).get
    val all = Fetch.allFiles(spark, r)
    val hit = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("src", "==", Seq("code"))))
    assert(hit.nonEmpty && hit.size < all.size,
      s"equality on a category must skip other categories' files: ${hit.size}/${all.size}")
    val got = Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("src", "==", Seq("code"))))
    assert(got.count() == 100 && got.select(min("id"), max("id"))
      .as[(Long, Long)].head() == ((100L, 199L)))
    // != prunes exactly the single-constant matching files
    val ne = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("src", "!=", Seq("web"))))
    assert(ne.size < all.size, "constant web files must prune under !=")
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("src", "!=", Seq("web")))).count() == 200)
    // value-list (IN) equality keeps both named categories
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("src", "==", Seq("books", "web")))).count() == 200)
    // combined string + numeric filters prune multiplicatively and stay exact
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("src", "==", Seq("code")),
        ColFilter("v", ">=", Seq(250.0)))).count() == 75)
  }

  test("long string values truncate soundly: prefix min prunes, unknown max never skips") {
    val r = "/tmp/graft_test/stats_string_long"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val longB = "b" * 80 // past StringStatsMaxLen: min_s stores a prefix, max_s stores null
    val a = spark.range(50).select(col("id"), lit(longB).as("src"))
    val b = spark.range(50, 100).select(col("id"), lit("zz").as("src"))
    Publish.publish(spark, a, r, Nil, statsCols = Seq("src"))
    Publish.publish(spark, b, r, Nil, mode = "append", statsCols = Seq("src"))
    val meta = DatasetMeta.read(spark, r).get
    val all = Fetch.allFiles(spark, r)
    // a value below every file's min prefix prunes ALL files via lo alone
    assert(StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("src", "==", Seq("a")))).isEmpty)
    // the long value itself: its file CANNOT prune (max unknown -> no
    // false skip), the short-string file prunes via its exact bounds
    val hit = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("src", "==", Seq(longB))))
    assert(hit.nonEmpty && hit.size < all.size,
      s"long-value file must survive, zz file must prune: ${hit.size}/${all.size}")
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("src", "==", Seq(longB)))).count() == 50)
    // != on the truncated file never claims a constant-file proof
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("src", "!=", Seq(longB)))).count() == 50)
  }

  test("no-match filter yields empty frame with full schema") {
    val r = published
    val got = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("l_extendedprice", ">", Seq(1e12))))
    assert(got.isEmpty && got.columns.sameElements(src.columns))
  }

  test("files appended after the index build are always scanned") {
    val r = "/tmp/graft_test/stats_append"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    Publish.publish(spark, a, r, Nil, statsCols = Seq("v"))
    // append WITHOUT statsCols: the new file is unknown to the index
    val b = Seq((3L, 1000.0)).toDF("id", "v")
    Publish.publish(spark, b, r, Nil, mode = "append")
    val got = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("v", ">", Seq(500.0))))
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L), s"appended out-of-index row must be found, got $got")
  }

  test("manifest paths under escaped partition dirs resolve (timestamp partition)") {
    // hive-escaped dirs (`ts=… 19%3A27%3A57`) reach input_file_name
    // URI-encoded; the sidecar must store the DECODED on-disk form or
    // manifest-mode planning hands spark.read a nonexistent path
    val r = "/tmp/graft_test/stats_escaped_parts"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val df = spark.range(100).select(col("id"), (col("id") % 2).cast("double").as("v"),
      expr("timestamp'2020-09-15 19:27:57' + make_interval(0,0,0,0,0,0,cast(id % 3 as int))").as("ts"))
    Publish.publish(spark, df, r, Seq("ts"), statsCols = Seq("v"))
    assert(StatsIndex.manifestColumns(spark, r).isDefined)
    val got = Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("v", "==", Seq(1.0))))
    assert(got.count() == 50, "manifest-planned read must resolve escaped paths")
  }

  test("date and timestamp columns: index builds, string filter values work") {
    val r = "/tmp/graft_test/stats_temporal"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val df = spark.range(0, 100).select(
      col("id"),
      expr("date_add(date'2024-01-01', cast(id as int))").as("d"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id as int),0,0)").as("ts"))
    Publish.publish(spark, df, r, Nil, zorderCols = Seq("d"), statsCols = Seq("d", "ts"))
    // typed filter values
    val byDate = Fetch.fetchIndexed(spark, r, dataFilters =
      Seq(ColFilter("d", ">=", Seq(java.sql.Date.valueOf("2024-03-01"))))).count()
    assert(byDate == df.where(col("d") >= "2024-03-01").count())
    // string-form filter values (legal per checkValue) must not crash the
    // skip decision and must stay exact
    val byTsStr = Fetch.fetchIndexed(spark, r, dataFilters =
      Seq(ColFilter("ts", ">=", Seq("2024-01-03 00:00:00")))).count()
    assert(byTsStr == df.where(col("ts") >= "2024-01-03 00:00:00").count())
  }

  test("decimal columns: index prunes on ranges and stays exact (money columns)") {
    val r = "/tmp/graft_test/stats_decimal"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    val df = spark.range(1000).select(col("id"),
      (col("id").cast("decimal(10,0)") / 100).cast("decimal(12,2)").as("price"))
    Publish.publish(spark, df, r, Nil, sortCols = Seq("price"), statsCols = Seq("price"))
    val meta = DatasetMeta.read(spark, r).get
    val all = Fetch.allFiles(spark, r)
    val hit = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("price", ">=", Seq(BigDecimal("9.90")))))
    if (all.size > 1)
      assert(hit.size < all.size, s"decimal range should prune files: ${hit.size}/${all.size}")
    val got = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("price", ">=", Seq(BigDecimal("9.90")))))
    assert(got.count() == 10, "990..999 cents") // 9.90 .. 9.99
    // equality on a value doubles can't represent exactly
    val eq = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("price", "==", Seq(BigDecimal("0.10")))))
    assert(eq.count() == 1)
  }

  test("strict comparisons near the 2^53 double boundary never false-skip") {
    val meta = DatasetMeta(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))), Nil)
    val big = (1L << 53) // 2^53: x and x+1 collapse to the same double
    // file containing only big+1 (stats store it rounded to 2^53):
    // filter v > big matches the row, so the file must be kept
    val lo = (big + 1).toDouble
    assert(StatsIndex.mightMatch(ColFilter("v", ">", Seq(big)), lo, lo, meta))
    // constant file of big, filter != big+1: every row matches (big != big+1)
    // but both embed to the same double — must NOT skip
    assert(StatsIndex.mightMatch(
      ColFilter("v", "!=", Seq(big + 1)), big.toDouble, big.toDouble, meta))
  }

  test("data filters are validated: unknown and partition columns rejected") {
    val r = published
    intercept[IllegalArgumentException] {
      Fetch.fetchIndexed(spark, r, dataFilters = Seq(ColFilter("nope", "==", Seq(1))))
    }
    val rp = "/tmp/graft_test/stats_partitioned"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rp))
    Publish.publish(spark, Seq((1L, "a", 5.0)).toDF("id", "p", "v"), rp, Seq("p"))
    intercept[IllegalArgumentException] {
      Fetch.fetchIndexed(spark, rp, dataFilters = Seq(ColFilter("p", "==", Seq("a"))))
    }
  }

  test("decodePath: percent-escapes decode; raw '#'/'?' are literal path chars, not truncation points") {
    assert(StatsIndex.decodePath("file:/tmp/a%20b/part-0.parquet") == "/tmp/a b/part-0.parquet")
    assert(StatsIndex.decodePath("file:/tmp/c_ts=2021%3A01/x.parquet") == "/tmp/c_ts=2021:01/x.parquet")
    // pre-hardening, URI.getPath silently dropped everything from '#'/'?'
    // on — a foreign file named with them got a truncated sidecar path
    assert(StatsIndex.decodePath("file:/tmp/data/report#3.parquet") == "/tmp/data/report#3.parquet")
    assert(StatsIndex.decodePath("file:/tmp/data/what?.parquet") == "/tmp/data/what?.parquet")
    assert(StatsIndex.decodePath("file:/tmp/data/a#b?c%20d.parquet") == "/tmp/data/a#b?c d.parquet")
  }

  test("normPath Column expression agrees with decodePath (and stays codegen'd)") {
    // The sidecar build decodes input_file_name() with a Column expression,
    // not a Scala UDF — it must produce exactly decodePath's answer on
    // every tricky shape: percent escapes, raw '#'/'?', literal '+'
    // (form-decoding would turn it into a space), an authority component,
    // and a malformed escape (falls back to the undecoded form).
    val cases = Seq(
      "file:/tmp/a%20b/part-0.parquet",
      "file:/tmp/c_ts=2021%3A01/x.parquet",
      "file:/tmp/data/report#3.parquet",
      "file:/tmp/data/what?.parquet",
      "file:/tmp/data/a#b?c%20d.parquet",
      "file:/tmp/data/a+b.parquet",
      "file:///tmp/triple/slash.parquet",
      "hdfs://namenode:8020/warehouse/t/part-1.parquet",
      "/tmp/no/scheme.parquet")
    val got = cases.toDF("p")
      .select(StatsIndex.normPath(col("p")).as("n")).as[String].collect().toSeq
    assert(got == cases.map(StatsIndex.decodePath),
      s"column decode diverged from decodePath:\n${cases.zip(got).mkString("\n")}")
    // malformed escape: both paths degrade to the same undecoded form
    val bad = "file:/tmp/raw%zz.parquet"
    val gotBad = Seq(bad).toDF("p")
      .select(StatsIndex.normPath(col("p")).as("n")).as[String].head()
    assert(gotBad == StatsIndex.decodePath(bad) && gotBad == "/tmp/raw%zz.parquet")
  }

  test("a foreign file without stats rows blocks the marker restore (coverage check)") {
    // Simulates the LOST lock race on an object store: files land in the
    // dataset outside graft's write path, then an append tries to restore
    // the completeness claim. The claim must stay down (listing-mode reads
    // see everything) rather than silently dropping the foreign rows from
    // every future manifest-planned scan.
    val r = "/tmp/graft_test/stats_marker_coverage"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    Publish.publish(spark, spark.range(100).select(col("id"),
      col("id").cast("double").as("v")), r, Nil, statsCols = Seq("v"))
    assert(StatsIndex.manifestColumns(spark, r).contains(Seq("v")))
    // a foreign writer drops a data file in, bypassing graft entirely
    val first = new java.io.File(r).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val foreignRows = spark.read.parquet(first.getAbsolutePath).count()
    java.nio.file.Files.copy(first.toPath,
      new java.io.File(r, "part-zz-foreign.parquet").toPath)
    // graft append after the foreign write: stats cover only ITS new files
    Publish.publish(spark, spark.range(100, 200).select(col("id"),
      col("id").cast("double").as("v")), r, Nil, mode = "append")
    assert(StatsIndex.manifestColumns(spark, r).isEmpty,
      "marker must not be restored over a listing the sidecar doesn't cover")
    // conservative listing path still returns every row, foreign included
    assert(Fetch.fetch(spark, r).count() == 200 + foreignRows)
    // once the index is rebuilt over the full listing, the claim returns
    StatsIndex.build(spark, r, Seq("v"))
    assert(StatsIndex.manifestColumns(spark, r).contains(Seq("v")))
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("v", "<", Seq(10.0)))).count() ==
      Fetch.fetch(spark, r).where(col("v") < 10.0).count())
  }

  test("a direct StatsIndex.build racing a concurrent append serializes under the lock") {
    val r = "/tmp/graft_test/stats_build_race"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    Publish.publish(spark, spark.range(100).select(col("id"),
      col("id").cast("double").as("v")), r, Nil, statsCols = Seq("v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val start = new java.util.concurrent.CountDownLatch(1)
    val append = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        Publish.publish(spark, spark.range(1000, 1100).select(col("id"),
          col("id").cast("double").as("v")), r, Nil, mode = "append")
      }
    })
    val build = pool.submit(new Runnable {
      def run(): Unit = { start.await(); StatsIndex.build(spark, r, Seq("v")) }
    })
    start.countDown()
    append.get(120, java.util.concurrent.TimeUnit.SECONDS)
    build.get(120, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    // whichever order the lock granted, the surviving claim covers every
    // file: the appended rows are reachable through manifest-planned reads
    assert(StatsIndex.manifestColumns(spark, r).contains(Seq("v")))
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("v", ">=", Seq(1000.0)))).count() == 100)
    assert(Fetch.fetch(spark, r).count() == 200)
  }

  test("versioned datasets: stats index prunes, ghosts never resurrect, mutations stay exact") {
    import spark.implicits._
    val r = TestSpark.tmpDir("stats_versioned")
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
        .repartitionByRange(4, col("id"))
    Publish.publishVersioned(spark, batch(0, 4000), r, Nil, statsCols = Seq("id"))
    Publish.publishVersioned(spark, batch(4000, 8000), r, Nil,
      mode = "append", statsCols = Seq("id"))
    val meta = graft.core.DatasetMeta.read(spark, r).get
    val all = Publish.listDataFiles(spark, r)
    val cand = StatsIndex.candidateFiles(spark, r, meta,
      Seq(ColFilter("id", "<", Seq(1000L))))
    assert(cand.size < all.size, s"index should skip files: ${cand.size} vs ${all.size}")
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("id", "<", Seq(1000L)))).count() == 1000)
    // logical overwrite: stats rows for v1/v2 files remain, but planning
    // is version-log-aware so the ghosts never come back
    Publish.publishVersioned(spark, batch(100000, 101000), r, Nil, statsCols = Seq("id"))
    val after = Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("id", ">=", Seq(0L))))
    assert(after.count() == 1000)
    assert(after.agg(min("id")).head().getLong(0) == 100000L)
    // row-level delete: the rewrite appends stats rows for its new
    // files, so the index keeps covering (and pruning) the live snapshot
    Mutations.deleteWhere(spark, r, col("id") % 2 === 0)
    assert(Fetch.fetchIndexed(spark, r,
      dataFilters = Seq(ColFilter("id", ">=", Seq(0L)))).count() == 500)
    val live = Publish.listDataFiles(spark, r)
    val stats = StatsIndex.read(spark, r).get
    val covered = stats.select("file").distinct().collect().map(_.getString(0)).toSet
    assert(live.forall(covered), "every live file (incl. the rewrite's) must have stats rows")
  }

  test("statsMinMax answers from the sidecar: exact values, zero data rows read") {
    import spark.implicits._
    val r = TestSpark.tmpDir("stats_minmax")
    val rows = (0 until 5000).map(i => (i.toLong, (i * 37 % 1000) / 4.0))
    Publish.publish(spark, rows.toDF("id", "v").repartitionByRange(6, col("id")),
      r, Nil, statsCols = Seq("id", "v"))
    val meta = DatasetMeta.read(spark, r).get
    val nData = spark.read.schema(meta.schema).parquet(r).count() // warm nothing; sanity
    assert(nData == 5000)
    val ((idR, vR), recs) = IoMetrics.recordsReadDuring(spark) {
      (StatsIndex.statsMinMax(spark, r, "id").get,
        StatsIndex.statsMinMax(spark, r, "v").get)
    }
    assert(idR == ((0L, 4999L)))
    assert(vR == ((0.0, 999.0 / 4.0)))
    // only sidecar rows ride: 6 files x 2 columns = 12 stats rows per call
    assert(recs <= 50, s"metadata-only answer read $recs records")
    // refuses when it cannot be exact: unknown column, string column
    assert(StatsIndex.statsMinMax(spark, r, "nope").isEmpty)
    val r2 = TestSpark.tmpDir("stats_minmax_str")
    Publish.publish(spark, Seq((1L, "aa")).toDF("id", "s"), r2, Nil, statsCols = Seq("s"))
    assert(StatsIndex.statsMinMax(spark, r2, "s").isEmpty)
  }

  test("statsMinMax on a versioned root excludes ghost files (overwrite + delete)") {
    import spark.implicits._
    val r = TestSpark.tmpDir("stats_minmax_versioned")
    // v1 carries the extreme id=99999 — then a logical OVERWRITE replaces
    // the dataset with a narrower range. The v1 files stay on disk for
    // time travel and their sidecar rows stay too (planning is log-aware);
    // a min/max over ALL sidecar rows would resurrect the ghost extreme.
    Publish.publishVersioned(spark,
      (0 until 1000).map(i => (i.toLong * 100, i.toDouble)).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      r, Nil, statsCols = Seq("id"))
    assert(StatsIndex.statsMinMax(spark, r, "id").contains((0L, 99900L)))
    Publish.publishVersioned(spark,
      (0 until 500).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      r, Nil, statsCols = Seq("id"))
    assert(StatsIndex.statsMinMax(spark, r, "id").contains((0L, 499L)),
      "overwritten v1 ghost extreme must not surface")
    // row-level DELETE shrinks the live max again: the removed file's
    // sidecar rows remain but must not contribute
    Mutations.deleteWhere(spark, r, col("id") >= 400)
    assert(StatsIndex.statsMinMax(spark, r, "id").contains((0L, 399L)),
      "deleted rows' ghost extreme must not surface")
    // sanity: the answer matches a real scan of the live snapshot
    val scanned = Fetch.fetch(spark, r).agg(min("id"), max("id")).head()
    assert((scanned.getLong(0), scanned.getLong(1)) == ((0L, 399L)))
  }

  test("statsCount family answers from the sidecar: exact, zero data rows read") {
    import spark.implicits._
    val r = TestSpark.tmpDir("stats_count")
    // nulls in v: COUNT(v) must be the non-null count, not n_rows
    val rows = (0 until 5000).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some(i / 4.0), s"g${i % 3}"))
    Publish.publish(spark, rows.toDF("id", "v", "grp")
      .repartitionByRange(5, col("id")), r, Seq("grp"), statsCols = Seq("id", "v"))
    val ((n, nv, byPart), recs) = IoMetrics.recordsReadDuring(spark) {
      (StatsIndex.statsCount(spark, r).get,
        StatsIndex.statsCountCol(spark, r, "v").get,
        StatsIndex.statsCountByPartition(spark, r).get.collect())
    }
    assert(n == 5000L)
    assert(nv == 5000L - rows.count(_._2.isEmpty))
    assert(byPart.map(row => row.getString(0) -> row.getLong(1)).toMap ==
      Map("g0" -> 1667L, "g1" -> 1667L, "g2" -> 1666L))
    assert(recs <= 200, s"metadata-only counts read $recs records")
    // refusals: column the marker does not cover; unpartitioned by-partition
    assert(StatsIndex.statsCountCol(spark, r, "grp").isEmpty)
    val r2 = TestSpark.tmpDir("stats_count_flat")
    Publish.publish(spark, Seq((1L, 2.0)).toDF("id", "v"), r2, Nil,
      statsCols = Seq("id"))
    assert(StatsIndex.statsCountByPartition(spark, r2).isEmpty)
  }

  test("statsCount: versioned ghosts excluded, escaped partition values decode") {
    import spark.implicits._
    val r = TestSpark.tmpDir("stats_count_versioned")
    Publish.publishVersioned(spark,
      (0 until 1000).map(i => (i.toLong, s"d ${i % 2}")).toDF("id", "d")
        .repartitionByRange(4, col("id")),
      r, Seq("d"), statsCols = Seq("id"))
    assert(StatsIndex.statsCount(spark, r).contains(1000L))
    // logical overwrite shrinks the dataset: v1's sidecar rows remain but
    // must not inflate the metadata-only count
    Publish.publishVersioned(spark,
      (0 until 300).map(i => (i.toLong, s"d ${i % 2}")).toDF("id", "d")
        .repartitionByRange(2, col("id")),
      r, Seq("d"), statsCols = Seq("id"))
    assert(StatsIndex.statsCount(spark, r).contains(300L))
    // row-level DELETE: rewrite commits swap files, count follows the live set
    Mutations.deleteWhere(spark, r, col("id") >= 200)
    assert(StatsIndex.statsCount(spark, r).contains(200L))
    // per-partition counts on hive values with a space ('d 0'/'d 1'):
    // the path-segment decode must recover the escaped value exactly
    val byPart = StatsIndex.statsCountByPartition(spark, r).get.collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(byPart == Map("d 0" -> 100L, "d 1" -> 100L))
  }

  test("statsCountByPartition maps the hive null sentinel back to NULL") {
    import spark.implicits._
    // string partition: the __HIVE_DEFAULT_PARTITION__ directory must
    // surface as the NULL group (GROUP BY semantics), not as the sentinel
    // string literal
    val r = TestSpark.tmpDir("stats_count_null_part")
    Publish.publish(spark,
      ((0 until 40).map(i => (i.toLong, Some(s"g${i % 2}"))) ++
        (100 until 110).map(i => (i.toLong, Option.empty[String])))
        .toDF("id", "grp"), r, Seq("grp"), statsCols = Seq("id"))
    val byPart = StatsIndex.statsCountByPartition(spark, r).get.collect()
      .map(row => Option(row.getString(0)) -> row.getLong(1)).toMap
    assert(byPart == Map(Some("g0") -> 20L, Some("g1") -> 20L, None -> 10L))
    // int partition: the sentinel must not throw under ANSI casting
    val r2 = TestSpark.tmpDir("stats_count_null_part_int")
    Publish.publish(spark,
      ((0 until 6).map(i => (i.toLong, Some(i % 3))) ++
        Seq((100L, Option.empty[Int]))).toDF("id", "bucket"),
      r2, Seq("bucket"), statsCols = Seq("id"))
    val byInt = StatsIndex.statsCountByPartition(spark, r2).get.collect()
      .map(row => (if (row.isNullAt(0)) None else Some(row.getInt(0))) -> row.getLong(1))
      .toMap
    assert(byInt == Map(Some(0) -> 2L, Some(1) -> 2L, Some(2) -> 2L, None -> 1L))
  }

  test("statsCount refuses on a pre-n_rows sidecar instead of guessing") {
    import spark.implicits._
    val r = TestSpark.tmpDir("stats_count_legacy")
    Publish.publish(spark, (0 until 100).map(i => (i.toLong, i / 2.0))
      .toDF("id", "v"), r, Nil, statsCols = Seq("id"))
    // simulate a sidecar written before the n_rows/n_nulls embedding by
    // rewriting it without those columns (same rows otherwise)
    val legacy = StatsIndex.read(spark, r).get
      .drop("n_rows", "n_nulls").collect()
    val dir = new java.io.File(s"$r/${StatsIndex.DirName}")
    val schema = StatsIndex.read(spark, r).get.drop("n_rows", "n_nulls").schema
    val legacyDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(legacy: _*)),
      schema)
    val tmp = TestSpark.tmpDir("stats_count_legacy_rewrite")
    legacyDf.coalesce(1).write.mode("overwrite").parquet(tmp)
    org.apache.commons.io.FileUtils.cleanDirectory(dir)
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(tmp), dir)
    StatsIndex.writeMarker(spark, r, Seq("id")) // cleanDirectory ate the marker
    // min/max still answers (bounds survive); counts refuse
    assert(StatsIndex.statsMinMax(spark, r, "id").contains((0L, 99L)))
    assert(StatsIndex.statsCount(spark, r).isEmpty)
    assert(StatsIndex.statsCountCol(spark, r, "id").isEmpty)
  }
}
