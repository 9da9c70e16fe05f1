package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Publish, Versions}

/** `format("graft")`: reader/writer/DDL/streaming through Spark's standard
  * data-source surface.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = (0 until 400)
    .map(i => (i.toLong, s"g${i % 4}", i * 1.5)).toDF("id", "grp", "v")

  test("read: latest snapshot, versionAsOf time travel, short name resolves") {
    val root = TestSpark.tmpDir("dsv_read")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    Publish.publishVersioned(spark, sample.where(col("id") < 100), root, Seq("grp"))
    val live = spark.read.format("graft").load(root)
    assert(live.count() == 100)
    assert(live.schema.fieldNames.sorted.toSeq == Seq("grp", "id", "v"))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(root)
    assert(v1.count() == 400)
    // unversioned datasets read the same way
    val flat = TestSpark.tmpDir("dsv_read_flat")
    Publish.publish(spark, sample, flat, Seq("grp"))
    assert(spark.read.format("graft").load(flat).count() == 400)
  }

  test("read: partition filters prune through the pushed-down scan") {
    val root = TestSpark.tmpDir("dsv_prune")
    Publish.publish(spark, sample, root, Seq("grp"))
    val (rows, recs) = IoMetrics.recordsReadDuring(spark) {
      spark.read.format("graft").load(root)
        .where(col("grp") === "g1").select("id").collect()
    }
    assert(rows.length == 100)
    assert(recs <= 110, s"partition-filtered read scanned $recs records (expected ~100)")
    // data-column filters and pruned projections stay correct
    val narrow = spark.read.format("graft").load(root)
      .where(col("id") >= 390).select("v").as[Double].collect().sorted.toSeq
    assert(narrow == (390 until 400).map(_ * 1.5))
  }

  test("write: SaveMode mapping, versioned option, round-trip") {
    val root = TestSpark.tmpDir("dsv_write")
    sample.write.format("graft").option("partitions", "grp").save(root)
    assert(Fetch.fetch(spark, root).count() == 400)
    // default SaveMode is ErrorIfExists
    intercept[IllegalArgumentException] {
      sample.write.format("graft").option("partitions", "grp").save(root)
    }
    sample.write.format("graft").option("partitions", "grp")
      .mode(SaveMode.Append).save(root)
    assert(Fetch.fetch(spark, root).count() == 800)
    sample.write.format("graft").option("partitions", "grp")
      .mode(SaveMode.Overwrite).save(root)
    assert(Fetch.fetch(spark, root).count() == 400)
    // versioned=true writes through the commit log
    val vroot = TestSpark.tmpDir("dsv_write_versioned")
    sample.write.format("graft").option("versioned", "true").save(vroot)
    sample.write.format("graft").mode(SaveMode.Append).save(vroot)
    assert(Versions.latestVersion(spark, vroot).contains(2))
    assert(spark.read.format("graft").load(vroot).count() == 800)
  }

  test("V2 seam: format reads resolve through DataSourceV2Relation") {
    val root = TestSpark.tmpDir("dsv_v2resolve")
    Publish.publish(spark, sample, root, Seq("grp"))
    val df = spark.read.format("graft").load(root)
    // the analyzed plan must be the V2 relation over GraftTable — not a
    // silent V1 fallback (which would make every assertion below vacuous)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("RelationV2"),
      s"expected a DataSourceV2 relation, got:\n$analyzed")
    // V2 filter pushdown reports the translated predicate on the scan
    val pushed = df.where(col("grp") === "g1")
    pushed.collect()
    val optimized = pushed.queryExecution.optimizedPlan.toString
    assert(optimized.contains("grp"), optimized)
  }

  test("V2 seam: records-read parity with native Fetch.fetch") {
    val root = TestSpark.tmpDir("dsv_parity")
    Publish.publish(spark, sample, root, Seq("grp"))
    val (nativeRows, nativeRecs) = IoMetrics.recordsReadDuring(spark) {
      Fetch.fetch(spark, root,
        Seq(graft.core.ColFilter("grp", "==", Seq("g2")))).collect()
    }
    val (v2Rows, v2Recs) = IoMetrics.recordsReadDuring(spark) {
      spark.read.format("graft").load(root).where(col("grp") === "g2").collect()
    }
    assert(v2Rows.map(_.toString).sorted.toSeq ==
      nativeRows.map(_.toString).sorted.toSeq)
    // same partition pruning, same parquet scan underneath: identical
    // records read — the format path may not scan a single row more
    assert(v2Recs == nativeRecs,
      s"format path read $v2Recs records, native fetch read $nativeRecs")
  }

  test("name-registered managed table: saveAsTable / spark.table / INSERT") {
    spark.sql("DROP TABLE IF EXISTS graft_managed")
    sample.write.format("graft").option("partitions", "grp")
      .saveAsTable("graft_managed")
    try {
      // resolved BY NAME through the session catalog (no path option)
      val t = spark.table("graft_managed")
      assert(t.count() == 400)
      assert(t.queryExecution.analyzed.toString.contains("RelationV2"))
      assert(spark.sql("SELECT sum(v) FROM graft_managed WHERE grp = 'g3'")
        .head().getDouble(0) == (0 until 400).filter(_ % 4 == 3).map(_ * 1.5).sum)
      spark.sql(
        "INSERT INTO graft_managed SELECT id + 5000, grp, v FROM graft_managed WHERE id < 20")
      assert(spark.table("graft_managed").count() == 420)
      // the managed location is a REAL graft dataset (sidecar intact):
      // the native API reads it back identically
      val loc = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_managed"))
        .location.getPath
      assert(Fetch.fetch(spark, loc).count() == 420)
    } finally spark.sql("DROP TABLE IF EXISTS graft_managed")
  }

  test("CREATE TABLE USING graft + INSERT INTO / INSERT OVERWRITE") {
    val root = TestSpark.tmpDir("dsv_table")
    Publish.publish(spark, sample, root, Seq("grp"))
    spark.sql(s"CREATE TABLE graft_t USING graft OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_t").head().getLong(0) == 400)
      assert(spark.sql("SELECT sum(v) FROM graft_t WHERE grp = 'g2'").head().getDouble(0) ==
        (0 until 400).filter(_ % 4 == 2).map(_ * 1.5).sum)
      spark.sql("INSERT INTO graft_t SELECT id + 1000, grp, v FROM graft_t WHERE id < 50")
      assert(spark.sql("SELECT count(*) FROM graft_t").head().getLong(0) == 450)
      // the insert went through graft's publish: sidecar metadata intact
      assert(Fetch.fetch(spark, root).count() == 450)
      spark.sql("INSERT OVERWRITE graft_t SELECT id, grp, v FROM graft_t WHERE id < 10")
      assert(spark.sql("SELECT count(*) FROM graft_t").head().getLong(0) == 10)
      // schema-mismatched inserts are rejected, not silently coerced
      intercept[Exception] {
        spark.sql("INSERT INTO graft_t SELECT 1, 2")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_t")
  }

  test("streaming sink: one version per micro-batch, exactly-once on replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val root = TestSpark.tmpDir("dsv_sink")
    val ckpt = TestSpark.tmpDir("dsv_sink_ckpt")
    val input = MemoryStream[(Long, String, Double)]
    val q = input.toDF().toDF("id", "grp", "v")
      .writeStream.format("graft")
      .option("partitions", "grp")
      .option("checkpointLocation", ckpt)
      .start(root)
    try {
      input.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      input.addData((3L, "a", 3.0))
      q.processAllAvailable()
      assert(Versions.latestVersion(spark, root).contains(2),
        "each non-empty micro-batch must commit exactly one version")
      assert(spark.read.format("graft").load(root).count() == 3)
      // every commit carries its txn stamp
      val entries = (1 to 2).map(Versions.readEntry(spark, root, _))
      assert(entries.forall(_.txn.exists(_._2 >= 0)))
      val appId = entries.head.txn.get._1
      // exactly-once: a replayed batchId is recognized FROM THE LOG by a
      // fresh sink instance (crash-between-commit-and-checkpoint shape)
      val sink = new graft.sources.GraftSink(spark, root, Seq("grp"), appId)
      val replay = Seq((9L, "a", 9.0)).toDF("id", "grp", "v")
      sink.addBatch(1, replay) // already committed under this appId
      assert(spark.read.format("graft").load(root).count() == 3,
        "replayed batch must not double-append")
      sink.addBatch(99, replay) // genuinely new batch commits
      assert(spark.read.format("graft").load(root).count() == 4)
      assert(Versions.lastTxnBatch(spark, root, appId).contains(99L))
    } finally q.stop()
  }

  test("streaming CDC source: one batch per commit range, restart resumes") {
    val root = TestSpark.tmpDir("dsv_cdc")
    val ckpt = TestSpark.tmpDir("dsv_cdc_ckpt")
    Publish.publishVersioned(spark, sample.where(col("id") < 10), root, Nil)
    Publish.publishVersioned(spark, sample.where(col("id") >= 10 && col("id") < 15),
      root, Nil, mode = "append")
    val out = TestSpark.tmpDir("dsv_cdc_out")
    def drain(): Unit = {
      // a fault-tolerant sink (parquet), so the restart path exercises the
      // checkpointed version offset for real
      val q = spark.readStream.format("graft").load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    drain()
    val first = spark.read.parquet(out)
      .select("id", "_commit_version").as[(Long, Int)].collect().toSeq
    assert(first.map(_._1).sorted == (0L until 15L))
    assert(first.toMap.view.filterKeys(_ < 10).values.toSet == Set(1))
    assert(first.toMap.view.filterKeys(_ >= 10).values.toSet == Set(2))
    // new commits while the stream is down; restart from the checkpoint
    // delivers ONLY the new versions
    Publish.publishVersioned(spark, sample.where(col("id") >= 15 && col("id") < 18),
      root, Nil, mode = "append")
    drain()
    val second = spark.read.parquet(out)
      .select("id", "_commit_version").as[(Long, Int)].collect().toSeq
    assert(second.map(_._1).sorted == (0L until 18L), s"restart replayed: $second")
    assert(second.count(_._2 == 3) == 3,
      s"exactly the new commit's rows must arrive after restart: $second")
    // an unversioned root is refused up front
    val flat = TestSpark.tmpDir("dsv_cdc_flat")
    Publish.publish(spark, sample, flat, Nil)
    val e = intercept[Exception] {
      spark.readStream.format("graft").load(flat)
    }
    assert(e.getMessage.contains("VERSIONED") || e.getMessage.contains("commit log"))
  }

  test("maxVersionsPerTrigger caps catch-up batches, converges, survives restart") {
    val root = TestSpark.tmpDir("dsv_cdc_rate")
    val ckpt = TestSpark.tmpDir("dsv_cdc_rate_ckpt")
    // a 6-commit backlog before the stream ever starts
    Publish.publishVersioned(spark, sample.where(col("id") < 5), root, Nil)
    (1 until 6).foreach(i => Publish.publishVersioned(spark,
      sample.where(col("id") >= i * 5 && col("id") < (i + 1) * 5),
      root, Nil, mode = "append"))
    val out = TestSpark.tmpDir("dsv_cdc_rate_out")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "2").load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    drain()
    val got = spark.read.parquet(out)
      .select("id", "_commit_version").as[(Long, Int)].collect().toSeq
    // the whole backlog arrives (rate limiting bounds batches, loses nothing)
    assert(got.map(_._1).sorted == (0L until 30L), s"got $got")
    // no single micro-batch spanned more than 2 commits: with cap 2 over
    // 6 versions, each version's rows landed in a batch of <=2 versions —
    // verified via the sink's per-batch files? simpler: the offset log
    // recorded >=3 batches
    val offsets = new java.io.File(ckpt, "offsets").list()
    assert(offsets != null && offsets.length >= 3,
      s"expected >=3 rate-limited batches, got ${offsets.mkString(",")}")
    // restart with new commits: resumes from the checkpoint, still capped
    Publish.publishVersioned(spark,
      sample.where(col("id") >= 30 && col("id") < 33), root, Nil, mode = "append")
    drain()
    assert(spark.read.parquet(out).count() == 33)
  }

  test("streaming CDC source in changeFeed mode: row-level deletes arrive") {
    import graft.core.Mutations
    val root = TestSpark.tmpDir("dsv_cdc_cf")
    val ckpt = TestSpark.tmpDir("dsv_cdc_cf_ckpt")
    Publish.publishVersioned(spark, sample.where(col("id") < 10), root, Nil)
    val out = TestSpark.tmpDir("dsv_cdc_cf_out")
    def drain(): Unit = {
      val q = spark.readStream.format("graft").option("changeFeed", "true")
        .load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    drain()
    // new commits while the stream is down: an append + a DV delete
    Publish.publishVersioned(spark, sample.where(col("id") >= 10 && col("id") < 13),
      root, Nil, mode = "append")                                    // v2
    Mutations.deleteWhereDv(spark, root, col("id") === 4)            // v3
    Mutations.updateWhereDv(spark, root, col("id") === 11,
      Map("v" -> lit(-11.0)))                                        // v4
    drain()
    val got = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSeq
    assert(got.filter(_._3 == 1).map(_._1).sorted == (0L until 10L))
    assert(got.filter(_._3 == 1).forall(_._2 == "insert"))
    assert(got.filter(_._3 == 2).map(_._1).sorted == (10L until 13L))
    assert(got.filter(_._3 == 3) == Seq((4L, "delete", 3)))
    assert(got.filter(_._3 == 4).sorted ==
      Seq((11L, "delete", 4), (11L, "insert", 4)))
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered metadata-only, zero records read") {
    val root = TestSpark.tmpDir("dsv_aggpush")
    // stats manifest via statsCols publish (the completeness marker)
    Publish.publish(spark, sample, root, Nil, statsCols = Seq("id", "v"))
    val df = spark.read.format("graft").load(root)
    val (rows, recs) = IoMetrics.recordsReadDuring(spark) {
      df.agg(count(lit(1)), count(col("v")), min(col("id")), max(col("id")),
        min(col("v")), max(col("v"))).collect()
    }
    // the records metric counts the MANIFEST sidecar rows the answer is
    // computed from (files x columns, here a few dozen) — the point is the
    // 400-row data table itself is never scanned
    assert(recs < 100L, s"aggregate pushdown must read only the manifest, read $recs")
    val r = rows.head
    assert(r.getLong(0) == 400L && r.getLong(1) == 400L)
    assert(r.getLong(2) == 0L && r.getLong(3) == 399L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 399 * 1.5)
    // plan carries no parquet scan for the pushed aggregation
    val plan = df.agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(!plan.contains("Parquet"), s"pushed-agg plan still scans parquet:\n$plan")
  }

  test("aggregate pushdown: DV-covered snapshots subtract, filters fall back exact") {
    val root = TestSpark.tmpDir("dsv_aggpush_dv")
    Publish.publishVersioned(spark, sample, root, Nil, statsCols = Seq("id"))
    graft.core.Mutations.deleteWhereDv(spark, root, col("id") % 10 === 0)
    val df = spark.read.format("graft").load(root)
    val (rows, recs) = IoMetrics.recordsReadDuring(spark) {
      df.agg(count(lit(1))).collect()
    }
    assert(rows.head.getLong(0) == 360L, "count subtracts live DV cardinality")
    // manifest rows + the O(deleted rows) DV sidecar — never the data
    assert(recs < 100L, s"DV-covered count still metadata-only, read $recs")
    // a WHERE makes the count a subset question: falls back to the scan,
    // stays exact
    // deleted ids are multiples of 10 — all even, split between g0
    // (i%20==0, 20 ids) and g2 (i%20==10, 20 ids); g1 keeps all 100
    assert(df.where(col("grp") === "g1").agg(count(lit(1)))
      .collect().head.getLong(0) == 100L)
    assert(df.where(col("grp") === "g0").agg(count(lit(1)))
      .collect().head.getLong(0) == 80L)
    // unsupported shapes (grouping, avg, distinct) fall back too
    assert(df.groupBy("grp").count().collect().map(_.getLong(1)).sum == 360L)
    assert(df.agg(countDistinct(col("grp"))).collect().head.getLong(0) == 4L)
  }
}
