package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Mutations, Publish, Versions}
import graft.plans.GraftSql

/** `replaceWhere` — partition/predicate-scoped logical overwrite in ONE
  * commit (Delta's replaceWhere / the INSERT OVERWRITE backfill idiom).
  * The reference can only clobber whole datasets or append
  * (publish_parq.py); this is the missing partition-granular middle.
  */
class ReplaceWhereSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshOrders(tag: String): String = {
    val root = TestSpark.tmpDir(tag)
    Publish.publishVersioned(spark,
      (0 until 300).map(i => (i.toLong, s"p${i % 3}", i * 10L)).toDF("k", "part", "v"),
      root, Seq("part"))
    root
  }

  private def liveFiles(root: String): Set[String] = {
    val latest = Versions.latestVersion(spark, root).get
    Versions.snapshotFullAt(spark, root, latest)._1.toSet
  }

  test("partition-scoped replace: one commit, untouched partitions' files don't move") {
    val root = freshOrders("rw_part")
    val before = liveFiles(root)
    val vBefore = Versions.latestVersion(spark, root).get
    val repl = (1000 until 1010).map(i => (i.toLong, "p1", -1L)).toDF("k", "part", "v")
    val (res, recordsRead) = IoMetrics.recordsReadDuring(spark) {
      Mutations.replaceWhere(spark, root, col("part") === "p1", repl)
    }
    assert(res.version == vBefore + 1, "exactly ONE commit")
    // the affected-file resolution is metadata-only: a partition-scoped
    // replace reads ZERO data rows from the dataset (the locate pass
    // parses hive paths from the commit log; survivors don't exist)
    assert(recordsRead == 0,
      s"partition-scoped replaceWhere must read no data rows, read $recordsRead")
    val after = liveFiles(root)
    val untouchedBefore = before.filterNot(_.contains("part=p1"))
    assert(untouchedBefore.subsetOf(after),
      "files of untouched partitions must keep their exact paths")
    assert((after -- untouchedBefore).forall(_.contains("part=p1")),
      "only the replaced partition gains files")
    val rows = Fetch.fetch(spark, root).select("k", "part", "v")
      .as[(Long, String, Long)].collect()
    assert(rows.count(_._2 == "p1") == 10 && rows.filter(_._2 == "p1").forall(_._3 == -1L))
    assert(rows.count(_._2 == "p0") == 100 && rows.count(_._2 == "p2") == 100)
    // history: the replaced partition's old rows remain time-travel readable
    val old = Versions.fetchVersion(spark, root, vBefore)
      .where(col("part") === "p1").count()
    assert(old == 100)
  }

  test("general-predicate replace rewrites survivors and keeps row ids") {
    val root = freshOrders("rw_pred")
    Versions.enableRowTracking(spark, root)
    Versions.compact(spark, root)
    val idsBefore = Versions.fetchSnapshotWithRowIds(spark, root)
      .select(col("k"), col(Versions.RowIdCol)).as[(Long, Long)].collect().toMap
    // replace the k%10==7 slice inside partition p1 only
    val pred = col("part") === "p1" && col("k") % 10 === 7
    val repl = Seq((7777L, "p1", 7L)).toDF("k", "part", "v")
      .where(col("part") === "p1" && col("k") % 10 === 7)
    Mutations.replaceWhere(spark, root, pred, repl)
    val after = Versions.fetchSnapshotWithRowIds(spark, root)
      .select(col("k"), col(Versions.RowIdCol)).as[(Long, Long)].collect().toMap
    // non-matching rows (survivors in rewritten files included) keep ids
    val kept = idsBefore.keySet.filter(k => !(k % 10 == 7 && k % 3 == 1))
    kept.foreach(k => assert(after(k) == idsBefore(k), s"row $k renumbered"))
    assert(after.contains(7777L) && !idsBefore.values.toSet.contains(after(7777L)),
      "the inserted row takes a fresh id")
    assert(after.keySet.filter(_ < 300).forall(k => !(k % 10 == 7 && k % 3 == 1)),
      "original matching rows are gone (the inserted 7777 matches by design)")
  }

  test("data not satisfying the predicate is rejected up front") {
    val root = freshOrders("rw_stray")
    val stray = Seq((1L, "p0", 0L), (2L, "p1", 0L)).toDF("k", "part", "v")
    val e = intercept[IllegalArgumentException] {
      Mutations.replaceWhere(spark, root, col("part") === "p1", stray)
    }
    assert(e.getMessage.contains("NOT matching"))
    // and nothing committed
    assert(Versions.latestVersion(spark, root).contains(1))
  }

  test("empty data = range delete; empty range + data = insert") {
    val root = freshOrders("rw_edges")
    // delete partition p2 wholesale
    Mutations.replaceWhere(spark, root, col("part") === "p2",
      Seq.empty[(Long, String, Long)].toDF("k", "part", "v"))
    assert(Fetch.fetch(spark, root).where(col("part") === "p2").count() == 0)
    // backfill a brand-new partition value: nothing removed, rows inserted
    val r = Mutations.replaceWhere(spark, root, col("part") === "p9",
      Seq((9000L, "p9", 1L)).toDF("k", "part", "v"))
    assert(r.removedFiles.isEmpty && r.addedFiles.nonEmpty)
    assert(Fetch.fetch(spark, root).where(col("part") === "p9").count() == 1)
  }

  test("SQL: INSERT INTO … REPLACE WHERE and INSERT OVERWRITE PARTITION") {
    val root = freshOrders("rw_sql")
    spark.range(5).select((col("id") + 2000).as("k"), lit("p1").as("part"),
      lit(-5L).as("v")).createOrReplaceTempView("rw_src")
    GraftSql.exec(spark,
      s"INSERT INTO graft.`$root` REPLACE WHERE part = 'p1' " +
        "SELECT k, part, v FROM rw_src").collect()
    val got = Fetch.fetch(spark, root).where(col("part") === "p1")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == (2000L until 2005L))
    // hive-style static-partition overwrite: SELECT supplies the
    // non-partition columns positionally
    spark.range(3).select((col("id") + 3000).as("k"), lit(9L).as("v"))
      .createOrReplaceTempView("rw_src2")
    GraftSql.exec(spark,
      s"INSERT OVERWRITE graft.`$root` PARTITION (part='p1') " +
        "SELECT k, v FROM rw_src2").collect()
    val got2 = Fetch.fetch(spark, root).where(col("part") === "p1")
      .select("k").as[Long].collect().sorted
    assert(got2.toSeq == (3000L until 3003L))
    // plain INSERT INTO appends
    GraftSql.exec(spark,
      s"INSERT INTO graft.`$root` SELECT 4000L AS k, 'p1' AS part, 0L AS v").collect()
    assert(Fetch.fetch(spark, root).where(col("k") === 4000L).count() == 1)
    // whole-dataset INSERT OVERWRITE
    GraftSql.exec(spark,
      s"INSERT OVERWRITE graft.`$root` SELECT 1L AS k, 'pX' AS part, 1L AS v").collect()
    assert(Fetch.fetch(spark, root).count() == 1)
  }

  test("freshly spec-evolved all-old-epoch snapshot: replace on the NEW derived column stays exact") {
    import graft.core.{DaysOf, MonthsOf, Transforms, Versions => V}
    val root = TestSpark.tmpDir("rw_evolved")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 03:00:00")
    val base = (0 until 60).map(i => (i.toLong, ts(i % 6 + 1), i * 1.0))
      .toDF("id", "ev_ts", "v")
    Publish.publishTransformed(spark, base, root,
      Seq(MonthsOf("ev_ts")), versioned = true)
    // metadata-only evolution: every live file still carries the OLD
    // (months) layout — the exact single-signature-but-stale state where
    // a path-resolved fast path would silently miss old-epoch rows
    V.evolvePartitionSpec(spark, root, Seq(DaysOf("ev_ts")))
    val day3 = java.sql.Date.valueOf("2024-01-03")
    val repl = Transforms.applyTo(
      (1000 until 1005).map(i => (i.toLong, ts(3), -1.0)).toDF("id", "ev_ts", "v"),
      Seq(DaysOf("ev_ts")))
    Mutations.replaceWhere(spark, root, col("tp_days_ev_ts") === lit(day3), repl)
    val got = Fetch.fetch(spark, root).select("id", "v")
      .as[(Long, Double)].collect()
    val day3Ids = got.filter(_._2 == -1.0).map(_._1).toSet
    assert(day3Ids == (1000L until 1005L).toSet, s"replacement present: $day3Ids")
    // the defect mode: old-epoch day-3 rows survive next to the
    // replacement (silent duplication). ids with i % 6 + 1 == 3 are day 3.
    val staleDay3 = got.map(_._1).filter(i => i < 60 && i % 6 == 2)
    assert(staleDay3.isEmpty,
      s"old-epoch rows of the replaced day must be gone, found ${staleDay3.toSeq}")
    assert(got.count(t => t._1 < 60) == 50, "untouched days keep all rows")
    assert(got.length == 55)
  }

  test("replaceWhere demands a versioned dataset and exact columns") {
    val root = TestSpark.tmpDir("rw_unversioned")
    Publish.publish(spark,
      Seq((1L, "a", 1L)).toDF("k", "part", "v"), root, Seq("part"))
    intercept[IllegalArgumentException] {
      Mutations.replaceWhere(spark, root, col("part") === "a",
        Seq((2L, "a", 2L)).toDF("k", "part", "v"))
    }
    val vroot = freshOrders("rw_cols")
    val bad = Seq((1L, "p1")).toDF("k", "part")
    val e = intercept[IllegalArgumentException] {
      Mutations.replaceWhere(spark, vroot, col("part") === "p1", bad)
    }
    assert(e.getMessage.contains("missing"))
  }
}
