package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Mutations, Publish, Versions}

/** Row tracking: stable `_graft_row_id`s assigned by the commit log
  * (per-file bases + the never-reused watermark), preserved across every
  * re-layout (rewrite mutations, OPTIMIZE, small-file packing, RESTORE)
  * by materializing the id column into rewritten files — the Delta
  * row-ID design. The no-user-keys handle for CDC mirrors.
  */
class RowTrackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Id = Versions.RowIdCol

  /** business key -> row id, the stability witness. */
  private def idsByKey(root: String): Map[Long, Long] =
    Versions.fetchSnapshotWithRowIds(spark, root)
      .select(col("k"), col(Id)).as[(Long, Long)].collect().toMap

  private def freshTracked(tag: String, n: Int = 100): String = {
    val root = TestSpark.tmpDir(tag)
    Publish.publishVersioned(spark,
      (0 until n).map(i => (i.toLong, s"g${i % 4}", i * 10L)).toDF("k", "grp", "v"),
      root, Seq("grp"))
    Versions.enableRowTracking(spark, root)
    Versions.compact(spark, root) // the documented backfill
    root
  }

  test("enable + backfill assigns a dense distinct id per row; appends extend") {
    val root = freshTracked("rt_basic")
    val withIds = Versions.fetchSnapshotWithRowIds(spark, root)
    assert(withIds.columns.contains(Id))
    val ids = withIds.select(Id).as[Long].collect().sorted
    assert(ids.length == 100 && ids.distinct.length == 100)
    // logical schema stays the user's: plain reads carry no id column
    assert(!graft.core.Fetch.fetch(spark, root).columns.contains(Id))
    val before = idsByKey(root)
    // an append gets fresh ids ABOVE the watermark; old rows untouched
    Publish.publishVersioned(spark,
      (100 until 120).map(i => (i.toLong, s"g${i % 4}", i * 10L)).toDF("k", "grp", "v"),
      root, Seq("grp"), mode = "append")
    val after = idsByKey(root)
    assert(before.forall { case (k, id) => after(k) == id },
      "existing rows' ids must not change on append")
    val newIds = after.filter(_._1 >= 100).values.toSet
    assert(newIds.size == 20 && newIds.forall(id => !before.values.toSet(id)),
      "appended rows need fresh, never-before-seen ids")
  }

  test("delete keeps survivors' ids; deleted ids never come back") {
    val root = freshTracked("rt_delete")
    val before = idsByKey(root)
    val deadIds = before.filter(_._1 % 10 == 3).values.toSet
    Mutations.deleteWhere(spark, root, col("k") % 10 === 3)
    val after = idsByKey(root)
    assert(after.keySet == before.keySet.filterNot(_ % 10 == 3))
    assert(after.forall { case (k, id) => before(k) == id },
      "survivors sharing a rewritten file must keep their ids")
    // a later append must not recycle the deleted ids
    Publish.publishVersioned(spark,
      Seq((500L, "g0", 0L)).toDF("k", "grp", "v"), root, Seq("grp"), mode = "append")
    assert(!deadIds.contains(idsByKey(root)(500L)))
  }

  test("update (rewrite and dv modes) preserves ids under new values") {
    for ((tag, dv) <- Seq(("rt_upd_rw", false), ("rt_upd_dv", true))) {
      val root = freshTracked(tag)
      val before = idsByKey(root)
      if (dv) Mutations.updateWhereDv(spark, root, col("k") < 10,
        Map("v" -> (col("v") + 1)))
      else Mutations.updateWhere(spark, root, col("k") < 10,
        Map("v" -> (col("v") + 1)))
      val got = Versions.fetchSnapshotWithRowIds(spark, root)
        .select(col("k"), col(Id), col("v")).as[(Long, Long, Long)].collect()
      assert(got.length == 100)
      got.foreach { case (k, id, v) =>
        assert(id == before(k), s"update ($tag) renumbered row $k")
        assert(v == (if (k < 10) k * 10 + 1 else k * 10))
      }
    }
  }

  test("merge keeps matched rows' ids, gives inserts fresh ones (both modes)") {
    for ((tag, dv) <- Seq(("rt_merge_rw", false), ("rt_merge_dv", true))) {
      val root = freshTracked(tag)
      val before = idsByKey(root)
      val src = Seq((5L, "g1", 999L), (200L, "g0", 123L)).toDF("k", "grp", "v")
      if (dv) Mutations.mergeDv(spark, root, src, Seq("k"))
      else Mutations.merge(spark, root, src, Seq("k"))
      val after = idsByKey(root)
      assert(after(5L) == before(5L), s"merge ($tag) must keep the matched row's id")
      assert(!before.values.toSet(after(200L)), s"merge ($tag) insert needs a fresh id")
      val v = Versions.fetchSnapshotWithRowIds(spark, root)
        .where(col("k") === 5).select("v").as[Long].head()
      assert(v == 999L)
    }
  }

  test("OPTIMIZE, small-file packing and RESTORE are id-stable") {
    val root = freshTracked("rt_layout")
    val before = idsByKey(root)
    Versions.compact(spark, root, zorderCols = Seq("k", "v")) // full re-layout
    assert(idsByKey(root) == before, "OPTIMIZE ZORDER renumbered rows")
    Publish.publishVersioned(spark, Seq((900L, "g0", 1L)).toDF("k", "grp", "v"),
      root, Seq("grp"), mode = "append")
    val withAppend = idsByKey(root)
    Versions.compactSmall(spark, root, smallBytes = 1L << 30) // pack everything small
    assert(idsByKey(root) == withAppend, "small-file packing renumbered rows")
    val vBefore = Versions.latestVersion(spark, root).get
    Mutations.deleteWhere(spark, root, col("k") === 0)
    Versions.restore(spark, root, vBefore)
    assert(idsByKey(root) == withAppend, "RESTORE must revive the original ids")
  }

  test("row ids survive a DV delete and consecutive mixed mutations") {
    val root = freshTracked("rt_mixed")
    val before = idsByKey(root)
    Mutations.deleteWhereDv(spark, root, col("k") % 7 === 0)
    Mutations.updateWhere(spark, root, col("k") === 8, Map("v" -> lit(0L)))
    Mutations.deleteWhere(spark, root, col("k") === 9)
    val after = idsByKey(root)
    val expectKeys = (0L until 100L).filterNot(k => k % 7 == 0 || k == 9).toSet
    assert(after.keySet == expectKeys)
    assert(after.forall { case (k, id) => before(k) == id })
  }

  test("guard rails: untracked read, pre-backfill read, clone drops tracking") {
    val root = TestSpark.tmpDir("rt_guards")
    Publish.publishVersioned(spark,
      (0 until 10).map(i => (i.toLong, "g", i.toLong)).toDF("k", "grp", "v"),
      root, Seq("grp"))
    val e1 = intercept[IllegalArgumentException](
      Versions.fetchSnapshotWithRowIds(spark, root))
    assert(e1.getMessage.contains("not enabled"))
    Versions.enableRowTracking(spark, root)
    // pre-backfill: live files predate enablement -> actionable refusal
    val e2 = intercept[IllegalArgumentException](
      Versions.fetchSnapshotWithRowIds(spark, root))
    assert(e2.getMessage.contains("OPTIMIZE"))
    Versions.compact(spark, root)
    assert(Versions.fetchSnapshotWithRowIds(spark, root).count() == 10)
    // a shallow clone starts a fresh identity: no watermark, plain reads fine
    val cloneRoot = TestSpark.tmpDir("rt_clone")
    Versions.clone(spark, root, cloneRoot)
    assert(!Versions.isRowTracked(spark, cloneRoot))
    assert(graft.core.Fetch.fetch(spark, cloneRoot).count() == 10)
  }

  test("racing optimistic appends claim disjoint id ranges (CAS-serialized)") {
    val root = freshTracked("rt_race", n = 40)
    val before = idsByKey(root)
    // 4 lock-free appenders race; the commit CAS serializes base
    // assignment, so every row — old and new — must end distinct
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        try {
          val batch = (0 until 25).map(i =>
            (1000L + t * 25 + i, s"g${i % 4}", 0L)).toDF("k", "grp", "v")
          Publish.publishVersioned(spark, batch, root, Seq("grp"), mode = "append")
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing appends failed: ${errs.peek()}")
    val after = idsByKey(root)
    assert(after.size == 140)
    assert(after.values.toSeq.distinct.size == 140,
      "overlapping id ranges: the CAS retry failed to re-seed bases")
    assert(before.forall { case (k, id) => after(k) == id })
  }

  test("SQL enablement: SET TBLPROPERTIES + OPTIMIZE backfills row ids") {
    val root = TestSpark.tmpDir("rt_sql")
    Publish.publishVersioned(spark,
      (0 until 20).map(i => (i.toLong, "g", i.toLong)).toDF("k", "grp", "v"),
      root, Seq("grp"))
    spark.sql(
      s"ALTER TABLE graft.`$root` SET TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql(s"OPTIMIZE graft.`$root`")
    assert(Versions.isRowTracked(spark, root))
    val ids = Versions.fetchSnapshotWithRowIds(spark, root)
      .select(col(Id)).as[Long].collect()
    assert(ids.length == 20 && ids.distinct.length == 20)
  }

  test("changeFeedById: minimal rewrite deltas with no user-key contract") {
    val root = freshTracked("rt_cfid")
    val backfill = Versions.latestVersion(spark, root).get
    Mutations.updateWhere(spark, root, col("k") === 3, Map("v" -> lit(777L)))
    val feed = Versions.changeFeedById(spark, root, backfill, backfill + 1)
    val rows = feed.select(col("k"), col("v"), col("_change_type"))
      .as[(Long, Long, String)].collect().toSet
    // the rewritten file held ~25 rows; survivors must NOT appear
    assert(rows == Set((3L, 30L, "delete"), (3L, 777L, "insert")),
      s"minimal by-id feed expected exactly the changed row's pair: $rows")
  }

  test("changeFeedById: fused and classic diff paths emit identical feeds") {
    // the adaptive bytes/row choice (r16) may pick either engine — pin
    // each via the prop and require byte-identical output
    val root = freshTracked("rt_cfid_ab")
    val backfill = Versions.latestVersion(spark, root).get
    Mutations.updateWhere(spark, root, col("k") % 7 === 3, Map("v" -> lit(-1L)))
    Mutations.deleteWhere(spark, root, col("k") === 11L)
    val latest = Versions.latestVersion(spark, root).get
    def run(pin: String): Set[(Long, Long, String, Int)] = {
      sys.props("graft.cdf.fuse") = pin
      try Versions.changeFeedById(spark, root, backfill, latest)
        .select(col("k"), col("v"), col("_change_type"), col("_commit_version"))
        .as[(Long, Long, String, Int)].collect().toSet
      finally sys.props.remove("graft.cdf.fuse")
    }
    val fused = run("always")
    val classic = run("never")
    assert(fused == classic, s"paths diverge: ${fused.diff(classic)} / ${classic.diff(fused)}")
    assert(fused.nonEmpty && fused.forall(r => r._1 % 7 == 3 || r._1 == 11L))
  }

  test("format('graft') batch changeFeed honors rowDiffById") {
    val root = freshTracked("rt_fmt_cfid")
    val backfill = Versions.latestVersion(spark, root).get
    Mutations.updateWhere(spark, root, col("k") === 4, Map("v" -> lit(555L)))
    val feed = spark.read.format("graft")
      .option("changeFeed", "true")
      .option("startingVersion", (backfill + 1).toString)
      .option("rowDiffById", "true")
      .load(root)
    val rows = feed.select(col("k"), col("v"), col("_change_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((4L, 40L, "delete"), (4L, 555L, "insert")),
      s"format CDF by-id must emit only the changed row's pair: $rows")
  }

  test("_graft_row_id is a reserved column name on user-facing publishes") {
    // r14 advice: a user frame carrying the internal id column used to be
    // written physically but silently stripped from the recorded schema —
    // the column then vanished from reads with no error. Reject loudly.
    val df = Seq((1L, "g0", 5L)).toDF("k", "grp", Id)
    val e1 = intercept[IllegalArgumentException] {
      Publish.publish(spark, df, TestSpark.tmpDir("rt_reserved1"), Seq("grp"))
    }
    assert(e1.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException] {
      Publish.publishVersioned(spark, df, TestSpark.tmpDir("rt_reserved2"), Seq("grp"))
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("tracked keys-only merge matches the untracked path's set semantics") {
    // r14 advice: the tracked keys-only branch kept pre-existing duplicate
    // target keys where the untracked branch's union+distinct collapsed
    // them — results depended on an orthogonal table property. Both paths
    // must now agree: duplicates collapse, and the tracked survivor keeps
    // the MIN id (stable under the change feed).
    val rows = Seq((1L, "g0"), (1L, "g0"), (2L, "g0"), (3L, "g1"))
      .toDF("k", "grp")
    val src = Seq((2L, "g0"), (9L, "g1")).toDF("k", "grp")
    def run(tracked: Boolean): Seq[(Long, String)] = {
      val root = TestSpark.tmpDir(s"rt_merge_keysonly_$tracked")
      Publish.publishVersioned(spark, rows, root, Seq("grp"))
      if (tracked) {
        Versions.enableRowTracking(spark, root)
        Versions.compact(spark, root)
      }
      Mutations.merge(spark, root, src, Seq("k", "grp"))
      graft.core.Fetch.fetch(spark, root).select(col("k"), col("grp"))
        .as[(Long, String)].collect().toSeq.sorted
    }
    val (t, u) = (run(tracked = true), run(tracked = false))
    assert(t == u, s"tracked=$t vs untracked=$u must agree")
    assert(t == Seq((1L, "g0"), (2L, "g0"), (3L, "g1"), (9L, "g1")))
  }

  test("mid-backfill mutation on covered files preserves ids (scoped coverage)") {
    // r14 advice: coverage was all-or-nothing — after enablement but
    // before full backfill, a delete touching ONLY covered files rewrote
    // them without materializing ids, silently renumbering. Coverage is
    // now per affected file.
    val root = TestSpark.tmpDir("rt_midbackfill")
    // v1: pre-tracking batch (file uncovered until the backfill)
    Publish.publishVersioned(spark,
      (0 until 50).map(i => (i.toLong, "old", i * 10L)).toDF("k", "grp", "v"),
      root, Seq("grp"))
    Versions.enableRowTracking(spark, root) // NO backfill yet
    // v3: appended batch — its files carry fresh bases [0, 20)
    Publish.publishVersioned(spark,
      (100 until 120).map(i => (i.toLong, "new", i * 10L)).toDF("k", "grp", "v"),
      root, Seq("grp"), mode = "append")
    // delete one row of the COVERED batch only (partition "new")
    Mutations.deleteWhere(spark, root, col("k") === 105L)
    // now backfill the pre-tracking file; covered survivors keep their ids
    Versions.compact(spark, root)
    val ids = idsByKey(root)
    val newBatch = ids.filter { case (k, _) => k >= 100 }
    assert(newBatch.size == 19 && newBatch.values.forall(_ < 20),
      s"covered-batch survivors must keep their original [0,20) ids: $newBatch")
    assert(ids.filter(_._1 < 50).values.forall(_ >= 20),
      "backfilled pre-tracking rows take fresh ids above the batch range")
  }

  test("watermark and bases ride the entry format; feature stamp gates readers") {
    val root = freshTracked("rt_entry")
    val latest = Versions.latestVersion(spark, root).get
    val e = Versions.readEntry(spark, root, latest)
    assert(e.rowIdHigh.exists(_ >= 100))
    assert(e.rowIds.nonEmpty, "the backfill overwrite must carry per-file bases")
    // time travel composes: ids AT an old version match what it had then
    val before = idsByKey(root)
    Mutations.updateWhere(spark, root, col("k") === 1, Map("v" -> lit(7L)))
    val old = Versions.fetchVersionWithRowIds(spark, root, latest)
      .select(col("k"), col(Id)).as[(Long, Long)].collect().toMap
    assert(old == before)
  }
}
