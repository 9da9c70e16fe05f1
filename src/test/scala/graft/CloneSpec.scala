package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, Fetch, Mutations, Publish, Versions}
import graft.plans.GraftSql

/** Shallow clone: a metadata-only commit referencing the source snapshot's
  * files in place. The clone reads identically to the cloned snapshot,
  * evolves independently (append/mutate/OPTIMIZE never touch the source),
  * carries the source's deletion vectors and column mapping, and its
  * vacuum can only ever delete its own files.
  */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def physicalFiles(root: String): Set[String] =
    Publish.listPhysicalDataFilesWithSize(spark, root).map(_._1).toSet

  private def freshSrc(name: String, n: Int = 100): String = {
    val root = TestSpark.tmpDir(name)
    Publish.publishVersioned(spark,
      (0 until n).map(i => (i.toLong, s"g${i % 4}", i * 1.0)).toDF("id", "grp", "v"),
      root, Seq("grp"))
    root
  }

  test("clone reads the source snapshot exactly; zero data files copied") {
    val src = freshSrc("clone_src_basic")
    Publish.publishVersioned(spark,
      (100 until 150).map(i => (i.toLong, s"g${i % 4}", i * 1.0)).toDF("id", "grp", "v"),
      src, Seq("grp"), mode = "append")
    val dst = TestSpark.tmpDir("clone_dst_basic")
    val v = Versions.clone(spark, src, dst)
    assert(v == 1)
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 150L))
    // metadata-only: the clone root holds no data parquet of its own
    assert(physicalFiles(dst).isEmpty)
    val entry = Versions.readEntry(spark, dst, 1)
    assert(entry.action == "clone")
    assert(entry.added.nonEmpty && entry.added.forall(_.startsWith("/")),
      "inherited refs are absolute external paths")
    // partition filters prune & match on inherited files
    assert(ids(Fetch.fetch(spark, dst, Seq(ColFilter("grp", "==", Seq("g1")))))
      == (0L until 150L).filter(_ % 4 == 1))
    // data-column skipping path stays exact (inherited files must-scan)
    assert(ids(Fetch.fetchIndexed(spark, dst,
      dataFilters = Seq(ColFilter("id", "<", Seq(10L))))) == (0L until 10L))
  }

  test("clone at an older version pins that snapshot") {
    val src = freshSrc("clone_src_ver")
    Publish.publishVersioned(spark,
      Seq((999L, "g0", 9.9)).toDF("id", "grp", "v"), src, Seq("grp"), mode = "append")
    val dst = TestSpark.tmpDir("clone_dst_ver")
    Versions.clone(spark, src, dst, Some(1))
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L))
  }

  test("clone evolves independently: append, DELETE, UPDATE leave the source intact") {
    val src = freshSrc("clone_src_mut")
    val dst = TestSpark.tmpDir("clone_dst_mut")
    Versions.clone(spark, src, dst)
    val srcFilesBefore = physicalFiles(src)

    Publish.publishVersioned(spark,
      Seq((1000L, "g0", 1.0)).toDF("id", "grp", "v"), dst, Seq("grp"), mode = "append")
    assert(ids(Fetch.fetch(spark, dst)) == ((0L until 100L) :+ 1000L))

    // copy-on-write DELETE rewrites the affected INHERITED file into a
    // local file; the source bytes never move
    val r = Mutations.deleteWhere(spark, dst, col("id") % 4 === 1 && col("id") < 50)
    assert(r.removedFiles.forall(_.startsWith("/")), "removed refs are the inherited form")
    assert(ids(Fetch.fetch(spark, dst)) ==
      ((0L until 100L).filterNot(i => i % 4 == 1 && i < 50) :+ 1000L))
    Mutations.updateWhere(spark, dst, col("id") === 0L, Map("v" -> lit(-1.0)))
    assert(Fetch.fetch(spark, dst).where(col("id") === 0L)
      .select("v").as[Double].head() == -1.0)

    assert(physicalFiles(src) == srcFilesBefore, "source files untouched")
    assert(ids(Fetch.fetch(spark, src)) == (0L until 100L), "source rows untouched")
    // the clone's own time travel still reads its v1 (the cloned snapshot)
    assert(ids(Versions.fetchVersion(spark, dst, 1)) == (0L until 100L))
  }

  test("live deletion vectors travel with the clone") {
    val src = freshSrc("clone_src_dv")
    Mutations.deleteWhereDv(spark, src, col("id") % 10 === 3)
    val dst = TestSpark.tmpDir("clone_dst_dv")
    Versions.clone(spark, src, dst)
    val expect = (0L until 100L).filterNot(_ % 10 == 3)
    assert(ids(Fetch.fetch(spark, dst)) == expect)
    // the clone's DV sidecar is its OWN copy: vacuuming the clone's DV
    // state never reaches into the source's _graft_dv
    val entry = Versions.readEntry(spark, dst, 1)
    assert(entry.dvs.nonEmpty && entry.dvs.forall(_.dir.startsWith("_graft_dv/")))
    // further DV deletes stack on the clone only
    Mutations.deleteWhereDv(spark, dst, col("id") === 0L)
    assert(ids(Fetch.fetch(spark, dst)) == expect.filterNot(_ == 0L))
    assert(ids(Fetch.fetch(spark, src)) == expect, "source DV state unchanged")
  }

  test("OPTIMIZE materializes the clone; vacuum then cannot touch source files") {
    val src = freshSrc("clone_src_opt")
    val dst = TestSpark.tmpDir("clone_dst_opt")
    Versions.clone(spark, src, dst)
    Versions.compact(spark, dst)
    val entry = Versions.readEntry(spark, dst, 2)
    assert(entry.action == "overwrite" && entry.added.forall(!_.startsWith("/")),
      "materialized refs are local")
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L))
    // vacuum the clone down to the materialized version: only clone-local
    // bytes are candidates, and the source remains fully readable
    val deleted = Versions.vacuum(spark, dst, keepFrom = 2, graceMs = 0L)
    assert(deleted.forall(!_.contains(new org.apache.hadoop.fs.Path(src).getName)),
      s"vacuum must not name source files: $deleted")
    assert(ids(Fetch.fetch(spark, src)) == (0L until 100L))
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L))
  }

  test("column mapping travels: clone of a renamed dataset reads renamed") {
    val src = freshSrc("clone_src_map")
    Versions.renameColumn(spark, src, "v", "value")
    val dst = TestSpark.tmpDir("clone_dst_map")
    Versions.clone(spark, src, dst)
    val df = Fetch.fetch(spark, dst)
    assert(df.columns.toSeq == Seq("id", "grp", "value"))
    assert(df.where(col("id") === 1L).select("value").as[Double].head() == 1.0)
  }

  test("SQL verb: CREATE TABLE ... SHALLOW CLONE ... VERSION AS OF") {
    val src = freshSrc("clone_src_sql")
    Publish.publishVersioned(spark,
      Seq((500L, "g0", 5.0)).toDF("id", "grp", "v"), src, Seq("grp"), mode = "append")
    val dst = TestSpark.tmpDir("clone_dst_sql")
    val out = GraftSql.exec(spark,
      s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src` VERSION AS OF 1")
    assert(out.collect().head.getString(2) == dst)
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L))
    val hist = GraftSql.exec(spark, s"DESCRIBE HISTORY graft.`$dst`")
      .select("action").as[String].collect()
    assert(hist.toSeq == Seq("clone"))
  }

  // ---- DEEP clone / full-history migrate (r16) ----

  test("deep clone materializes the snapshot: zero records decoded, full independence") {
    val src = freshSrc("dclone_src")
    Mutations.deleteWhere(spark, src, col("id") % 10 === 0)
    Mutations.updateWhere(spark, src, col("id") === 7L, Map("v" -> lit(-7.0)))
    val dst = TestSpark.tmpDir("dclone_dst")
    val (_, recs) = IoMetrics.recordsReadDuring(spark) {
      Versions.deepClone(spark, src, dst)
    }
    assert(recs == 0, s"deep clone is byte copies, decoded $recs records")
    val got = Fetch.fetch(spark, dst)
    assert(ids(got) == (0L until 100L).filterNot(_ % 10 == 0))
    assert(got.where(col("id") === 7L).select("v").as[Double].head() == -7.0)
    // no file reference escapes the target; the source can disappear
    val entry = Versions.readEntry(spark, dst, 1)
    assert(entry.added.forall(r => !r.startsWith("/")), s"external refs: ${entry.added}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L).filterNot(_ % 10 == 0))
    // and the copy mutates like any dataset
    Mutations.deleteWhere(spark, dst, col("id") < 50)
    assert(ids(Fetch.fetch(spark, dst)) == (50L until 100L).filterNot(_ % 10 == 0))
  }

  test("deep clone carries live deletion vectors, rewritten to the copies") {
    val src = freshSrc("dclone_dv_src")
    Mutations.deleteWhereDv(spark, src, col("id") % 7 === 0)
    val dst = TestSpark.tmpDir("dclone_dv_dst")
    Versions.deepClone(spark, src, dst)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L).filterNot(_ % 7 == 0))
  }

  test("deep clone of a SHALLOW clone brings the borrowed bytes home") {
    val src = freshSrc("dclone_sh_src")
    val mid = TestSpark.tmpDir("dclone_sh_mid")
    Versions.clone(spark, src, mid) // shallow: external refs
    val dst = TestSpark.tmpDir("dclone_sh_dst")
    Versions.deepClone(spark, mid, dst)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(mid))
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 100L))
    // partition dirs survived the re-homing (hive tail preserved)
    assert(physicalFiles(dst).forall(_.contains("grp=")))
    assert(Fetch.fetch(spark, dst, Seq(ColFilter("grp", "==", Seq("g1")))).count() == 25)
  }

  test("migrate copies the WHOLE history: old versions travel at the target") {
    val src = freshSrc("migrate_src")
    Mutations.deleteWhere(spark, src, col("id") >= 50)
    val dst = TestSpark.tmpDir("migrate_dst")
    val latest = Versions.migrate(spark, src, dst)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    assert(latest == 2)
    assert(ids(Fetch.fetch(spark, dst)) == (0L until 50L))
    assert(ids(Versions.fetchVersion(spark, dst, 1)) == (0L until 100L),
      "pre-delete version must time-travel at the target")
    // a shallow-clone source refuses (its entries point outside the root)
    val sh = TestSpark.tmpDir("migrate_sh")
    val src2 = freshSrc("migrate_src2")
    Versions.clone(spark, src2, sh)
    val e = intercept[IllegalArgumentException] {
      Versions.migrate(spark, sh, TestSpark.tmpDir("migrate_sh_dst"))
    }
    assert(e.getMessage.contains("deepClone"))
  }

  test("guard rails: occupied target, unversioned source, self-clone") {
    val src = freshSrc("clone_src_guard")
    intercept[IllegalArgumentException] {
      Versions.clone(spark, src, src)
    }
    val occupied = freshSrc("clone_dst_occupied")
    intercept[IllegalArgumentException] {
      Versions.clone(spark, src, occupied)
    }
    val unversioned = TestSpark.tmpDir("clone_src_unv")
    Publish.publish(spark, Seq((1L, "a")).toDF("id", "g"), unversioned, Seq("g"))
    intercept[IllegalArgumentException] {
      Versions.clone(spark, unversioned, TestSpark.tmpDir("clone_dst_unv"))
    }
  }
  test("clones carry CHECK constraints and table properties (incl. identity watermarks)") {
    val src = freshSrc("clone_meta_src")
    Versions.addConstraint(spark, src, "v_nonneg", "v >= 0")
    Versions.setTableProperties(spark, src, Map("graft.identity.id.next" -> "5000"))
    // shallow: the clone must keep ENFORCING and keep the watermark
    val dst = TestSpark.tmpDir("clone_meta_dst") + "/ds"
    Versions.clone(spark, src, dst)
    assert(Versions.constraintsOf(spark, dst) == Map("v_nonneg" -> "v >= 0"))
    assert(Versions.tablePropertiesOf(spark, dst)
      .get("graft.identity.id.next").contains("5000"))
    intercept[graft.core.ConstraintViolationException] {
      Publish.publishVersioned(spark,
        Seq((999L, "g0", -1.0)).toDF("id", "grp", "v"), dst, Seq("grp"),
        mode = "append")
    }
    // deep: same carriage
    val dst2 = TestSpark.tmpDir("clone_meta_dst2") + "/ds"
    Versions.deepClone(spark, src, dst2)
    assert(Versions.constraintsOf(spark, dst2) == Map("v_nonneg" -> "v >= 0"))
    assert(Versions.tablePropertiesOf(spark, dst2)
      .get("graft.identity.id.next").contains("5000"))
  }

  test("RESTORE keeps the CURRENT table properties (identity watermarks never regress)") {
    val src = freshSrc("restore_props_src")
    Versions.setTableProperties(spark, src, Map("graft.identity.id.next" -> "100"))
    Publish.publishVersioned(spark,
      Seq((200L, "g0", 1.0)).toDF("id", "grp", "v"), src, Seq("grp"), mode = "append")
    Versions.setTableProperties(spark, src, Map("graft.identity.id.next" -> "300"))
    Versions.restore(spark, src, 2) // the version where next was 100
    assert(Versions.tablePropertiesOf(spark, src)
      .get("graft.identity.id.next").contains("300"),
      "properties are maintenance state, not data: RESTORE must not roll " +
        "an identity watermark back into already-issued ranges")
  }

}
