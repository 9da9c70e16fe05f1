package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, Fetch, Mutations, Publish, StatsIndex, Versions}

/** Column mapping (RENAME / DROP COLUMN as metadata-only commits): data
  * files keep their PHYSICAL column names; the commit entry's
  * logical→physical map lets every read path scan physical and restore
  * logical. Pins: rename read-back, rename-then-append, time travel
  * across the rename, mutations and stats-indexed reads on mapped
  * datasets, OPTIMIZE resetting the map, RESTORE reviving it, and the
  * guard rails.
  */
class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = (0 until 40)
    .map(i => (i.toLong, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "v")

  test("rename: metadata-only, read-back under the new name, files untouched") {
    val root = TestSpark.tmpDir("cm_rename")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    val filesBefore = Versions.snapshotAt(spark, root, 1)._1
    val v = Versions.renameColumn(spark, root, "v", "score")
    assert(v == 2)
    // zero data movement: the live file set is IDENTICAL
    assert(Versions.snapshotAt(spark, root, 2)._1 == filesBefore)
    val out = Fetch.fetch(spark, root)
    assert(out.columns.toSeq == Seq("id", "grp", "score"))
    assert(out.where(col("id") === 7).head().getDouble(2) == 7.0)
    // time travel: v1 still reads the OLD name with the same values
    val v1 = Versions.fetchVersion(spark, root, 1)
    assert(v1.columns.toSeq == Seq("id", "grp", "v"))
    assert(v1.where(col("id") === 7).head().getDouble(2) == 7.0)
  }

  test("rename then append: new files join the same physical binding") {
    val root = TestSpark.tmpDir("cm_rename_append")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    Versions.renameColumn(spark, root, "v", "score")
    Publish.publishVersioned(spark,
      (100 until 110).map(i => (i.toLong, "g0", i * 2.0)).toDF("id", "grp", "score"),
      root, Seq("grp"), mode = "append")
    val out = Fetch.fetch(spark, root)
    assert(out.count() == 50)
    // rows from BOTH epochs carry correct values under the logical name
    assert(out.where(col("id") === 3).head().getAs[Double]("score") == 3.0)
    assert(out.where(col("id") === 105).head().getAs[Double]("score") == 210.0)
    // appending with the OLD name is rejected (schema check is logical)
    intercept[Exception] {
      Publish.publishVersioned(spark,
        Seq((999L, "g0", 0.0)).toDF("id", "grp", "v"),
        root, Seq("grp"), mode = "append")
    }
    // round-trip rename back to the original name empties the map
    Versions.renameColumn(spark, root, "score", "v")
    assert(Versions.readEntry(spark, root,
      Versions.latestVersion(spark, root).get).colMap.isEmpty)
    assert(Fetch.fetch(spark, root).columns.toSeq == Seq("id", "grp", "v"))
  }

  test("mutations on a mapped dataset: DV delete, rewrite update, change feed") {
    val root = TestSpark.tmpDir("cm_mutate")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    Versions.renameColumn(spark, root, "v", "score")                  // v2
    Mutations.deleteWhereDv(spark, root, col("id") % 10 === 0)        // v3
    Mutations.updateWhere(spark, root, col("id") === 7,
      Map("score" -> lit(-7.0)))                                      // v4 rewrite
    val out = Fetch.fetch(spark, root)
    assert(out.count() == 36)
    assert(out.where(col("id") === 7).head().getAs[Double]("score") == -7.0)
    assert(out.where(col("id") % 10 === 0).count() == 0)
    // the row-level feed across the mapped window reads both epochs
    val feed = Versions.changeFeed(spark, root, 2, 4)
    assert(feed.columns.contains("score"))
    val dels = feed.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels.contains(7L) && dels.contains(10L))
  }

  test("drop column: metadata-only; OPTIMIZE materializes; travel preserves") {
    val root = TestSpark.tmpDir("cm_drop")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    val v = Versions.dropColumn(spark, root, "v")
    assert(v == 2)
    val out = Fetch.fetch(spark, root)
    assert(out.columns.toSeq == Seq("id", "grp"))
    // pre-drop version still carries it
    assert(Versions.fetchVersion(spark, root, 1).columns.contains("v"))
    // OPTIMIZE rewrites the snapshot: physical files drop the bytes and
    // the mapping resets to identity
    Versions.compact(spark, root)
    val latest = Versions.latestVersion(spark, root).get
    assert(Versions.readEntry(spark, root, latest).colMap.isEmpty)
    val raw = spark.read.parquet(
      Versions.snapshotAt(spark, root, latest)._1
        .map(r => s"$root/$r"): _*)
    assert(!raw.columns.contains("v"), "compacted files must not carry the dropped bytes")
    assert(Fetch.fetch(spark, root).count() == 40)
  }

  test("stats-indexed reads and compaction on a mapped dataset") {
    val root = TestSpark.tmpDir("cm_stats")
    Publish.publishVersioned(spark, sample.repartition(4), root, Nil,
      statsCols = Seq("v"))
    Versions.renameColumn(spark, root, "v", "score")
    // data filter on the LOGICAL name probes the physical-keyed sidecar
    val hits = Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(ColFilter("score", ">=", Seq(Double.box(30.0)))))
    assert(hits.count() == 10)
    assert(hits.columns.toSeq == Seq("id", "grp", "score"))
    // appends keep feeding the same physical stats rows
    Publish.publishVersioned(spark,
      (200 until 210).map(i => (i.toLong, "g1", i * 1.0)).toDF("id", "grp", "score"),
      root, Nil, mode = "append")
    val hits2 = Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(ColFilter("score", ">=", Seq(Double.box(200.0)))))
    assert(hits2.count() == 10)
    // small-file compaction on the mapped dataset stays consistent
    Versions.compactSmall(spark, root, smallBytes = 1L << 20)
    assert(Fetch.fetch(spark, root).count() == 50)
  }

  test("RESTORE across a rename revives the target version's mapping") {
    val root = TestSpark.tmpDir("cm_restore")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    Versions.renameColumn(spark, root, "v", "score")                  // v2
    Publish.publishVersioned(spark,
      (500 until 505).map(i => (i.toLong, "g0", -1.0)).toDF("id", "grp", "score"),
      root, Seq("grp"), mode = "append")                              // v3
    Versions.restore(spark, root, 2)                                  // v4
    val out = Fetch.fetch(spark, root)
    assert(out.count() == 40)
    assert(out.columns.toSeq == Seq("id", "grp", "score"))
    assert(out.where(col("id") === 7).head().getAs[Double]("score") == 7.0)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN") {
    val root = TestSpark.tmpDir("cm_sql")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    assert(graft.plans.GraftSql.exec(spark,
      s"ALTER TABLE graft.`$root` RENAME COLUMN v TO score").head().getInt(0) == 2)
    assert(Fetch.fetch(spark, root).columns.contains("score"))
    assert(graft.plans.GraftSql.exec(spark,
      s"ALTER TABLE graft.`$root` DROP COLUMN score").head().getInt(0) == 3)
    assert(Fetch.fetch(spark, root).columns.toSeq == Seq("id", "grp"))
  }

  test("alter entries stay memo-safe across delete-and-recreate at one path") {
    // REGRESSION (r14 bench): metadata-only alter entries used to be
    // byte-identical across a dataset deleted and re-created at the same
    // path in one JVM — the snapshot memo's content witness then HIT and
    // served the OLD dataset's file list (PATH_NOT_FOUND at scan). The
    // nonce makes every fileless entry globally unique.
    val root = TestSpark.tmpDir("cm_recreate") + "/ds"
    def roundTrip(tag: String): Seq[String] = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      Publish.publishVersioned(spark,
        (0 until 20).map(i => (i.toLong, s"$tag$i")).toDF("id", "s"), root, Nil)
      Versions.renameColumn(spark, root, "s", "name")        // v2: alter
      Fetch.fetch(spark, root).orderBy("id")
        .select("name").as[String].collect().toSeq
    }
    assert(roundTrip("a") == (0 until 20).map(i => s"a$i"))
    assert(roundTrip("b") == (0 until 20).map(i => s"b$i"),
      "second incarnation must not serve the first's memoized snapshot")
    // the two incarnations' alter entries differ (the nonce)
    assert(Versions.readEntry(spark, root, 2).nonce.isDefined)
  }

  test("guard rails: partition columns, duplicates, unversioned datasets") {
    val root = TestSpark.tmpDir("cm_guards")
    Publish.publishVersioned(spark, sample, root, Seq("grp"))
    intercept[IllegalArgumentException] {
      Versions.renameColumn(spark, root, "grp", "g2")
    }
    intercept[IllegalArgumentException] {
      Versions.dropColumn(spark, root, "grp")
    }
    intercept[IllegalArgumentException] {
      Versions.renameColumn(spark, root, "v", "id") // already exists
    }
    intercept[IllegalArgumentException] {
      Versions.renameColumn(spark, root, "missing", "x")
    }
    val flat = TestSpark.tmpDir("cm_guards_flat")
    Publish.publish(spark, sample, flat, Nil)
    intercept[IllegalArgumentException] {
      Versions.renameColumn(spark, flat, "v", "score")
    }
  }
}
