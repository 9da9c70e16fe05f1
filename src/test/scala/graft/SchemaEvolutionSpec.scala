package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Publish}

/** Additive schema evolution on append: new columns null-fill backwards,
  * omitted columns null-fill forwards, type conflicts are rejected — and
  * no existing file is ever rewritten.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("new column null-fills old rows; omitted column null-fills new rows") {
    val root = TestSpark.tmpDir("evolve")
    Publish.publish(spark,
      Seq((1L, "x1", "a"), (2L, "x2", "b")).toDF("id", "payload", "grp"),
      root, Seq("grp"))
    val before = Publish.listDataFiles(spark, root).toSet
    // evolved batch: adds `score`, omits `payload`
    Publish.appendEvolved(spark,
      Seq((3L, 0.5, "a")).toDF("id", "score", "grp"), root, Seq("grp"))
    // no original file rewritten
    assert(before.subsetOf(Publish.listDataFiles(spark, root).toSet))
    val out = Fetch.fetch(spark, root).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "payload", "grp", "score"))
    val rows = out.select("id", "payload", "score")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(rows == Seq((1L, Some("x1"), None), (2L, Some("x2"), None),
      (3L, None, Some(0.5))))
  }

  test("type conflicts on shared columns are rejected") {
    val root = TestSpark.tmpDir("evolve_conflict")
    Publish.publish(spark, Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    val e = intercept[IllegalArgumentException] {
      Publish.appendEvolved(spark,
        Seq((2.5, "b")).toDF("id", "grp"), root, Seq("grp"))
    }
    // long↔double has no lossless common type (r16 widening refuses it)
    assert(e.getMessage.contains("not a lossless widening"))
  }

  test("evolution accumulates across appends and fetch filters still work") {
    val root = TestSpark.tmpDir("evolve_multi")
    Publish.publish(spark, Seq((1L, "a")).toDF("id", "grp"), root, Seq("grp"))
    Publish.appendEvolved(spark, Seq((2L, 7L, "b")).toDF("id", "v1", "grp"), root, Seq("grp"))
    Publish.appendEvolved(spark, Seq((3L, "s", "a")).toDF("id", "v2", "grp"), root, Seq("grp"))
    val out = Fetch.fetch(spark, root)
    assert(out.columns.toSeq == Seq("id", "grp", "v1", "v2"))
    val a = Fetch.fetch(spark, root,
      Seq(graft.core.ColFilter("grp", "==", Seq("a")))).orderBy("id")
    assert(a.select("id").as[Long].collect().toSeq == Seq(1L, 3L))
  }

  test("evolved append on a manifest-complete index degrades the claim, not correctness") {
    val root = TestSpark.tmpDir("evolve_stats")
    Publish.publish(spark,
      (1 to 50).map(i => (i.toLong, i * 1.0, "a")).toDF("id", "score", "grp"),
      root, Seq("grp"), statsCols = Seq("score"))
    // evolved batch OMITS the indexed column `score`
    Publish.appendEvolved(spark, Seq((99L, "x", "a")).toDF("id", "note", "grp"),
      root, Seq("grp"))
    val out = Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(graft.core.ColFilter("score", ">=", Seq(49.0))))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(49L, 50L))
  }

  test("MERGE evolveSchema adds source-only columns in the same rewrite commit") {
    val root = TestSpark.tmpDir("evolve_merge")
    // two partitions so one file stays UNTOUCHED by the merge
    Publish.publishVersioned(spark,
      Seq((1L, "old1", "a"), (2L, "old2", "a"), (10L, "old10", "b"))
        .toDF("id", "v", "grp"), root, Seq("grp"))
    val before = Publish.listDataFiles(spark, root).toSet
    val source = Seq((2L, "upd2", "a", 0.9), (3L, "ins3", "a", 0.3))
      .toDF("id", "v", "grp", "score")
    // without the flag: rejected
    val e = intercept[IllegalArgumentException] {
      graft.core.Mutations.merge(spark, root, source, Seq("id"))
    }
    assert(e.getMessage.contains("evolveSchema"))
    graft.core.Mutations.merge(spark, root, source, Seq("id"), evolveSchema = true)
    val out = Fetch.fetch(spark, root).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "v", "grp", "score"))
    assert(out.select("id", "v", "score")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "old1", None), (2L, "upd2", Some(0.9)),
        (3L, "ins3", Some(0.3)), (10L, "old10", None)))
    // the untouched partition's file was NOT rewritten (additive = zero
    // bytes moved for unaffected data)
    val after = Publish.listDataFiles(spark, root).toSet
    assert(before.exists(f => f.contains("grp=b") && after.contains(f)))
    // time travel: v1 still reads with the OLD schema
    assert(graft.core.Versions.fetchVersion(spark, root, 1).columns.toSeq ==
      Seq("id", "v", "grp"))
    // a later plain append must carry the evolved schema
    Publish.publishVersioned(spark,
      Seq((4L, "app4", "b", 0.1)).toDF("id", "v", "grp", "score"),
      root, Seq("grp"), mode = "append")
    assert(Fetch.fetch(spark, root).count() == 5)
  }
}
