package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Mutations, Publish, Versions}

/** Row-level change feed (the Delta CDF analog): every emitted row carries
  * `_change_type` (insert|delete) + `_commit_version`. DV-backed mutations
  * make the feed PRECISE (the DV pairs are the deleted rows; update_dv's
  * added files are exactly the updated copies); rewrite/overwrite commits
  * are file-granular but still replay-correct. The invariant every test
  * leans on: snapshot(from) ⊎ inserts ∖ deletes = snapshot(to), as
  * multisets.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.select(col("id"), col("v")).as[(Long, Double)].collect().toSeq.sorted

  /** Multiset replay: from-snapshot + inserts - deletes == to-snapshot. */
  private def assertReplays(root: String, from: Int, to: Int): Unit = {
    val feed = Versions.changeFeed(spark, root, from, to)
    val ins = rows(feed.where(col("_change_type") === "insert"))
    val del = rows(feed.where(col("_change_type") === "delete"))
    val base = rows(Versions.fetchVersion(spark, root, from))
    val target = rows(Versions.fetchVersion(spark, root, to))
    val replayed = del.foldLeft(base ++ ins) { (acc, d) =>
      val i = acc.indexOf(d); assert(i >= 0, s"delete of absent row $d")
      acc.patch(i, Nil, 1)
    }
    assert(replayed.sorted == target)
  }

  test("appends feed as pure inserts; dv deletes as precise pre-image deletes") {
    val root = TestSpark.tmpDir("cf_basic")
    Publish.publishVersioned(spark,
      (0 until 40).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Publish.publishVersioned(spark,
      (100 until 110).map(i => (i.toLong, -1.0)).toDF("id", "v"),
      root, Nil, mode = "append")                                   // v2
    Mutations.deleteWhereDv(spark, root, col("id") % 10 === 3)      // v3
    val feed = Versions.changeFeed(spark, root, 1, 3)
    val v2 = feed.where(col("_commit_version") === 2)
    assert(v2.where(col("_change_type") =!= "insert").count() == 0)
    assert(rows(v2) == (100L until 110L).map(i => (i, -1.0)))
    val v3 = feed.where(col("_commit_version") === 3)
    assert(v3.where(col("_change_type") =!= "delete").count() == 0)
    // precise: exactly the deleted rows, pre-delete values
    assert(rows(v3) == (0L until 40L).filter(_ % 10 == 3).map(i => (i, i * 1.0))
      ++ Seq((103L, -1.0)))
    assertReplays(root, 1, 3)
  }

  test("update_dv feeds as delete+insert of exactly the matched rows") {
    val root = TestSpark.tmpDir("cf_update")
    Publish.publishVersioned(spark,
      (0 until 30).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Mutations.updateWhereDv(spark, root, col("id") < 4, Map("v" -> lit(-9.0)))
    val feed = Versions.changeFeed(spark, root, 1, 2)
    assert(rows(feed.where(col("_change_type") === "delete")) ==
      (0L until 4L).map(i => (i, i * 1.0)))
    assert(rows(feed.where(col("_change_type") === "insert")) ==
      (0L until 4L).map(i => (i, -9.0)))
    assertReplays(root, 1, 2)
  }

  test("rewrite and overwrite commits replay correctly (file-granular)") {
    val root = TestSpark.tmpDir("cf_rewrite")
    Publish.publishVersioned(spark,
      (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Mutations.deleteWhere(spark, root, col("id") % 5 === 0)          // v2 rewrite
    Mutations.updateWhere(spark, root, col("id") === 7,
      Map("v" -> lit(-7.0)))                                         // v3 rewrite
    Publish.publishVersioned(spark,
      (200 until 205).map(i => (i.toLong, 2.0)).toDF("id", "v"), root, Nil) // v4 overwrite
    assertReplays(root, 1, 4)
    assertReplays(root, 2, 3)
    // the overwrite boundary alone: old snapshot deleted, new inserted
    val feed4 = Versions.changeFeed(spark, root, 3, 4)
    assert(rows(feed4.where(col("_change_type") === "delete")) ==
      rows(Versions.fetchVersion(spark, root, 3)))
    assert(rows(feed4.where(col("_change_type") === "insert")) ==
      (200L until 205L).map(i => (i, 2.0)))
  }

  test("a rewrite after a dv does not re-delete already-dv-deleted rows") {
    val root = TestSpark.tmpDir("cf_dv_rewrite")
    Publish.publishVersioned(spark,
      (0 until 30).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Mutations.deleteWhereDv(spark, root, col("id") < 10)             // v2
    Mutations.deleteWhere(spark, root, col("id") >= 25)              // v3 rewrite
    val v3del = rows(Versions.changeFeed(spark, root, 2, 3)
      .where(col("_change_type") === "delete"))
    // the rewritten files' DV-deleted rows (<10) must NOT reappear
    assert(v3del.forall(_._1 >= 10))
    assertReplays(root, 1, 3)
  }

  test("rowDiffKeys: rewrite commits feed MINIMAL — no self-canceling pairs") {
    val root = TestSpark.tmpDir("cf_minimal")
    Publish.publishVersioned(spark,
      (0 until 60).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Mutations.updateWhere(spark, root, col("id") % 6 === 0,
      Map("v" -> lit(-1.0)))                                         // v2 rewrite
    Mutations.deleteWhere(spark, root, col("id") === 13)             // v3 rewrite
    val feed = Versions.changeFeed(spark, root, 1, 3, rowDiffKeys = Seq("id"))
    val del = rows(feed.where(col("_change_type") === "delete"))
    val ins = rows(feed.where(col("_change_type") === "insert"))
    // only the genuinely changed rows emit: updates as delete(pre)+
    // insert(post), the delete as a lone pre-image — survivors of the
    // rewritten files appear NOWHERE
    assert(del == ((0L until 60L by 6).map(i => (i, i * 1.0)) :+ ((13L, 13.0)))
      .sorted)
    assert(ins == (0L until 60L by 6).map(i => (i, -1.0)).sorted)
    // no self-canceling pair: no (key, payload) appears on both sides
    assert(del.toSet.intersect(ins.toSet).isEmpty)
    // replay still holds with the minimal legs
    val base = rows(Versions.fetchVersion(spark, root, 1))
    val target = rows(Versions.fetchVersion(spark, root, 3))
    assert((base ++ ins).diff(del).sorted == target)
    // file-granular default on the same window DOES carry survivor pairs
    // (the documented trade) — the option is what removes them
    val fat = Versions.changeFeed(spark, root, 1, 3)
    val fatDel = rows(fat.where(col("_change_type") === "delete"))
    assert(fatDel.size > del.size)
  }

  test("RESTORE of a dv-bearing version feeds its snapshot without deleted rows") {
    val root = TestSpark.tmpDir("cf_restore")
    Publish.publishVersioned(spark,
      (0 until 20).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), root, Nil)
    Mutations.deleteWhereDv(spark, root, col("id") < 5)              // v2
    Publish.publishVersioned(spark,
      (300 until 305).map(i => (i.toLong, 3.0)).toDF("id", "v"), root, Nil) // v3
    Versions.restore(spark, root, 2)                                 // v4: overwrite + carried DV
    val ins4 = rows(Versions.changeFeed(spark, root, 3, 4)
      .where(col("_change_type") === "insert"))
    assert(ins4 == (5L until 20L).map(i => (i, i * 1.0)))
    assertReplays(root, 1, 4)
  }
}
