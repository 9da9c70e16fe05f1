package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColFilter, Fetch, Publish}

/** Selective compaction: fragments re-encode, healthy files move as byte
  * copies, rows survive exactly, and the sidecars (meta + stats) follow.
  */
class CompactSmallFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("listDataFiles never reports sidecar parquet under hidden dirs") {
    val r = "/tmp/graft_test/csf_hidden"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    Publish.publish(spark, Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v"), r, Nil,
      statsCols = Seq("v"))
    val files = Publish.listDataFiles(spark, r)
    assert(files.nonEmpty && files.forall(!_.contains("_graft_stats")),
      s"stats sidecar leaked into the data listing: $files")
  }

  test("compactSmallFiles merges fragments, keeps healthy files, preserves rows") {
    val src = "/tmp/graft_test/csf_src"
    val dest = "/tmp/graft_test/csf_dest"
    Seq(src, dest).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    // fragmented history: one initial publish + three appends, each leaving
    // its own small files per partition
    val slices = orders.withColumn("s", pmod(col("o_orderkey"), lit(4)))
    Publish.publish(spark, slices.where(col("s") === 0).drop("s"), src, Seq("o_orderstatus"))
    (1 to 3).foreach { i =>
      Publish.publish(spark, slices.where(col("s") === i).drop("s"), src,
        Seq("o_orderstatus"), mode = "append")
    }
    val before = Publish.listDataFilesWithSize(spark, src)
    assert(before.size >= 8, s"fragmentation setup produced only ${before.size} files")

    // everything here is tiny, so every file is a fragment: full re-encode
    val (copied, rewritten) = Fetch.compactSmallFiles(spark, src, dest)
    assert(rewritten > 0 && copied == 0)
    val after = Publish.listDataFilesWithSize(spark, dest)
    assert(after.size < before.size,
      s"compaction must shrink the file count: ${before.size} -> ${after.size}")
    val got = Fetch.fetch(spark, dest)
    assert(got.count() == orders.count())
    assert(got.exceptAll(orders).isEmpty && orders.exceptAll(got).isEmpty)

    // healthy-file path: with threshold 1 byte nothing is a fragment —
    // pure byte copy, identical listing relative to the root
    val dest2 = "/tmp/graft_test/csf_dest2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dest2))
    val (copied2, rewritten2) = Fetch.compactSmallFiles(spark, dest, dest2, smallBytesThreshold = 1L)
    assert(rewritten2 == 0 && copied2 == after.size)
    val rel = (root: String, fs: Seq[(String, Long)]) => fs.map { case (f, n) => (f.stripPrefix(root), n) }
    assert(rel(dest, after) == rel(dest2, Publish.listDataFilesWithSize(spark, dest2)),
      "byte-copy path must preserve names and sizes")
    assert(Fetch.fetch(spark, dest2).count() == orders.count())
  }

  test("relative source paths byte-copy to the right destination paths") {
    val src = "target/tmp_csf_rel_src" // deliberately relative
    val dest = "/tmp/graft_test/csf_rel_dest"
    Seq(new java.io.File(src), new java.io.File(dest))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    Publish.publish(spark, Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("id", "p", "v"),
      src, Seq("p"))
    val (copied, rewritten) = Fetch.compactSmallFiles(spark, src, dest, smallBytesThreshold = 1L)
    assert(copied == 2 && rewritten == 0)
    val destFiles = Publish.listDataFiles(spark, dest)
    assert(destFiles.forall(f => f.contains("/p=a/") || f.contains("/p=b/")),
      s"copies must preserve the partition layout directly under dest: $destFiles")
    assert(Fetch.fetch(spark, dest).count() == 2)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
  }

  test("stats index follows the compacted dataset") {
    val src = "/tmp/graft_test/csf_stats_src"
    val dest = "/tmp/graft_test/csf_stats_dest"
    Seq(src, dest).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).cast("double").as("v"))
    Publish.publish(spark, df, src, Nil, statsCols = Seq("v"))
    Fetch.compactSmallFiles(spark, src, dest)
    val pruned = Fetch.fetchIndexed(spark, dest,
      dataFilters = Seq(ColFilter("v", ">=", Seq(1000.0)))).count()
    assert(pruned == 500, s"expected 500 rows >= 1000, got $pruned")
  }
}
