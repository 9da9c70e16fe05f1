package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Publish}

/** Idempotent append: re-delivered rows never duplicate, genuinely new
  * rows always land — including the bloom-false-positive path, which must
  * be corrected by the exact anti-join.
  */
class DedupAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String = {
    val r = s"/tmp/graft_test/dedup_append_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    r
  }

  test("first call publishes, exact redelivery appends nothing") {
    val r = fresh("redeliver")
    val batch = spark.range(0, 500).select(col("id"), (col("id") % 5).cast("string").as("p"))
    val first = Publish.publishDedupAppend(spark, batch, r, Seq("id"))
    assert(first.nonEmpty)
    val second = Publish.publishDedupAppend(spark, batch, r, Seq("id"))
    assert(second.isEmpty, "identical redelivery must write nothing")
    assert(Fetch.fetch(spark, r).count() == 500)
  }

  test("overlapping batch appends exactly the new keys") {
    val r = fresh("overlap")
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id"), (col("id") % 3).cast("string").as("p"))
    Publish.publishDedupAppend(spark, rows(0, 300), r, Seq("id"))
    Publish.publishDedupAppend(spark, rows(200, 600), r, Seq("id"))
    val got = Fetch.fetch(spark, r)
    assert(got.count() == 600)
    assert(got.select("id").distinct().count() == 600)
  }

  test("aggressive fpp still exact: false positives corrected by the anti-join") {
    val r = fresh("fpp")
    def rows(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
    Publish.publishDedupAppend(spark, rows(0, 1000), r, Seq("id"))
    // fpp 0.5: about half the new keys will falsely probe "seen" and must
    // survive through the exact path
    Publish.publishDedupAppend(spark, rows(500, 2000), r, Seq("id"), fpp = 0.5)
    val ids = Fetch.fetch(spark, r).select("id").as[Long].collect().sorted
    assert(ids.length == 2000 && ids.head == 0L && ids.last == 1999L,
      s"got ${ids.length} rows")
  }

  test("null-keyed rows are idempotent too (null-safe anti-join)") {
    val r = fresh("nulls")
    val batch = Seq(Some(1L), Some(2L), None).toDF("id")
    Publish.publishDedupAppend(spark, batch, r, Seq("id"))
    Publish.publishDedupAppend(spark, batch, r, Seq("id")) // exact redelivery
    val got = Fetch.fetch(spark, r)
    assert(got.count() == 3, "null-keyed row must not re-append on redelivery")
  }

  test("key-type mismatch between batch and dataset is rejected") {
    val r = fresh("types")
    Publish.publishDedupAppend(spark, spark.range(0, 10).toDF("id"), r, Seq("id"))
    val intBatch = Seq(5, 20).toDF("id") // int, dataset has bigint
    val e = intercept[IllegalArgumentException] {
      Publish.publishDedupAppend(spark, intBatch, r, Seq("id"))
    }
    assert(e.getMessage.contains("must equal"))
  }

  test("data without a sidecar is never clobbered by the first-create path") {
    val r = fresh("clobber")
    // simulate a crashed publish: parquet data present, no graft metadata
    spark.range(0, 5).toDF("id").write.parquet(r)
    val e = intercept[IllegalArgumentException] {
      Publish.publishDedupAppend(spark, spark.range(0, 3).toDF("id"), r, Seq("id"))
    }
    assert(e.getMessage.contains("no graft metadata"))
    assert(spark.read.parquet(r).count() == 5, "pre-existing data must survive")
  }

  test("carried bloom state skips the rebuild and stays exact across batches") {
    val r = fresh("state")
    def rows(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
    val (_, s1) = Publish.publishDedupAppendWithState(spark, rows(0, 300), r, Seq("id"))
    // second batch: overlap + new keys, probed against the carried filter
    val (_, s2) = Publish.publishDedupAppendWithState(spark, rows(200, 500), r, Seq("id"),
      knownBloom = Some(s1))
    assert(Fetch.fetch(spark, r).count() == 500)
    // exact redelivery against the FOLDED state must append nothing —
    // proving the returned filter includes the keys batch 2 appended
    val (files3, _) = Publish.publishDedupAppendWithState(spark, rows(0, 500), r, Seq("id"),
      knownBloom = Some(s2))
    assert(files3.isEmpty, "state must cover all appended keys")
    assert(Fetch.fetch(spark, r).select("id").distinct().count() == 500)
  }

  test("multi-column keys and in-batch duplicates") {
    val r = fresh("multi")
    val batch = Seq((1L, "a", 10.0), (1L, "b", 11.0), (2L, "a", 12.0),
      (2L, "a", 99.0) /* in-batch dup on (2,a) */).toDF("k1", "k2", "v")
    Publish.publishDedupAppend(spark, batch, r, Seq("k1", "k2"))
    assert(Fetch.fetch(spark, r).count() == 3)
    Publish.publishDedupAppend(spark,
      Seq((1L, "a", 50.0), (3L, "c", 13.0)).toDF("k1", "k2", "v"), r, Seq("k1", "k2"))
    val got = Fetch.fetch(spark, r).select("k1", "k2").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (1L, "b"), (2L, "a"), (3L, "c")))
  }
}
