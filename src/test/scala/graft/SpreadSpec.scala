package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Spread

/** The spread decision is metadata-only and byte-scaled (r17 verdict item:
  * no `df.rdd` probe — probing physically plans the frame and, on
  * exchange-rooted inputs, executes upstream stages; and no unconditional
  * full-width shuffle — a sub-quantum frame must pass through untouched).
  */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def numShuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
    }.size

  private def writeText(rows: Int, pad: Int): String = {
    val dir = TestSpark.tmpDir("spread")
    (1 to rows).map(i => (i.toLong, ("w" + i + " ") * pad))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/docs")
    dir + "/docs"
  }

  test("sub-quantum frame passes through untouched (no added exchange)") {
    val path = writeText(rows = 20, pad = 2) // a few KB on disk
    val df = spark.read.parquet(path).select(col("doc_id"), col("text"))
    val out = Spread.forCompute(df, col("doc_id"))
    assert(numShuffles(out) == 0, "tiny scan must not gain a repartition")
  }

  test("dense single-file frame fans out, width scales with bytes") {
    // ~a few hundred KB in one file: one scan split, but well past the
    // heavy quantum — the kernel input must gain exactly one deterministic
    // hash repartition
    val path = writeText(rows = 2000, pad = 40)
    val df = spark.read.parquet(path).select(col("doc_id"), col("text"))
    val out = Spread.forCompute(df, col("doc_id"), Spread.HeavyBytesPerTask)
    assert(numShuffles(out) == 1, "dense small-file scan must spread")
    // byte-scaled width never exceeds the cluster's parallelism
    val width = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
        r.optNumPartitions.getOrElse(0)
    }.head
    assert(width > 1 && width <= spark.sparkContext.defaultParallelism)
  }

  test("non-scan-rooted frames (aggregates/joins upstream) are left alone") {
    val path = writeText(rows = 2000, pad = 40)
    val base = spark.read.parquet(path)
    val agged = base.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(Spread.forCompute(agged, col("doc_id")) eq agged)
    val joined = base.join(base.select(col("doc_id")), "doc_id")
    assert(Spread.forCompute(joined, col("doc_id")) eq joined)
  }

  test("already-parallel scans are not re-shuffled (natural-split skip)") {
    // many files => the scan itself is as parallel as the target width
    val dir = TestSpark.tmpDir("spread-multi")
    (1 to 2000).map(i => (i.toLong, ("w" + i + " ") * 40))
      .toDF("doc_id", "text")
      .repartition(8).write.mode("overwrite").parquet(dir + "/docs")
    val df = spark.read.parquet(dir + "/docs").select(col("doc_id"), col("text"))
    val out = Spread.forCompute(df, col("doc_id"), Spread.HeavyBytesPerTask)
    assert(numShuffles(out) == 0,
      "a scan already at/above target width must pass through")
  }

  test("decision probes no jobs and results are layout-identical") {
    val path = writeText(rows = 500, pad = 40)
    val df = spark.read.parquet(path).select(col("doc_id"), col("text"))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Spread.forCompute(df, col("doc_id"), Spread.HeavyBytesPerTask)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "forCompute must not launch jobs to decide")
    // and the spread changes layout only: same rows either way
    val a = Spread.forCompute(df, col("doc_id"), Spread.HeavyBytesPerTask)
      .orderBy("doc_id").collect().toSeq
    val b = df.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
