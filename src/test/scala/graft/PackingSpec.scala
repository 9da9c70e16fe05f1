package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

/** Sequence packing invariants. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every doc packed exactly once, budgets respected, oversized isolated") {
    val docs = ((1L to 100L).map(i => (i, 50L + (i % 7) * 10)) :+ (999L, 5000L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(spark, docs, tokensPerSeq = 512).collect()
    // exhaustive, no duplicates
    val allDocs = packed.flatMap(_.doc_ids)
    assert(allDocs.sorted.toSeq == ((1L to 100L) :+ 999L).sorted)
    // multi-doc sequences respect the budget
    packed.filter(_.n_docs > 1).foreach(p =>
      assert(p.total_tokens <= 512, s"seq ${p.seq_id} overflows: ${p.total_tokens}"))
    // the oversized doc rides alone
    val big = packed.find(_.doc_ids.contains(999L)).get
    assert(big.n_docs == 1 && big.total_tokens == 5000L)
    // fill is reasonable (greedy first-fit on ~50-110 token docs)
    val multi = packed.filter(_.n_docs > 1)
    assert(multi.map(_.total_tokens).sum.toDouble / (multi.length * 512) > 0.7)
  }

  test("seq ids unique across partitions") {
    val docs = spark.range(0, 10000).select(col("id").as("doc_id"), lit(100L).as("n_tokens"))
      .repartition(8)
    val packed = Packing.packSequences(spark, docs, 1000).collect()
    assert(packed.map(_.seq_id).distinct.length == packed.length)
    assert(packed.flatMap(_.doc_ids).length == 10000)
  }
}
