package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PackedSeq, Packing}

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

  test("grouped packing is deterministic and matches a sequential replay") {
    val tokens = (0L until 1000L).map(i => i -> (37L + (i * 31) % 400)).toMap
    val docs = tokens.toSeq.toDF("doc_id", "n_tokens")
    val groups = 8
    val a = Packing.packSequencesGrouped(spark, docs, 512, groups).collect()
      .sortBy(_.seq_id)
    // invariant to physical layout: shuffled/rearranged input packs the same
    val b = Packing.packSequencesGrouped(spark,
        docs.repartition(13, col("n_tokens")).sortWithinPartitions(col("doc_id").desc),
        512, groups).collect().sortBy(_.seq_id)
    assert(a.toSeq == b.toSeq)
    // exact greedy-replay oracle, per group in ascending id order
    val expected = (0 until groups).flatMap { g =>
      val ids = (0L until 1000L).filter(_ % groups == g)
      var bins = Vector.empty[(Vector[Long], Long)]
      var cur = Vector.empty[Long]; var fill = 0L
      ids.foreach { id =>
        val n = tokens(id)
        if (fill + n > 512 && cur.nonEmpty) { bins :+= (cur, fill); cur = Vector.empty; fill = 0L }
        cur :+= id; fill += n
      }
      if (cur.nonEmpty) bins :+= (cur, fill)
      bins.zipWithIndex.map { case ((ds, f), i) =>
        PackedSeq((g.toLong << 40) | i, ds, ds.length, f)
      }
    }.sortBy(_.seq_id)
    assert(a.toSeq == expected)
    // default group count targets ~128 docs per group
    val auto = Packing.packSequencesGrouped(spark, docs, 1 << 30).collect()
    assert(auto.length == 8 && auto.map(_.n_docs).sum == 1000)
  }

  test("chunkDocuments: overlapping windows, tail handling, short-doc passthrough") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")), // 12 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, (1 to 11).map(i => s"x$i").mkString(" "))  // tail window of 1 -> dropped
    ).toDF("doc_id", "text")
    val got = Packing.chunkDocuments(docs, chunkTokens = 8, stride = 5, minChunkTokens = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0, (1 to 8).map(i => s"w$i").mkString(" "), 8L),
      (1L, 1, (6 to 12).map(i => s"w$i").mkString(" "), 7L),
      (1L, 2, "w11 w12", 2L),
      (2L, 0, "a b c", 3L),
      (3L, 0, (1 to 8).map(i => s"x$i").mkString(" "), 8L),
      (3L, 1, (6 to 11).map(i => s"x$i").mkString(" "), 6L)), s"got $got")
    // disjoint windows when stride == chunkTokens
    val disjoint = Packing.chunkDocuments(docs.where($"doc_id" === 1L),
      chunkTokens = 4, stride = 4)
      .orderBy("chunk_id").as[(Long, Int, String, Long)].collect().toSeq
    assert(disjoint.map(_._4) == Seq(4L, 4L, 4L))
    assert(disjoint.map(_._3).mkString(" ") == (1 to 12).map(i => s"w$i").mkString(" "))
  }
}
