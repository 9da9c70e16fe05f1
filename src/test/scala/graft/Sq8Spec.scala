package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** SQ8 scalar-quantized ANN: int8 codes (8× less scan bandwidth than
  * float64), exact re-rank recovers brute-force answers; the saturated
  * config is provably exact.
  */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(1234)
    (0 until 200).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding").cache()
  }

  test("saturated refine equals brute force exactly") {
    val queries = corpus.where(col("vec_id") < 6)
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val sq = Similarity.sqTopK(corpus, queries, 5, refineFactor = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(sq == brute)
  }

  test("codes are single bytes and dequantization error is bounded by step/2") {
    val model = Similarity.sqFit(corpus)
    assert(model.dims == 16)
    val enc = Similarity.sqEncode(model, corpus)
    val codeField = enc.schema("code").dataType
    assert(codeField == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = true) ||
      codeField == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false),
      s"codes must be array<byte>, got $codeField")
    val joined = enc.join(corpus, enc("neighbor_id") === corpus("vec_id"))
      .select("code", "embedding").collect()
    joined.foreach { r =>
      val code = r.getSeq[Byte](0)
      val vec = r.getSeq[Double](1)
      vec.indices.foreach { i =>
        val deq = model.mins(i) + (code(i) + 128.0) * model.steps(i)
        assert(math.abs(deq - vec(i)) <= model.steps(i) / 2 + 1e-9,
          s"dim $i: $deq vs ${vec(i)} (step ${model.steps(i)})")
      }
    }
  }

  test("modest refine factor still reaches high recall on this corpus") {
    val queries = corpus.where(col("vec_id") < 6)
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
    val sq = Similarity.sqTopK(corpus, queries, 5, refineFactor = 4)
    val minRecall = Similarity.recallVsBrute(sq, brute)
      .agg(min("recall")).head().getDouble(0)
    assert(minRecall >= 0.8, s"min recall $minRecall")
  }
}
