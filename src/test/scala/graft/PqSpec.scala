package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Product quantization: lossless-config equivalence to brute force,
  * production-config recall on clustered data, and the compression
  * contract of the encoded representation.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Clustered corpus (the SimilaritySpec generator shape): 5 centers,
    * 24 members each, small noise.
    */
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    (0 until 120).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("lossless PQ (codebook = every sample subvector) equals brute force") {
    // ksub ≥ corpus size and a full fit sample make every subvector its
    // own codeword: quantization error is exactly zero, so ADC ranking is
    // the true ranking and the refined result must equal brute force.
    val queries = corpus.where($"vec_id" < 6)
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val pq = Similarity.pqTopK(corpus, queries, 5, m = 4, ksub = 128,
        refineFactor = 2, maxFitSample = 1000)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(pq == brute)
  }

  test("production PQ config achieves >=0.8 recall on clustered data") {
    val queries = corpus.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(corpus, queries, 5, m = 4, ksub = 16,
        refineFactor = 4, maxFitSample = 1000)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall below 0.8")
  }

  test("encoded representation is m small codes per vector") {
    val model = Similarity.pqFit(corpus, m = 4, ksub = 16, maxFitSample = 1000)
    assert(model.m == 4)
    assert(model.codebooks.forall(_.length <= 16))
    // subspace boundaries tile the 16 dims evenly
    assert(model.splits.toSeq == Seq(0, 4, 8, 12, 16))
    val enc = Similarity.pqEncode(model, corpus)
    assert(enc.columns.toSeq == Seq("neighbor_id", "code"))
    val codes = enc.select("code").as[Seq[Int]].collect()
    assert(codes.length == 120)
    assert(codes.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 16)))
  }

  test("refine join touches only candidates and result is deterministic") {
    val queries = corpus.where($"vec_id" < 4)
    val a = Similarity.pqTopK(corpus, queries, 5, m = 4, ksub = 16,
        maxFitSample = 1000)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().sorted.toSeq
    val b = Similarity.pqTopK(corpus, queries, 5, m = 4, ksub = 16,
        maxFitSample = 1000)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().sorted.toSeq
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.map(_._3).sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("IVF-PQ with full probe + lossless codebooks equals brute force") {
    val queries = corpus.where($"vec_id" < 6)
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val got = Similarity.ivfPqTopK(corpus, queries, 5, nlist = 8, nprobe = 8,
        m = 4, ksub = 128, refineFactor = 2, maxFitSample = 1000)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == brute)
  }

  test("production IVF-PQ achieves >=0.8 recall on clustered data") {
    val queries = corpus.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfPqTopK(corpus, queries, 5, nlist = 5, nprobe = 2,
        m = 4, ksub = 16, refineFactor = 4, maxFitSample = 1000)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ recall $recall below 0.8")
  }

  test("dimensionality smaller than m clamps the subspace count") {
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val model = Similarity.pqFit(tiny, m = 8, ksub = 4, maxFitSample = 100)
    assert(model.m == 2)
    val out = Similarity.pqTopK(tiny, tiny.where($"vec_id" === 1), 2,
      m = 8, ksub = 4, maxFitSample = 100)
    assert(out.count() == 2)
  }
}
