package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Similarity search: brute-force exactness and LSH recall. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Clustered corpus: 5 centers, 20 members each with small noise —
    * nearest neighbors of a member are its cluster mates.
    */
  private lazy val corpus = {
    val rnd = new scala.util.Random(3)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("brute-force top-k returns cluster mates, ranked deterministically") {
    val queries = corpus.where($"vec_id" < 5)
    val out = Similarity.bruteForceTopK(corpus, queries, 5)
    val rows = out.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(rows.length == 25)
    // every neighbor of query q is in q's cluster (same id mod 5)
    assert(rows.forall { case (q, n, _) => n % 5 == q % 5 })
    // ranks are 1..5 per query
    assert(rows.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    val queries = corpus.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(corpus, queries, 5, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
  }

  test("IVF recall holds on a corpus SORTED by cluster (sampling must not head-bias)") {
    // rows grouped cluster-by-cluster with a tiny fit sample: a
    // head-of-scan "sample" would train every centroid on cluster 0 only
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val sorted = (0 until 500).map { i =>
      val c = centers(i / 100) // cluster-contiguous layout
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding").repartition(1)
    val queries = sorted.where($"vec_id" % 100 < 2)
    val exact = Similarity.bruteForceTopK(sorted, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(sorted, queries, 5, nlist = 8, nprobe = 2,
      maxFitSample = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 on sorted corpus")
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    val queries = corpus.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, queries, 5, planes = 8, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below 0.8")
  }
}
