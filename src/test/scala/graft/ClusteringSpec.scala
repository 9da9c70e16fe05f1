package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Clustering

/** Embedding clustering: fixed-anchor assignment semantics, k-means
  * recovery of planted structure, and cluster stats.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 well-separated centers × 30 members, tiny noise. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val centers = Array(
      Array.fill(12)(rnd.nextFloat() + 1f),       // all-positive region
      Array.fill(12)(-rnd.nextFloat() - 1f),      // all-negative region
      Array.tabulate(12)(i => if (i % 2 == 0) 2f else -2f)) // alternating
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding")
  }

  test("assignTo puts every member with its own center, deterministically") {
    val anchors = corpus.where($"vec_id" < 3)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val out = Clustering.assignTo(corpus, anchors)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 90)
    assert(out.forall { case (v, c, _) => c == v % 3 },
      "every vector must land on its planted center's anchor")
    // anchors assign to themselves at sim 1.0
    assert(out.filter(_._1 < 3).forall(_._3 == 1.0))
  }

  test("tie-break goes to the smaller centroid id") {
    val vecs = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // two IDENTICAL centroids -> equal sims, smaller cid must win
    val anchors = Seq((7L, Array(2.0f, 0.0f)), (3L, Array(2.0f, 0.0f)))
      .toDF("cid", "cv")
    val out = Clustering.assignTo(vecs, anchors).as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((10L, 3L, 1.0)))
  }

  test("kmeansAssign recovers the planted clusters (partition-pure)") {
    val out = Clustering.kmeansAssign(corpus, 3, maxFitSample = 1000)
      .as[(Long, Long)].collect()
    assert(out.length == 90)
    // cluster labels are arbitrary but must be PURE: every planted group
    // maps to exactly one label and labels are distinct across groups
    val byPlanted = out.groupBy(_._1 % 3).view.mapValues(_.map(_._2).toSet).toMap
    assert(byPlanted.values.forall(_.size == 1), s"impure clusters: $byPlanted")
    assert(byPlanted.values.flatten.toSet.size == 3)
  }

  test("clusterStats reports sizes and mean similarity per cluster") {
    val anchors = corpus.where($"vec_id" < 3)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val stats = Clustering.clusterStats(Clustering.assignTo(corpus, anchors))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(stats.forall(_._2 == 30L))
    assert(stats.forall(_._3 > 0.9), s"tight clusters must score high: ${stats.toSeq}")
  }

  test("string centroid ids work (tie-break is type-agnostic)") {
    val vecs = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val anchors = Seq(("beta", Array(2.0f, 0.0f)), ("alpha", Array(2.0f, 0.0f)))
      .toDF("cid", "cv")
    val out = Clustering.assignTo(vecs, anchors).as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "alpha", 1.0)))
  }

  test("zero-norm vectors and centroids are excluded, not NaN-assigned") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val anchors = Seq((0L, Array(1.0f, 1.0f)), (9L, Array(0.0f, 0.0f)))
      .toDF("cid", "cv")
    val out = Clustering.assignTo(vecs, anchors).as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L))
    assert(out.head._2 == 0L)
  }
}
