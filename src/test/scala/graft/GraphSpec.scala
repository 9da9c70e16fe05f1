package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** PageRank: fixed-iteration dataframe form vs a hand-rolled in-memory
  * reference on the same formula (dangling mass redistributed uniformly,
  * total mass conserved), plus the degree profile.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-memory reference: identical formula, scalar arithmetic. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          d: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pageRank matches the scalar reference, conserves mass, handles dangling") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("d", "c"))
    // c is dangling (no out-edges); d has no in-edges
    val df = edges.toDF("src", "dst")
    (1 to 4).foreach { iters =>
      val got = Graph.pageRank(spark, df, iterations = iters)
        .as[(String, Double)].collect().toMap
      val want = refPageRank(edges, iters)
      assert(got.keySet == want.keySet)
      want.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 1e-12, s"iters=$iters node=$k: ${got(k)} vs $v")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass must stay 1")
    }
    // the 2-cycle hub pair outranks the leaf sink's feeder
    val r3 = Graph.pageRank(spark, df, iterations = 3)
      .as[(String, Double)].collect().toMap
    assert(r3("a") > r3("d") && r3("b") > r3("d"))
  }

  test("degrees: out/in profile with zero-fill on one-sided nodes") {
    val df = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = Graph.degrees(df).as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == Map("a" -> (2L, 0L), "b" -> (1L, 1L), "c" -> (0L, 2L)))
  }

  test("guard rails") {
    val df = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(spark, df, iterations = 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(spark, df, damping = 1.0) }
  }
}
