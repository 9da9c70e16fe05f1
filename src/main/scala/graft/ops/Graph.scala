package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality over edge lists — the web-crawl curation companion to
  * [[Dedup]]'s connected components: crawl pipelines rank domains/pages by
  * link centrality (the CommonCrawl domain-ranking step) to prioritize
  * fetch budgets and weight quality scores.
  *
  * PageRank here is the classic dataframe-iterative form, NOT a
  * translated Pregel kernel: each iteration is one equi-join of the edge
  * list with the current ranks (shuffle on `src`) plus one hash aggregate
  * on `dst` — the minimal work any distributed PageRank pays — and the
  * dangling-node mass is ONE scalar aggregate per iteration (bounded
  * driver state). Iterations are FIXED-COUNT, so results are exactly
  * reproducible (and SQL-replayable by unrolling — the oracle does).
  *
  * Scale notes: ranks/degrees persist per iteration and unpersist two
  * generations back, so the plan stays O(1) deep instead of growing by
  * one join per iteration; edge skew (a mega-out-degree hub) is fine —
  * contributions aggregate map-side per dst; a mega-IN-degree dst is one
  * hot reduce key, the same bound any PageRank has.
  */
object Graph {

  /** PageRank with damping `d` over `iterations` fixed steps:
    *
    *   rank₀ = 1/N;   rankᵢ₊₁(v) = (1-d)/N + d·(Σ_{u→v} rankᵢ(u)/deg(u)
    *                                          + danglingᵢ/N)
    *
    * where danglingᵢ is the total rank mass of nodes with no out-edges
    * (redistributed uniformly — total mass stays 1). Self-loops and
    * duplicate edges are honored as given; pass a DISTINCT edge list for
    * simple-graph semantics. Output: `(node, rank)`.
    */
  def pageRank(spark: SparkSession, edges: DataFrame, iterations: Int = 10,
               damping: Double = 0.85, srcCol: String = "src",
               dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    require(n > 0, "pageRank over an empty edge list")
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Rank mass parked on dangling nodes (no out-edges): ONE scalar per
    // generation. The anti-join aggregate reads EVERY partition of its
    // input, so it doubles as the materializing action for the freshly
    // persisted generation — one action per iteration where the previous
    // shape paid two (a dangling scalar + a separate count(); r18,
    // guide §1.2). Same plan, same values — only the issue order moved.
    def danglingOf(r: DataFrame): Double =
      r.join(deg, r("node") === deg("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
    var dangling = danglingOf(ranks) // also materializes ranks' cache
    var prev: Option[DataFrame] = None
    (1 to iterations).foreach { _ =>
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .groupBy("dst").agg(sum(col("rank") / col("deg")).as("c"))
      val next = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // materializes `next` before the parent unpersists AND prices the
      // following iteration's dangling scalar in the same action
      dangling = danglingOf(next)
      prev.foreach(_.unpersist())
      prev = Some(ranks)
      ranks = next
    }
    prev.foreach(_.unpersist())
    ranks
  }

  /** In/out-degree profile of an edge list — one pass each side, full
    * outer join on the node: `(node, out_deg, in_deg)`.
    */
  def degrees(edges: DataFrame, srcCol: String = "src",
              dstCol: String = "dst"): DataFrame = {
    val outD = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val inD = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
