package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ProbFilterOps, ProbFilters}
import graft.ops.BloomPrune

/** Bloom filter + count-min contracts: zero false negatives (the property
  * [[BloomPrune.pruneJoin]]'s exactness rests on), bounded false
  * positives, merge-order invariance (partial aggregation correctness),
  * and count-min's upper-bound guarantee.
  */
class ProbFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom: no false negatives, fpp within 3x of configured") {
    val members = (0L until 5000L).map(i => i * 31 + 7)
    val bytes = members.toDF("k")
      .agg(ProbFilters.bloomAgg(col("k"), 5000, 0.01).as("b"))
      .head().getAs[Array[Byte]]("b")
    val (nh, nb, words) = ProbFilterOps.deserializeBloom(bytes)
    // every member must probe true — a single false negative breaks join pruning
    members.foreach { k =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(k, org.apache.spark.sql.types.LongType, 42L)
      assert(ProbFilterOps.mightContain(words, h, nh, nb), s"false negative for $k")
    }
    // non-members: observed fpp should be in the ballpark of configured 1%
    val nonMembers = (0L until 20000L).map(i => i * 31 + 8)
    val fp = nonMembers.count { k =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(k, org.apache.spark.sql.types.LongType, 42L)
      ProbFilterOps.mightContain(words, h, nh, nb)
    }
    assert(fp.toDouble / nonMembers.size <= 0.03, s"fpp=${fp.toDouble / nonMembers.size}")
  }

  test("bloom: merge-order invariant across partitionings") {
    val df = (0L until 10000L).toDF("k")
    val one = df.repartition(1).agg(ProbFilters.bloomAgg(col("k"), 10000, 0.01))
      .head().getAs[Array[Byte]](0)
    val many = df.repartition(17).agg(ProbFilters.bloomAgg(col("k"), 10000, 0.01))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many),
      "bloom bytes must not depend on partitioning (OR is order-free)")
  }

  test("mightContain column probes via codegen and matches membership") {
    val members = (0L until 2000L).toDF("k")
    val bytes = members.agg(ProbFilters.bloomAgg(col("k"), 2000, 0.001).as("b"))
      .head().getAs[Array[Byte]]("b")
    val probed = (0L until 4000L).toDF("k")
      .where(ProbFilters.mightContain(spark, col("k"), bytes))
      .select("k").as[Long].collect().toSet
    assert((0L until 2000L).forall(probed.contains), "dropped a true member")
    // [2000, 4000) are non-members; at fpp 0.1% expect ~2 false positives
    assert(probed.count(_ >= 2000L) <= 20, s"fp=${probed.count(_ >= 2000L)}")
  }

  test("pruneJoin equals the plain join exactly") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val small = orders.where(col("o_totalprice") > 300000).select("o_orderkey", "o_totalprice")
    val pruned = BloomPrune.pruneJoin(lineitem, small, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val plain = lineitem.join(small, lineitem("l_orderkey") === small("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "bloom pruning must not change the join result")
  }

  test("pruneJoin rejects result-changing join types") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      BloomPrune.pruneJoin(df, df, "k", "k", joinType = "left_outer")
    }
  }

  test("pruneJoin rejects mismatched key types (hashes would disagree)") {
    val longs = Seq(1L).toDF("k")
    val ints = Seq(1).toDF("j")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.pruneJoin(longs, ints, "k", "j")
    }
    assert(e.getMessage.contains("must match"))
  }

  test("partitioned pruneJoin equals the plain compound-key join exactly") {
    // partition p of the small side holds only keys with k % 2 == p % 2:
    // the same key VALUES recur under other partitions with different
    // membership — the adversarial case for any key-only filter
    val small = (0 until 10).flatMap(p => (0 until 100).collect {
      case k if k % 2 == p % 2 => (p, k.toLong)
    }).toDF("p", "k")
    val large = (0 until 10).flatMap(p => (0 until 100).map(k => (p, k.toLong, p * 1000 + k)))
      .toDF("p", "k", "payload")
    val got = BloomPrune.pruneJoinPartitioned(large, small, "p", "k", "p", "k")
      .select(large("p"), large("k"), col("payload"))
    val want = large.join(small, large("p") === small("p") && large("k") === small("k"))
      .select(large("p"), large("k"), col("payload"))
    assert(got.count() == 500)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("per-partition filters prune cross-partition collisions a key-only filter keeps") {
    val small = (0 until 10).flatMap(p => (0 until 100).collect {
      case k if k % 2 == p % 2 => (p, k.toLong)
    }).toDF("p", "k")
    val large = (0 until 12).flatMap(p => (0 until 100).map(k => (p, k.toLong)))
      .toDF("p", "k") // partitions 10, 11 absent from the small side
    // global filter over the key column alone (equal total bytes: 10
    // filters sized for 50 keys each ≈ one filter sized for 500)
    val globalBytes = small.agg(ProbFilters.bloomAgg(col("k"), 500, 0.01).as("b"))
      .head().getAs[Array[Byte]]("b")
    val globalSurvivors = large
      .where(ProbFilters.mightContain(spark, col("k"), globalBytes)).count()
    // per-partition filters, same per-key budget
    val m = ((ProbFilterOps.bloomBits(50, 0.01) + 63) / 64) * 64
    val kHashes = ProbFilterOps.bloomHashes(50, m)
    val rows = small.groupBy(col("p"))
      .agg(ProbFilters.bloomAggSized(col("k"), m, kHashes).as("b"))
      .select(xxhash64(col("p")).as("ph"), col("b")).collect()
    val filters = new java.util.HashMap[java.lang.Long, Array[Long]]()
    rows.foreach(r => filters.put(r.getLong(0),
      ProbFilterOps.deserializeBloom(r.getAs[Array[Byte]](1))._3))
    val keyedSurvivors = large
      .where(ProbFilters.mightContainKeyed(spark, col("p"), col("k"), kHashes, m, filters))
      .count()
    // every key value exists SOMEWHERE in the small side: the key-only
    // filter keeps all 1200 rows; keyed filters keep the 500 true matches
    // (+ ~fpp) and drop the absent partitions 10/11 at fpp exactly 0
    assert(globalSurvivors == 1200L, s"key-only filter should keep everything: $globalSurvivors")
    assert(keyedSurvivors < 550L,
      s"keyed filters must prune to ~true matches: $keyedSurvivors of 1200")
  }

  test("above the driver ceiling the build ships filters distributed, not broadcast") {
    // 5,000 distinct partition values over a 16-byte ceiling: the map may
    // never be collect()ed — the distributed route must (1) actually be
    // taken (serialized-bytes probe in the plan, no keyed broadcast
    // probe), (2) still equal the plain compound-key join exactly
    val small = (0 until 5000).flatMap(p => (0 until 4).collect {
      case k if k % 2 == p % 2 => (p, k.toLong)
    }).toDF("p", "k")
    val large = (0 until 5002).flatMap(p => (0 until 4).map(k => (p, k.toLong, p + k)))
      .toDF("p", "k", "payload")
    val got = BloomPrune.pruneJoinPartitioned(large, small, "p", "k", "p", "k",
      maxFilterMapBytes = 16L)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft_might_contain_serialized"),
      "above-ceiling build must probe serialized filter bytes riding the join")
    assert(!plan.contains("graft_might_contain_keyed"),
      "above-ceiling build must not collect a broadcast filter map")
    val want = large.join(small, large("p") === small("p") && large("k") === small("k"))
      .select(large("p"), large("k"), col("payload"))
    val gotP = got.select(large("p"), large("k"), col("payload"))
    assert(gotP.count() == want.count())
    assert(gotP.exceptAll(want).isEmpty && want.exceptAll(gotP).isEmpty)
    // below the ceiling the broadcast fast path is unchanged (analyzed
    // plan: ConvertToLocalRelation folds the probe filter over these
    // local test frames before the physical plan)
    val tiny = (0 until 10).map(p => (p, p.toLong)).toDF("p", "k")
    val fast = BloomPrune.pruneJoinPartitioned(large, tiny, "p", "k", "p", "k")
    assert(fast.queryExecution.analyzed.toString.contains("graft_might_contain_keyed"))
  }

  test("above-ceiling with fewer partitions than cores answers with the plain join") {
    // 2 distinct partition values over a forced 1-byte ceiling: the
    // distributed route's partition-key shuffle would serialize the whole
    // probe onto 2 tasks (measured as a 2-straggler collapse at ×100
    // scale on a 3-value key) — below defaultParallelism distinct values
    // the operator must answer with the plain compound-key join: same
    // rows, both join keys in the shuffle, no skew
    val small = (0 until 2).flatMap(p => (0 until 100).map(k => (p, k.toLong)))
      .toDF("p", "k")
    val large = (0 until 3).flatMap(p => (0 until 200).map(k => (p, k.toLong, p + k)))
      .toDF("p", "k", "payload")
    val got = BloomPrune.pruneJoinPartitioned(large, small, "p", "k", "p", "k",
      maxFilterMapBytes = 1L)
    val analyzed = got.queryExecution.analyzed.toString
    assert(!analyzed.contains("graft_might_contain"),
      "low-cardinality above-ceiling case must not take either bloom route")
    val want = large.join(small, large("p") === small("p") && large("k") === small("k"))
      .select(large("p"), large("k"), col("payload"))
    val gotP = got.select(large("p"), large("k"), col("payload"))
    assert(gotP.count() == want.count())
    assert(gotP.exceptAll(want).isEmpty && want.exceptAll(gotP).isEmpty)
  }

  test("partitioned pruneJoin with an empty small side yields an empty join, not a crash") {
    val small = Seq.empty[(Int, Long)].toDF("p", "k")
    val large = (0 until 5).map(i => (i, i.toLong)).toDF("p", "k")
    assert(BloomPrune.pruneJoinPartitioned(large, small, "p", "k", "p", "k").count() == 0)
  }

  test("count-min: estimates are upper bounds and exact for a small vocab") {
    val words = Seq.tabulate(5000)(i => s"w${i % 40}").toDF("w")
    val sketch = words.agg(ProbFilters.countMinAgg(col("w"), 5, 4096).as("s"))
      .head().getAs[Array[Byte]]("s")
    val exact = words.groupBy("w").count().as[(String, Long)].collect().toMap
    val est = words.select(col("w")).distinct()
      .withColumn("est", ProbFilters.cmEstimate(spark, col("w"), sketch))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (w, n) =>
      assert(est(w) >= n, s"count-min under-counted $w: ${est(w)} < $n")
      // 40 items in 5x4096 cells: collisions in all 5 rows are vanishingly rare
      assert(est(w) == n, s"unexpected collision on $w: ${est(w)} != $n")
    }
  }

  test("count-min md5 family: pinned positions, upper bounds, xxh64 parity on no-collision vocab") {
    // positions pinned against an independent md5 implementation
    // (python hashlib: ((digest[6]<<8)|digest[7]) % 8192)
    assert(graft.functions.ProbFilterOps.cmPosMd5("the", 0, 8192) == 4683)
    assert(graft.functions.ProbFilterOps.cmPosMd5("the", 4, 8192) == 909)
    assert(graft.functions.ProbFilterOps.cmPosMd5("w1234", 2, 8192) == 2280)
    val words = Seq.tabulate(5000)(i => s"w${i % 40}").toDF("w")
    val sketch = words.agg(ProbFilters.countMinAggMd5(col("w"), 5, 4096).as("s"))
      .head().getAs[Array[Byte]]("s")
    val exact = words.groupBy("w").count().as[(String, Long)].collect().toMap
    val est = words.select(col("w")).distinct()
      .withColumn("est", ProbFilters.cmEstimateMd5(spark, col("w"), sketch))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (w, n) =>
      assert(est(w) >= n, s"md5 count-min under-counted $w: ${est(w)} < $n")
      assert(est(w) == n, s"unexpected collision on $w: ${est(w)} != $n")
    }
    // width must divide 65536 for the 16-bit truncation to commute
    intercept[IllegalArgumentException] {
      ProbFilters.countMinAggMd5(col("w"), 5, 5000)
    }
  }

  test("count-min: merge-order invariant across partitionings") {
    val df = Seq.tabulate(5000)(i => s"w${i % 40}").toDF("w")
    val one = df.repartition(1).agg(ProbFilters.countMinAgg(col("w"), 5, 1024))
      .head().getAs[Array[Byte]](0)
    val many = df.repartition(13).agg(ProbFilters.countMinAgg(col("w"), 5, 1024))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many),
      "count-min bytes must not depend on partitioning (addition is order-free)")
  }
}
