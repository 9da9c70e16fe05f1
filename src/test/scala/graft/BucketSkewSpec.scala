package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Publish
import graft.ops.SkewJoin

/** Bucketed co-located joins and salted skew joins — the two layouts that
  * remove/redistribute fact-join shuffles at scale.
  */
class BucketSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    Publish.publishBucketed(spark, a, "bkt_a", "k", 8, Seq("k"))
    Publish.publishBucketed(spark, b, "bkt_b", "k", 8, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the plan must choose a non-broadcast join —
      // bucketing should then satisfy both sides' distribution with NO
      // shuffle exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted skew join equals plain join on skewed data") {
    // 90% of the fact rows share one key — the pathological shape
    val big = (0 until 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong))
      .toDF("k", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(dim, "k")
    val salted = SkewJoin.saltedJoin(big, dim, "k", 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name").except(
      plain.select("k", "payload", "name")).isEmpty)
    assert(plain.select("k", "payload", "name").except(
      salted.select("k", "payload", "name")).isEmpty)
  }
}
