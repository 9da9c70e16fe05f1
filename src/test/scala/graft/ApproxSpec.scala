package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approximate path for 100 TB cardinality/quantile work: exact
  * count-distinct and exact percentile shuffle every distinct value; the
  * sketch versions (HLL++ / quantile summaries, both partial-aggregating)
  * ship constant-size state per task. These specs pin the accuracy
  * contract graft relies on when it recommends the approximate variants.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct within 5% of exact") {
    val exact = lineitem.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = lineitem.select(approx_count_distinct(col("l_partkey"), 0.02))
      .collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within 2% of exact interpolated percentile") {
    val exact = lineitem.select(percentile(col("l_extendedprice"), lit(0.5)))
      .collect().head.getDouble(0)
    val approx = lineitem
      .select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.02, s"approx=$approx exact=$exact")
  }
}
