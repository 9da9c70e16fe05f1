package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fetch, Publish}
import graft.functions.ZOrderOps

/** Z-order clustering: the kernel's bit interleave, data integrity through
  * a z-ordered publish, and the layout claim itself — per-file min/max
  * spans of BOTH z-ordered columns must shrink vs an unclustered write
  * (that span is exactly what row-group/file pruning keys on).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave places bit b of column i at position b*n+i") {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(3L, 1L))
    // x=0b11, y=0b01 -> z bits: pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0
    assert(ZOrderOps.interleave(arr, 2) == 0x7L)
    val single = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(5L))
    assert(ZOrderOps.interleave(single, 3) == 5L) // 1 column = identity
  }

  test("z-ordered publish round-trips exactly and shrinks per-file spans") {
    val src = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val plainRoot = "/tmp/graft_test/zorder_plain"
    val zRoot = "/tmp/graft_test/zorder_clustered"
    def files(root: String) = spark.read.schema(src.schema).parquet(root)
      .withColumn("f", input_file_name())

    // hash-partitioned baseline: same number-ish of files, random content;
    // the z-ordered write range-partitions by z-value itself
    Publish.publish(spark, src.repartition(16), plainRoot, Nil)
    Publish.publish(spark, src, zRoot, Nil, zorderCols = Seq("o_custkey", "o_totalprice"),
      zorderPartitions = 16)

    // integrity: same multiset of rows
    val back = Fetch.fetch(spark, zRoot)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)

    // layout: mean per-file normalized span of each z-ordered column
    def meanSpan(root: String, c: String): Double = {
      val mm = src.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val range = mm.getDouble(1) - mm.getDouble(0)
      files(root).groupBy("f")
        .agg(((max(col(c)) - min(col(c))).cast("double") / range).as("span"))
        .agg(avg("span")).head().getDouble(0)
    }
    val n = files(zRoot).select("f").distinct().count()
    assert(n >= 4, s"need multiple files for a meaningful layout test, got $n")
    val custPlain = meanSpan(plainRoot, "o_custkey")
    val custZ = meanSpan(zRoot, "o_custkey")
    val pricePlain = meanSpan(plainRoot, "o_totalprice")
    val priceZ = meanSpan(zRoot, "o_totalprice")
    // an unclustered write leaves each file spanning ~the full range of
    // every column; z-order must shrink BOTH dimensions substantially
    assert(custZ < custPlain * 0.7, s"o_custkey span $custZ vs plain $custPlain")
    assert(priceZ < pricePlain * 0.7, s"o_totalprice span $priceZ vs plain $pricePlain")
  }

  test("interleave rejects over-wide inputs instead of wrapping shifts") {
    val five = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1L, 2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException] { ZOrderOps.interleave(five, 16) }
  }

  test("zorder publish validates inputs") {
    val df = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Publish.publish(spark, df, "/tmp/graft_test/zorder_bad", Nil, zorderCols = Seq("s"))
    }
    intercept[IllegalArgumentException] {
      Publish.publish(spark, df, "/tmp/graft_test/zorder_bad", Nil,
        sortCols = Seq("k"), zorderCols = Seq("k"))
    }
  }

}
