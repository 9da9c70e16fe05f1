package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Listing-only partition introspection, ported from
  * tests/test_fetch_parq.py (get_all/get_diff/get_max partition values).
  */
class IntrospectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def publishTyped(): String = {
    val root = TestSpark.tmpDir("intro")
    val df = Seq(
      (1L, 10, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 20, Timestamp.valueOf("2024-02-01 00:00:00")),
      (3L, 30, Timestamp.valueOf("2024-03-01 00:00:00"))
    ).toDF("id", "num", "ts")
    Publish.publish(spark, df, root, Seq("num", "ts"))
    root
  }

  test("getAllPartitionValues returns typed values from listings only") {
    val root = publishTyped()
    assert(Fetch.getAllPartitionValues(spark, root, "num").toSet == Set(10, 20, 30))
    assert(Fetch.getAllPartitionValues(spark, root, "ts").toSet ==
      Set("2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00")
        .map(Timestamp.valueOf))
  }

  test("empty dataset: all=Nil, diff respects reverse, max=None (fetch_parq.py:63,92,137)") {
    val root = TestSpark.tmpDir("intro")
    assert(Fetch.getAllPartitionValues(spark, root, "num") == Nil)
    assert(Fetch.getDiffPartitionValues(spark, root, "num", Seq(1, 2)) == Nil)
    assert(Fetch.getDiffPartitionValues(spark, root, "num", Seq(1, 2), reverse = true).toSet
      == Set(1, 2))
    assert(Fetch.getMaxPartitionValue(spark, root, "num").isEmpty)
  }

  test("getDiffPartitionValues typed set difference incl. reverse (fetch_parq.py:73)") {
    val root = publishTyped()
    assert(Fetch.getDiffPartitionValues(spark, root, "num", Seq(10, 20)).toSet == Set(30))
    assert(Fetch.getDiffPartitionValues(spark, root, "num", Seq(10, 99), reverse = true).toSet
      == Set(99))
    // string-form inputs parse to the partition type before diffing
    assert(Fetch.getDiffPartitionValues(spark, root, "num", Seq("10", "20")).toSet == Set(30))
  }

  test("getMaxPartitionValue on numeric and datetime; rejected for strings (fetch_parq.py:145)") {
    val root = publishTyped()
    assert(Fetch.getMaxPartitionValue(spark, root, "num").get == 30)
    assert(Fetch.getMaxPartitionValue(spark, root, "ts").get ==
      Timestamp.valueOf("2024-03-01 00:00:00"))
    val strRoot = TestSpark.tmpDir("intro")
    Publish.publish(spark, Seq((1, "x")).toDF("id", "s"), strRoot, Seq("s"))
    intercept[IllegalArgumentException] {
      Fetch.getMaxPartitionValue(spark, strRoot, "s")
    }
  }

  test("datetime partition diff values (test_get_partition_difference_datetime)") {
    val root = publishTyped()
    val diff = Fetch.getDiffPartitionValues(spark, root, "ts",
      Seq(Timestamp.valueOf("2024-01-01 00:00:00"), Timestamp.valueOf("2024-02-01 00:00:00")))
    assert(diff.toSet == Set(Timestamp.valueOf("2024-03-01 00:00:00")))
    val rev = Fetch.getDiffPartitionValues(spark, root, "ts",
      Seq("2024-01-01 00:00:00", "2099-01-01 00:00:00"), reverse = true)
    assert(rev.toSet == Set(Timestamp.valueOf("2099-01-01 00:00:00")))
  }

  test("filter values must be convertible to the partition type (fetch_parq mismatch)") {
    val root = publishTyped()
    intercept[IllegalArgumentException] {
      Fetch.fetch(spark, root, Seq(ColFilter("num", "==", Seq("not-a-number"))))
    }
    intercept[IllegalArgumentException] {
      Fetch.fetch(spark, root, Seq(ColFilter("num", "==", Seq(true))))
    }
    // parseable string form is fine
    assert(Fetch.fetch(spark, root, Seq(ColFilter("num", "==", Seq("10")))).count() == 1)
  }

  test("allFiles lists only data files") {
    val root = publishTyped()
    val files = Fetch.allFiles(spark, root)
    assert(files.nonEmpty)
    assert(files.forall(_.endsWith(".parquet")))
    assert(!files.exists(_.contains("_graft_meta")))
  }
}
