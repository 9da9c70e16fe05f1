package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Publish/fetch semantics, ported from the reference's
  * tests/test_publish_parq.py and tests/test_fetch_parq.py.
  */
class PublishFetchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sampleDf = Seq(
    (1L, "a", 10, true, Timestamp.valueOf("2024-01-01 00:00:00"), 1.5),
    (2L, "b", 10, false, Timestamp.valueOf("2024-01-02 00:00:00"), 2.5),
    (3L, "a", 20, true, Timestamp.valueOf("2024-01-01 00:00:00"), 3.5),
    (4L, "c", 20, false, Timestamp.valueOf("2024-01-03 00:00:00"), 4.5)
  ).toDF("id", "grp", "num", "flag", "ts", "value")

  test("publish writes hive layout, sidecar, and returns file list") {
    val root = TestSpark.tmpDir("pub")
    val files = Publish.publish(spark, sampleDf, root, Seq("grp"))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("grp=")))
    val meta = DatasetMeta.read(spark, root).get
    assert(meta.partitions == Seq("grp"))
    assert(meta.schema.fieldNames.toSeq ==
      Seq("id", "grp", "num", "flag", "ts", "value"))
  }

  test("publish with sortCols clusters rows within every written file") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 5000)
      .map(i => (rnd.nextLong(), if (i % 2 == 0) "x" else "y", rnd.nextInt(1000)))
      .toDF("id", "grp", "score")
    val root = TestSpark.tmpDir("pub_sorted")
    val files = Publish.publish(spark, df, root, Seq("grp"), sortCols = Seq("score"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val scores = spark.read.parquet(f).select("score").collect().map(_.getInt(0)).toSeq
      assert(scores == scores.sorted, s"file $f not sorted on score")
    }
    // data content unchanged by the sort
    assert(Fetch.fetch(spark, root).count() == 5000)
  }

  test("publish rejects empty frames (publish_parq.py:16)") {
    val e = intercept[IllegalArgumentException] {
      Publish.publish(spark, sampleDf.limit(0), TestSpark.tmpDir("pub"), Nil)
    }
    assert(e.getMessage.contains("Empty dataframes cannot be published"))
  }

  test("publish rejects missing partition column and hive reserved words (publish_parq.py:66)") {
    intercept[IllegalArgumentException] {
      Publish.publish(spark, sampleDf, TestSpark.tmpDir("pub"), Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Publish.publish(spark, sampleDf.withColumnRenamed("grp", "TABLE"),
        TestSpark.tmpDir("pub"), Seq("TABLE"))
    }
  }

  test("round-trip restores values, column order, and partition types") {
    val root = TestSpark.tmpDir("pub")
    Publish.publish(spark, sampleDf, root, Seq("grp", "num", "flag", "ts"))
    val back = Fetch.fetch(spark, root)
    assert(back.columns.toSeq == sampleDf.columns.toSeq)
    // parquet round-trips always come back nullable; compare name + type
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sampleDf.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq == sampleDf.orderBy("id").collect().toSeq)
  }

  test("fetch filters prune at the partition level (PartitionFilters in the scan)") {
    val root = TestSpark.tmpDir("pub")
    Publish.publish(spark, sampleDf, root, Seq("grp"))
    val pruned = Fetch.fetch(spark, root, Seq(ColFilter("grp", "==", Seq("a"))))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(raw"PartitionFilters: \[[^\]]".r.findFirstIn(plan).isDefined,
      s"expected non-empty PartitionFilters in:\n$plan")
  }

  test("filter value lists OR-fold (the reference 'in' form) and ranges compare typed") {
    val root = TestSpark.tmpDir("pub")
    Publish.publish(spark, sampleDf, root, Seq("grp", "num"))
    assert(Fetch.fetch(spark, root, Seq(ColFilter("grp", "==", Seq("a", "c"))))
      .count() == 3)
    assert(Fetch.fetch(spark, root, Seq(ColFilter("num", ">=", Seq(20))))
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("no matching partitions returns empty frame with headers (fetch_parq.py:222)") {
    val root = TestSpark.tmpDir("pub")
    Publish.publish(spark, sampleDf, root, Seq("grp"))
    val empty = Fetch.fetch(spark, root, Seq(ColFilter("grp", "==", Seq("zzz"))))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == sampleDf.columns.toSeq)
  }

  test("custom publish casts DECIMAL custom columns (publish_parq.py:315)") {
    val root = TestSpark.tmpDir("pub")
    Publish.customPublish(spark, sampleDf, root, Seq("grp"),
      Map("value" -> "DECIMAL(10,2)", "grp" -> "VARCHAR(8)"))
    val back = Fetch.fetch(spark, root)
    assert(back.schema("value").dataType == DecimalType(10, 2))
  }

  test("file sizing: maxRecordsPerFile keeps files near the target") {
    val root = TestSpark.tmpDir("pub")
    val big = spark.range(50000).select(col("id"),
      concat_ws("", (0 until 20).map(_ => md5(col("id").cast("string"))): _*).as("payload"))
    Publish.publish(spark, big, root, Nil)
    val sizes = Publish.listDataFiles(spark, root).map(f => new java.io.File(f).length())
    assert(sizes.forall(_ <= Publish.TargetFileBytes * 2),
      s"file sizes ${sizes.mkString(",")} exceed 2x target")
  }

  test("numeric-looking STRING partition values survive the round-trip untouched") {
    val root = TestSpark.tmpDir("strpart")
    val df = Seq((1L, "0001"), (2L, "0002"), (3L, "10")).toDF("id", "batch")
    Publish.publish(spark, df, root, Seq("batch"))
    val back = Fetch.fetch(spark, root)
    assert(back.schema("batch").dataType.typeName == "string")
    assert(back.select("batch").as[String].collect().toSet == Set("0001", "0002", "10"))
    // and filters on the padded form actually match
    assert(Fetch.fetch(spark, root, Seq(ColFilter("batch", "==", Seq("0001"))))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(Fetch.getAllPartitionValues(spark, root, "batch").toSet == Set("0001", "0002", "10"))
  }

  test("fractional or out-of-range values for integral partitions are rejected") {
    val root = TestSpark.tmpDir("fracfil")
    Publish.publish(spark, sampleDf, root, Seq("num"))
    intercept[IllegalArgumentException] {
      Fetch.fetch(spark, root, Seq(ColFilter("num", "==", Seq(1.5))))
    }
    intercept[IllegalArgumentException] {
      Fetch.fetch(spark, root, Seq(ColFilter("num", "==", Seq(Long.MaxValue))))
    }
    // whole-valued doubles are exactly representable and accepted
    assert(Fetch.fetch(spark, root, Seq(ColFilter("num", "==", Seq(10.0))))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("hidden-prefixed partition names rejected at publish") {
    val df = Seq((1L, "a")).toDF("id", "_batch")
    intercept[IllegalArgumentException] {
      Publish.publish(spark, df, TestSpark.tmpDir("hidden"), Seq("_batch"))
    }
  }

  test("all-columns partitioning rejected with a direct message") {
    val df = Seq(("a", 1), ("b", 2)).toDF("g", "n")
    val e = intercept[IllegalArgumentException] {
      Publish.publish(spark, df, TestSpark.tmpDir("allpart"), Seq("g", "n"))
    }
    assert(e.getMessage.contains("every column"))
  }

  test("append onto data lacking a sidecar is refused") {
    val root = TestSpark.tmpDir("nosidecar")
    sampleDf.write.mode("overwrite").parquet(root) // data, no graft metadata
    intercept[IllegalArgumentException] {
      Publish.publish(spark, sampleDf, root, Nil, mode = "append")
    }
  }

  test("append publish adds files; mismatched schema or partitions rejected") {
    val root = TestSpark.tmpDir("append")
    val first = Publish.publish(spark, sampleDf.where($"grp" =!= "c"), root, Seq("grp"))
    val appended = Publish.publish(spark, sampleDf.where($"grp" === "c"), root,
      Seq("grp"), mode = "append")
    // append reports ONLY the newly written files
    assert(appended.nonEmpty && appended.toSet.intersect(first.toSet).isEmpty)
    assert(appended.forall(_.contains("grp=c")))
    assert(Fetch.getAllPartitionValues(spark, root, "grp").toSet == Set("a", "b", "c"))
    assert(Fetch.fetch(spark, root).orderBy("id").collect().toSeq ==
      sampleDf.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      Publish.publish(spark, sampleDf, root, Seq("num"), mode = "append")
    }
    intercept[IllegalArgumentException] {
      Publish.publish(spark, sampleDf.drop("value"), root, Seq("grp"), mode = "append")
    }
  }

  test("compact rewrites many small files into few, preserving data and partitioning") {
    val src = TestSpark.tmpDir("compact-src")
    val dest = TestSpark.tmpDir("compact-dest")
    // fragment: 24 files across 3 partition values
    sampleDf.repartition(8).write.mode("overwrite")
      .partitionBy("grp").parquet(src)
    DatasetMeta.write(spark, src, DatasetMeta(sampleDf.schema, Seq("grp")))
    val before = Publish.listDataFiles(spark, src).length
    Fetch.compact(spark, src, dest)
    val after = Publish.listDataFiles(spark, dest).length
    assert(after < before, s"expected fewer files, got $before -> $after")
    val meta = DatasetMeta.read(spark, dest).get
    assert(meta.partitions == Seq("grp"))
    assert(Fetch.fetch(spark, dest).orderBy("id").collect().toSeq ==
      sampleDf.orderBy("id").collect().toSeq)
  }

  test("fetchLatest returns only the max partition value's rows") {
    val root = TestSpark.tmpDir("latest")
    Publish.publish(spark, sampleDf, root, Seq("num"))
    val out = Fetch.fetchLatest(spark, root, "num")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("fetchDiff returns rows of input absent from comparison, and reverse (fetch_parq.py:233)") {
    val rootA = TestSpark.tmpDir("pub")
    val rootB = TestSpark.tmpDir("pub")
    Publish.publish(spark, sampleDf, rootA, Seq("grp"))
    Publish.publish(spark, sampleDf.where($"grp" =!= "c"), rootB, Seq("grp"))
    assert(Fetch.fetchDiff(spark, rootA, rootB, "grp")
      .select("id").as[Long].collect().toSeq == Seq(4L))
    assert(Fetch.fetchDiff(spark, rootB, rootA, "grp", reverse = true)
      .select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("money columns in the testdata are 2-decimal exact (q1 decimal-sum precondition)") {
    // q1_agg sums money in exact DECIMAL(18,2)/(22,4); that is only a
    // faithful sum while every input double IS a 2-decimal value (the
    // per-value cast is then exact). If a future data generator emits
    // full-precision doubles, this fails loudly instead of both engines
    // agreeing on a subtly rounded aggregate.
    import org.apache.spark.sql.functions.{col, round => rnd}
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(li.where(rnd(col("l_extendedprice"), 2) =!= col("l_extendedprice")).isEmpty,
      "l_extendedprice must be 2-decimal exact")
    assert(li.where(rnd(col("l_discount"), 2) =!= col("l_discount")).isEmpty,
      "l_discount must be 2-decimal exact")
  }
}
