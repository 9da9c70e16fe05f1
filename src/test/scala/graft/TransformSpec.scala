package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Hidden partitioning (partition transforms): raw-column filters must
  * prune the derived partitions, results must stay exact (row-level
  * re-application), every write seam must re-derive, and the derived
  * columns must never leak into read schemas.
  */
class TransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def freshRoot(name: String): String = {
    val p = s"/tmp/graft_test/transforms_$name"
    val dir = Paths.get(p)
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    p
  }

  test("days+bucket publish round-trips with the ORIGINAL schema, derived dirs on disk") {
    val root = freshRoot("roundtrip")
    val src = orders
    Publish.publishTransformed(spark, src, root,
      Seq(MonthsOf("o_orderdate"), BucketOf(4, "o_custkey")))
    val back = Fetch.fetch(spark, root)
    // schema: exactly the user's columns, no tp_* leakage
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // physical layout: hive dirs for both derived columns
    val dirs = new java.io.File(root).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("tp_months_o_orderdate=")))
  }

  test("raw-column filters prune partitions and stay exact") {
    val root = freshRoot("prune")
    val src = orders
    Publish.publishTransformed(spark, src, root,
      Seq(MonthsOf("o_orderdate"), BucketOf(4, "o_custkey")))
    val full = src.count()

    // range filter on the raw timestamp: reads only the matching months
    val cut = Timestamp.valueOf("1996-06-01 00:00:00")
    val expectGe = src.where(col("o_orderdate") >= lit(cut))
    val (gotGe, readGe) = IoMetrics.recordsReadDuring(spark) {
      Fetch.fetch(spark, root, Seq(ColFilter("o_orderdate", ">=", Seq(cut))))
        .collect()
    }
    assert(gotGe.length.toLong == expectGe.count())
    assert(readGe < full,
      s"range fetch read $readGe of $full rows — no partition pruning happened")

    // equality on the bucketed key: reads ~1/4 of the rows, exact result
    val key = src.select("o_custkey").head().getLong(0)
    val expectEq = src.where(col("o_custkey") === key)
    val (gotEq, readEq) = IoMetrics.recordsReadDuring(spark) {
      Fetch.fetch(spark, root, Seq(ColFilter("o_custkey", "==", Seq(key))))
        .collect()
    }
    assert(gotEq.length.toLong == expectEq.count())
    assert(readEq <= full / 2,
      s"bucket fetch read $readEq of $full rows — bucket pruning is not working")

    // combined raw filters AND an ordinary result check through fetchIndexed
    val both = Fetch.fetchIndexed(spark, root,
      filters = Seq(ColFilter("o_orderdate", ">=", Seq(cut)),
        ColFilter("o_custkey", "==", Seq(key))))
    val expectBoth = src.where(col("o_orderdate") >= lit(cut) && col("o_custkey") === key)
    assert(both.count() == expectBoth.count())
    assert(both.exceptAll(expectBoth).isEmpty)
  }

  test("truncate transform: string prefix and integer floor-to-multiple rewrites") {
    val root = freshRoot("trunc")
    val df = Seq(
      ("apple", 7L), ("apricot", 23L), ("banana", 41L), ("blueberry", 58L),
      ("cherry", 99L), ("apex", 12L)).toDF("word", "n")
    Publish.publishTransformed(spark, df, root,
      Seq(TruncateOf(2, "word"), TruncateOf(20, "n")))
    // string equality routes to the 2-char-prefix partition
    val (a, readA) = IoMetrics.recordsReadDuring(spark) {
      Fetch.fetch(spark, root, Seq(ColFilter("word", "==", Seq("apple")))).collect()
    }
    assert(a.map(_.getString(0)).toSeq == Seq("apple"))
    // ≤3: the ap* partition holds 3 rows, and parquet row-group pushdown
    // inside it may skip even further
    assert(readA <= 3, s"read $readA rows; the ap* partition holds only 3")
    // integer range prunes to floor-20 partitions
    val (b, readB) = IoMetrics.recordsReadDuring(spark) {
      Fetch.fetch(spark, root, Seq(ColFilter("n", ">=", Seq(45L)))).collect()
    }
    assert(b.map(_.getLong(1)).sorted.toSeq == Seq(58L, 99L))
    assert(readB <= 3, s"read $readB rows; only the 40/80 buckets qualify")
  }

  test("appends re-derive: raw-schema append lands in correct partitions") {
    val root = freshRoot("append")
    val d1 = Seq((1L, Timestamp.valueOf("2024-01-15 10:00:00"), "a"))
      .toDF("id", "ts", "v")
    val d2 = Seq((2L, Timestamp.valueOf("2024-02-20 11:00:00"), "b"))
      .toDF("id", "ts", "v")
    Publish.publishTransformed(spark, d1, root, Seq(DaysOf("ts")))
    // append through the SAME api
    Publish.publishTransformed(spark, d2, root, Seq(DaysOf("ts")), mode = "append")
    // and through plain publish with a raw frame + derived partition names
    // (the publishImpl hook must derive tp_days_ts itself)
    val d3 = Seq((3L, Timestamp.valueOf("2024-03-25 12:00:00"), "c"))
      .toDF("id", "ts", "v")
    Publish.publish(spark, d3, root, Seq("tp_days_ts"), mode = "append")
    val back = Fetch.fetch(spark, root)
    assert(back.count() == 3)
    val one = Fetch.fetch(spark, root,
      Seq(ColFilter("ts", "==", Seq(Timestamp.valueOf("2024-03-25 12:00:00")))))
    assert(one.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(new java.io.File(root).listFiles().map(_.getName)
      .count(_.startsWith("tp_days_ts=")) == 3)
  }

  test("versioned + UPDATE moving a source value relocates the row's partition") {
    val root = freshRoot("versioned")
    val d1 = Seq(
      (1L, Timestamp.valueOf("2024-01-15 10:00:00"), 5.0),
      (2L, Timestamp.valueOf("2024-06-20 11:00:00"), 6.0)).toDF("id", "ts", "x")
    Publish.publishTransformed(spark, d1, root, Seq(DaysOf("ts")), versioned = true)
    // UPDATE the timestamp of row 1 into a different day
    val moved = Timestamp.valueOf("2024-09-09 09:00:00")
    Mutations.updateWhere(spark, root, col("id") === 1L, Map("ts" -> lit(moved)))
    val now = Fetch.fetch(spark, root, Seq(ColFilter("ts", "==", Seq(moved))))
    assert(now.select("id").as[Long].collect().toSeq == Seq(1L))
    // physically: the rewritten row's file sits under the NEW day dir
    assert(new java.io.File(root, "tp_days_ts=2024-09-09").exists())
    // time travel still sees the pre-update day
    val v1 = Versions.fetchVersion(spark, root, 1)
    assert(v1.where(col("id") === 1L).select(col("ts").cast("string"))
      .head().getString(0).startsWith("2024-01-15"))
    // RENAME of a transform source is refused
    val e = intercept[IllegalArgumentException] {
      Versions.renameColumn(spark, root, "ts", "event_ts")
    }
    assert(e.getMessage.contains("transform source"))
  }

  test("format(\"graft\") on a transform dataset: hidden schema, pruned reads, raw inserts") {
    val root = freshRoot("format")
    val src = orders
    Publish.publishTransformed(spark, src, root,
      Seq(MonthsOf("o_orderdate"), BucketOf(4, "o_custkey")))
    val df = spark.read.format("graft").load(root)
    assert(df.columns.toSeq == src.columns.toSeq, "derived columns leaked")
    assert(df.count() == src.count())
    // a raw-column predicate through the format path prunes partitions
    val cut = Timestamp.valueOf("1996-06-01 00:00:00")
    val (got, read) = IoMetrics.recordsReadDuring(spark) {
      spark.read.format("graft").load(root)
        .where(col("o_orderdate") >= lit(cut)).collect()
    }
    assert(got.length.toLong == src.where(col("o_orderdate") >= lit(cut)).count())
    assert(read < src.count(),
      s"format read $read of ${src.count()} rows — transform pruning missing")
    // INSERT with the USER schema re-derives partitions
    val one = src.limit(1)
      .withColumn("o_orderkey", lit(-999L))
    one.write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).where("o_orderkey = -999").count() == 1)
  }

  test("SQL DDL: CREATE TABLE ... USING graft OPTIONS (transforms 'days(ts), bucket(4, id)')") {
    val root = freshRoot("ddl")
    spark.sql("DROP TABLE IF EXISTS graft_tp_ddl")
    // the session catalog cannot store non-identity PARTITIONED BY for a
    // TableProvider — the transform spec rides a provider-owned OPTION
    spark.sql(
      s"""CREATE TABLE graft_tp_ddl (id BIGINT, ts TIMESTAMP, v STRING)
         |USING graft OPTIONS (transforms 'days(ts), bucket(4, id)')
         |LOCATION '$root'""".stripMargin)
    spark.sql(
      """INSERT INTO graft_tp_ddl VALUES
        | (1, TIMESTAMP '2024-01-15 10:00:00', 'a'),
        | (2, TIMESTAMP '2024-02-20 11:00:00', 'b')""".stripMargin)
    // the transform spec landed and the layout derived
    assert(Transforms.read(spark, root).map(_.name) ==
      Seq("tp_days_ts", "tp_bucket4_id"))
    assert(new java.io.File(root, "tp_days_ts=2024-01-15").exists())
    // reads through the table name: user schema, raw-filter correctness
    val out = spark.sql(
      "SELECT id FROM graft_tp_ddl WHERE ts >= TIMESTAMP '2024-02-01 00:00:00'")
    assert(out.as[Long].collect().toSeq == Seq(2L))
    assert(spark.table("graft_tp_ddl").columns.toSeq == Seq("id", "ts", "v"))
    // further INSERTs re-derive through the recorded spec
    spark.sql("INSERT INTO graft_tp_ddl VALUES (3, TIMESTAMP '2024-03-25 09:00:00', 'c')")
    assert(spark.table("graft_tp_ddl").count() == 3)
    assert(new java.io.File(root, "tp_days_ts=2024-03-25").exists())
    spark.sql("DROP TABLE graft_tp_ddl")
  }

  test("guard rails: bad specs are rejected, sidecar survives re-overwrite") {
    val root = freshRoot("guards")
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Publish.publishTransformed(spark, df, root, Seq(DaysOf("nope")))
    }
    intercept[IllegalArgumentException] { BucketOf(0, "id") }
    intercept[IllegalArgumentException] {
      Publish.publishTransformed(spark, df, root, Nil)
    }
    // filters on a non-source data column are rejected on transform datasets
    Publish.publishTransformed(spark, df, root, Seq(BucketOf(2, "id")))
    val err = intercept[IllegalArgumentException] {
      Fetch.fetch(spark, root, Seq(ColFilter("v", "==", Seq("x")))).collect()
    }
    assert(err.getMessage.contains("transform source"))
    // an overwrite that re-partitions away from the transforms clears them
    Publish.publish(spark, df, root, Seq("v"), mode = "overwrite")
    assert(Transforms.read(spark, root).isEmpty)
    assert(Fetch.fetch(spark, root).columns.toSeq == Seq("id", "v"))
  }
}
