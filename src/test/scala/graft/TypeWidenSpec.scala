package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BloomIndex, ColFilter, Fetch, Mutations, Publish, Versions, Widen}

/** Type-widening schema evolution (the Delta 3.x shape): a column's
  * declared type may grow losslessly (int→long, float→double, decimal
  * precision growth) on append and MERGE — the sidecar/commit schema
  * stores the widest type, old narrow files upcast at the parquet reader
  * (Spark 4 native promotion), zero bytes rewritten.
  */
class TypeWidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def narrowDf(ids: Range) = ids.map(i =>
      (i, i * 1.5f, BigDecimal(i).setScale(2), s"g${i % 2}"))
    .toDF("id", "v", "d", "grp")
    .select(col("id").cast("int"), col("v").cast("float"),
      col("d").cast("decimal(6,2)"), col("grp"))

  private def wideDf(ids: Range) = ids.map(i =>
      ((1L << 40) + i, i * 1.5, BigDecimal(i).setScale(4), s"g${i % 2}"))
    .toDF("id", "v", "d", "grp")
    .select(col("id").cast("long"), col("v").cast("double"),
      col("d").cast("decimal(12,4)"), col("grp"))

  test("Widen.widen: lossless promotions only") {
    assert(Widen.widen(IntegerType, LongType).contains(LongType))
    assert(Widen.widen(LongType, IntegerType).contains(LongType))
    assert(Widen.widen(FloatType, DoubleType).contains(DoubleType))
    assert(Widen.widen(IntegerType, DoubleType).contains(DoubleType))
    assert(Widen.widen(DecimalType(6, 2), DecimalType(12, 4)).contains(DecimalType(12, 4)))
    // lossy / cross-family: refused
    assert(Widen.widen(LongType, DoubleType).isEmpty, "long->double loses past 2^53")
    assert(Widen.widen(StringType, IntegerType).isEmpty)
    assert(Widen.widen(DecimalType(6, 2), DecimalType(6, 3)).isEmpty,
      "scale growth that shrinks integer digits is lossy")
  }

  test("unversioned append widens: mixed-width files read exactly under the union schema") {
    val root = TestSpark.tmpDir("widen_append")
    Publish.publish(spark, narrowDf(0 until 50), root, Seq("grp"))
    Publish.appendEvolved(spark, wideDf(50 until 80), root, Seq("grp"))
    val meta = graft.core.DatasetMeta.read(spark, root).get
    assert(meta.schema("id").dataType == LongType)
    assert(meta.schema("v").dataType == DoubleType)
    assert(meta.schema("d").dataType == DecimalType(12, 4))
    val got = Fetch.fetch(spark, root)
    assert(got.schema("id").dataType == LongType)
    assert(got.count() == 80)
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids == ((0L until 50L) ++ (50 until 80).map(i => (1L << 40) + i)).toSet)
    // filters compare at the wide type across both file generations
    assert(got.where(col("id") > (1L << 40)).count() == 30)
    assert(got.agg(sum("v")).head().getDouble(0) ===
      (0 until 50).map(_ * 1.5).sum + (50 until 80).map(_ * 1.5).sum)
    // a LATER narrow append upcasts on read; the record stays wide
    Publish.appendEvolved(spark, narrowDf(100 until 110), root, Seq("grp"))
    assert(graft.core.DatasetMeta.read(spark, root).get.schema("id").dataType == LongType)
    assert(Fetch.fetch(spark, root).count() == 90)
  }

  test("versioned append widens via an alter commit; old versions travel narrow") {
    val root = TestSpark.tmpDir("widen_versioned")
    Publish.publishVersioned(spark, narrowDf(0 until 40), root, Seq("grp"))
    Publish.appendEvolved(spark, wideDf(40 until 60), root, Seq("grp"))
    // v1 publish, v2 alter (EVOLVE SCHEMA), v3 append
    val latest = Versions.latestVersion(spark, root).get
    assert(latest == 3)
    assert(Versions.readEntry(spark, root, 2).opInfo.get("op").contains("EVOLVE SCHEMA"))
    assert(Versions.readEntry(spark, root, 1).schema("id").dataType == IntegerType)
    assert(Versions.readEntry(spark, root, 3).schema("id").dataType == LongType)
    assert(Versions.fetchVersion(spark, root, 1).schema("id").dataType == IntegerType)
    assert(Versions.fetchVersion(spark, root, 1).count() == 40)
    val now = Fetch.fetch(spark, root)
    assert(now.schema("id").dataType == LongType && now.count() == 60)
    // mutations over the mixed-width history stay exact
    Mutations.deleteWhere(spark, root, col("id") >= (1L << 40))
    assert(Fetch.fetch(spark, root).count() == 40)
  }

  test("MERGE evolveSchema widens; DV-less history stays exact") {
    val root = TestSpark.tmpDir("widen_merge")
    Publish.publishVersioned(spark, narrowDf(0 until 30), root, Seq("grp"))
    // source: longs (some matching keys updated, some brand-new wide keys)
    val src = (Seq(5, 7) ++ Seq(200, 201)).map(i =>
        (if (i < 100) i.toLong else (1L << 41) + i, -1.0, BigDecimal(1).setScale(4), "g0"))
      .toDF("id", "v", "d", "grp")
      .select(col("id").cast("long"), col("v").cast("double"),
        col("d").cast("decimal(12,4)"), col("grp"))
    Mutations.merge(spark, root, src, Seq("id"), evolveSchema = true)
    val got = Fetch.fetch(spark, root)
    assert(got.schema("id").dataType == LongType)
    assert(got.schema("v").dataType == DoubleType)
    assert(got.count() == 32)
    val updated = got.where(col("v") === -1.0).select("id").as[Long].collect().toSet
    assert(updated == Set(5L, 7L, (1L << 41) + 200, (1L << 41) + 201))
    // narrowing via merge is refused
    val bad = Seq((1, "x")).toDF("id", "grp")
      .select(col("id").cast("string").as("id"), col("grp"))
      .withColumn("v", lit(1.0f)).withColumn("d", lit(BigDecimal(1)).cast("decimal(6,2)"))
    val e = intercept[IllegalArgumentException] {
      Mutations.merge(spark, root, bad, Seq("id"), evolveSchema = true)
    }
    assert(e.getMessage.contains("not a lossless widening"))
  }

  test("rejections: cross-family, long->double, partition columns") {
    val root = TestSpark.tmpDir("widen_reject")
    Publish.publish(spark, narrowDf(0 until 10), root, Seq("grp"))
    val strId = narrowDf(10 until 12).withColumn("id", col("id").cast("string"))
    assert(intercept[IllegalArgumentException] {
      Publish.appendEvolved(spark, strId, root, Seq("grp"))
    }.getMessage.contains("not a lossless widening"))
    // long -> double would lose precision past 2^53: both directions refused
    val r2 = TestSpark.tmpDir("widen_reject_l2d")
    Publish.publish(spark, Seq((1L, "a")).toDF("k", "grp"), r2, Seq("grp"))
    assert(intercept[IllegalArgumentException] {
      Publish.appendEvolved(spark,
        Seq((2.0, "a")).toDF("k", "grp"), r2, Seq("grp"))
    }.getMessage.contains("not a lossless widening"))
    // partition columns never change type
    val r3 = TestSpark.tmpDir("widen_reject_part")
    Publish.publish(spark, Seq((1L, 2)).toDF("k", "p").select(col("k"),
      col("p").cast("int")), r3, Seq("p"))
    assert(intercept[IllegalArgumentException] {
      Publish.appendEvolved(spark, Seq((2L, 3L)).toDF("k", "p"), r3, Seq("p"))
    }.getMessage.contains("partition column"))
  }

  test("explicit ALTER COLUMN TYPE: metadata-only widen, SQL verb, rejections") {
    import graft.plans.GraftSql
    val root = TestSpark.tmpDir("widen_alter")
    Publish.publishVersioned(spark, narrowDf(0 until 30), root, Seq("grp"))
    // API: one alter commit, zero files moved
    val v = Versions.widenColumn(spark, root, "id", LongType)
    assert(v == 2 && Versions.readEntry(spark, root, 2).added.isEmpty)
    assert(Fetch.fetch(spark, root).schema("id").dataType == LongType)
    // a wide append then needs NO further schema change
    Publish.publishVersioned(spark, wideDf(30 until 40)
      .withColumn("v", col("v").cast("float"))
      .withColumn("d", col("d").cast("decimal(6,2)")), root, Seq("grp"),
      mode = "append")
    assert(Fetch.fetch(spark, root).count() == 40)
    // SQL verb
    val row = GraftSql.exec(spark,
      s"ALTER TABLE graft.`$root` ALTER COLUMN v TYPE DOUBLE").collect()(0)
    assert(row.getString(2) == "double")
    assert(Fetch.fetch(spark, root).schema("v").dataType == DoubleType)
    GraftSql.exec(spark,
      s"ALTER TABLE graft.`$root` ALTER COLUMN d TYPE DECIMAL(12, 4)").collect()
    assert(Fetch.fetch(spark, root).schema("d").dataType == DecimalType(12, 4))
    // rejections: narrowing, cross-family, partition column, no-op
    assert(intercept[IllegalArgumentException] {
      Versions.widenColumn(spark, root, "id", IntegerType)
    }.getMessage.contains("not a lossless widening"))
    assert(intercept[IllegalArgumentException] {
      Versions.widenColumn(spark, root, "grp", LongType)
    }.getMessage.contains("not a lossless widening"))
    intercept[IllegalArgumentException] {
      Versions.widenColumn(spark, root, "id", LongType) // already long
    }
    // history: pre-widen version still reads narrow
    assert(Versions.fetchVersion(spark, root, 1).schema("id").dataType == IntegerType)
  }

  test("widening a bloomed column drops the bloom sidecar (no stale false-skips)") {
    val root = TestSpark.tmpDir("widen_bloom")
    Publish.publish(spark, narrowDf(0 until 200), root, Seq("grp"))
    BloomIndex.build(spark, root, Seq("id"))
    assert(BloomIndex.params(spark, root).isDefined)
    Publish.appendEvolved(spark, wideDf(200 until 220), root, Seq("grp"))
    assert(BloomIndex.params(spark, root).isEmpty,
      "stale filters hash the narrow type — the index must go")
    // and the indexed fetch path stays exact without it
    assert(Fetch.fetchIndexed(spark, root,
      dataFilters = Seq(ColFilter("id", "==", Seq(7L)))).count() == 1)
  }

  private implicit class DoubleOps(x: Double) {
    def ===(y: Double): Boolean = math.abs(x - y) < 1e-6
  }
}
