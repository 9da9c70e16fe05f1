package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ConstraintViolationException, Publish, Versions}

/** Column DEFAULT values + GENERATED ALWAYS AS columns — analyzer-native:
  * Spark's own ResolveDefaultColumns fills CURRENT_DEFAULTs into SQL
  * INSERTs that omit a column; graft's write seam materializes generated
  * columns and rejects contradicting values (GeneratedCols).
  */
class ColumnDefaultsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = TestSpark.tmpDir("gdef_wh")
    spark.conf.set("spark.sql.catalog.gdef", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.db")
    dir
  }

  test("CREATE with DEFAULT: column-list INSERT and VALUES(DEFAULT) fill it") {
    wh
    spark.sql("""CREATE TABLE gdef.db.d1 (id BIGINT, status STRING DEFAULT 'open',
      score DOUBLE DEFAULT 0.5) USING graft""")
    spark.sql("INSERT INTO gdef.db.d1 (id) VALUES (1)")
    spark.sql("INSERT INTO gdef.db.d1 VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO gdef.db.d1 (id, status) VALUES (3, 'closed')")
    val got = spark.table("gdef.db.d1").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "open", 0.5), (2L, "open", 0.5), (3L, "closed", 0.5)))
  }

  test("ALTER COLUMN SET DEFAULT / DROP DEFAULT through the catalog, versioned history") {
    wh
    spark.sql("""CREATE TABLE gdef.db.d2 (id BIGINT, grp STRING DEFAULT 'a')
      USING graft TBLPROPERTIES ('versioned'='true')""")
    spark.sql("INSERT INTO gdef.db.d2 (id) VALUES (1)")
    spark.sql("ALTER TABLE gdef.db.d2 ALTER COLUMN grp SET DEFAULT 'b'")
    spark.sql("INSERT INTO gdef.db.d2 (id) VALUES (2)")
    val got = spark.table("gdef.db.d2").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    // the change is an alter commit: history records it
    val root = s"$wh/db/d2"
    val hist = Versions.history(spark, root).collect()
      .map(r => r.getAs[String]("operation")).toSeq
    assert(hist.contains("ALTER COLUMN SET DEFAULT"), s"history: $hist")
    // DROP DEFAULT: an omitted NULLABLE column then null-fills (Spark's
    // useNullsForMissingDefaultValues contract) — the default is gone
    spark.sql("ALTER TABLE gdef.db.d2 ALTER COLUMN grp DROP DEFAULT")
    spark.sql("INSERT INTO gdef.db.d2 (id) VALUES (3)")
    val after = spark.table("gdef.db.d2").where(col("id") === 3)
      .select("grp").collect().head
    assert(after.isNullAt(0), s"dropped default must null-fill, got $after")
  }

  test("path-verb SET DEFAULT + invalid default rejected at ALTER time") {
    val root = TestSpark.tmpDir("gdef_path") + "/ds"
    Publish.publishVersioned(spark, Seq((1L, "x")).toDF("id", "tag"), root, Nil)
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN tag SET DEFAULT 'pending'")
    val metaTag = graft.core.DatasetMeta.read(spark, root).get.schema("tag")
    assert(metaTag.metadata.getString("CURRENT_DEFAULT") == "'pending'".replace("'", "'"))
    // non-constant defaults fail loudly at ALTER, not at some later INSERT
    val e = intercept[Exception] {
      Versions.setColumnDefault(spark, root, "tag", Some("id + 1"))
    }
    assert(e.getMessage.toLowerCase.contains("default"), e.getMessage)
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN tag DROP DEFAULT")
    assert(!graft.core.DatasetMeta.read(spark, root).get
      .schema("tag").metadata.contains("CURRENT_DEFAULT"))
  }

  test("GENERATED ALWAYS AS: omitted computes, matching passes, contradiction rejects") {
    wh
    spark.sql("""CREATE TABLE gdef.db.g1 (id BIGINT, ts TIMESTAMP,
      day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) USING graft""")
    // a NULL (or the DataFrame path's omission, below) means "compute it"
    spark.sql("""INSERT INTO gdef.db.g1
      VALUES (1, TIMESTAMP '2024-03-05 10:00:00', NULL)""")
    spark.sql("""INSERT INTO gdef.db.g1
      VALUES (2, TIMESTAMP '2024-03-06 09:00:00', DATE '2024-03-06')""")
    val got = spark.table("gdef.db.g1").select("id", "day")
      .as[(Long, java.sql.Date)].collect().toMap
    assert(got(1L).toString == "2024-03-05" && got(2L).toString == "2024-03-06")
    // the DataFrame-writer path may OMIT the column entirely — computed
    Seq((4L, java.sql.Timestamp.valueOf("2024-03-08 09:00:00")))
      .toDF("id", "ts").write.format("graft")
      .mode("append").save(s"$wh/db/g1")
    val got4 = spark.table("gdef.db.g1").where(col("id") === 4)
      .select("day").collect().head.getDate(0).toString
    assert(got4 == "2024-03-08", got4)
    val e = intercept[Exception] {
      spark.sql("""INSERT INTO gdef.db.g1
        VALUES (3, TIMESTAMP '2024-03-07 09:00:00', DATE '1999-01-01')""")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
  }

  test("versioned generated table: UPDATE violating the generation expr rejects via CHECK") {
    wh
    spark.sql("""CREATE TABLE gdef.db.g2 (id BIGINT, v DOUBLE,
      v2 DOUBLE GENERATED ALWAYS AS (v * 2)) USING graft
      TBLPROPERTIES ('versioned'='true')""")
    spark.sql("INSERT INTO gdef.db.g2 VALUES (1, 1.5, NULL)")
    assert(spark.table("gdef.db.g2").select("v2").as[Double].collect().toSeq == Seq(3.0))
    val root = s"$wh/db/g2"
    // the auto-registered _gen_v2 CHECK guards every OTHER write surface
    val e = intercept[ConstraintViolationException] {
      graft.core.Mutations.updateWhere(spark, root, col("id") === 1,
        Map("v2" -> lit(99.0)))
    }
    assert(e.getMessage.contains("_gen_v2"), e.getMessage)
  }
}
