package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Publish, Versions}

/** Explicit ADD COLUMN (metadata-only additive evolution): pre-add files
  * read NULL, time travel stays narrow, guard rails reject duplicates,
  * retired physical names and catalog defaults/positions.
  */
class AddColumnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("metadata-only: old files null-fill, new append carries values, travel narrow") {
    val root = TestSpark.tmpDir("addcol") + "/ds"
    Publish.publishVersioned(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, Nil)
    val before = graft.core.Publish.listDataFiles(spark, root).toSet
    val ver = Versions.addColumn(spark, root, "note",
      org.apache.spark.sql.types.StringType)
    assert(ver == 2)
    assert(graft.core.Publish.listDataFiles(spark, root).toSet == before,
      "ADD COLUMN must not touch data files")
    Publish.publishVersioned(spark, Seq((3L, "c", "hello")).toDF("id", "v", "note"),
      root, Nil, mode = "append")
    val got = graft.core.Fetch.fetch(spark, root)
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some("hello"))))
    // pre-add versions travel narrow
    assert(Versions.fetchVersion(spark, root, 1).columns.toSeq == Seq("id", "v"))
  }

  test("guard rails: duplicate, retired physical name, catalog default/position") {
    val root = TestSpark.tmpDir("addcol_g") + "/ds"
    Publish.publishVersioned(spark, Seq((1L, "a")).toDF("id", "v"), root, Nil)
    intercept[IllegalArgumentException] {
      Versions.addColumn(spark, root, "v", org.apache.spark.sql.types.StringType)
    }
    Versions.renameColumn(spark, root, "v", "w")
    intercept[IllegalArgumentException] {
      Versions.addColumn(spark, root, "v", org.apache.spark.sql.types.StringType)
    }
    // catalog surface: ADD COLUMN with DEFAULT rejected with guidance
    val wh = TestSpark.tmpDir("addcol_wh")
    spark.conf.set("spark.sql.catalog.gadd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gadd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gadd.db")
    spark.sql("CREATE TABLE gadd.db.t (id BIGINT) USING graft")
    spark.sql("ALTER TABLE gadd.db.t ADD COLUMN tag STRING")
    assert(spark.table("gadd.db.t").columns.toSeq == Seq("id", "tag"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gadd.db.t ADD COLUMN bad STRING DEFAULT 'x'")
    }
    assert(e.getMessage.contains("SET DEFAULT"), e.getMessage)
  }
}
