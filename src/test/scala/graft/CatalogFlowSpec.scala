package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.RedshiftParams
import graft.core.Publish

/** Redshift params validation + the composed publish-with-catalog flow
  * (publish_parq.py:94,512-542).
  */
class CatalogFlowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = RedshiftParams("MySchema", "MyTable",
    "arn:aws:iam::1:role/r", "us-east-1", "c1", "h", "5439", "db")

  test("params validate and lowercase schema/table (publish_parq.py:137-146)") {
    val p = RedshiftParams.validate(params)
    assert(p.schemaName == "myschema" && p.tableName == "mytable")
    intercept[IllegalArgumentException] {
      RedshiftParams.validate(params.copy(host = ""))
    }
    // ec2User may be blank (publish_parq.py:128)
    RedshiftParams.validate(params.copy(ec2User = ""))
  }

  test("publishWithCatalog returns files plus schema/table/partition DDL") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "grp", "v")
    val root = TestSpark.tmpDir("cat")
    val (files, ddl) = Publish.publishWithCatalog(spark, df, root, Seq("grp"),
      "bkt", "warehouse/t", params)
    assert(files.nonEmpty)
    assert(ddl.head.startsWith("CREATE EXTERNAL SCHEMA IF NOT EXISTS myschema"))
    assert(ddl(1).contains("CREATE EXTERNAL TABLE myschema.mytable (id BIGINT, v FLOAT)"))
    assert(ddl(1).contains("PARTITIONED BY (grp VARCHAR)"))
    assert(ddl(1).contains("LOCATION 's3://bkt/warehouse/t'"))
    val parts = ddl.drop(2)
    assert(parts.length == 2)
    assert(parts.exists(_.contains("(grp='a') LOCATION 's3://bkt/warehouse/t/grp=a'")))
    assert(parts.exists(_.contains("(grp='b') LOCATION 's3://bkt/warehouse/t/grp=b'")))
  }

  test("'index' column rejected when registering (publish_parq.py:515)") {
    val df = Seq((1L, "a")).toDF("index", "grp")
    intercept[IllegalArgumentException] {
      Publish.publishWithCatalog(spark, df, TestSpark.tmpDir("cat"), Seq("grp"),
        "bkt", "k", params)
    }
  }
}
