package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SpectrumDdl

/** Catalog DDL generation, ported from tests/test_publish_redshift.py. */
class SpectrumDdlSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("size", IntegerType), StructField("price", DoubleType),
    StructField("ok", BooleanType), StructField("ts", TimestampType),
    StructField("grp", StringType)))

  test("type mapping Spark -> Redshift (publish_redshift.py:148)") {
    assert(SpectrumDdl.redshiftType(StringType) == "VARCHAR")
    assert(SpectrumDdl.redshiftType(IntegerType) == "INTEGER")
    assert(SpectrumDdl.redshiftType(LongType) == "BIGINT")
    assert(SpectrumDdl.redshiftType(FloatType) == "REAL")
    assert(SpectrumDdl.redshiftType(DoubleType) == "FLOAT")
    assert(SpectrumDdl.redshiftType(TimestampType) == "TIMESTAMP")
    assert(SpectrumDdl.redshiftType(BooleanType) == "BOOLEAN")
    assert(SpectrumDdl.redshiftType(DecimalType(10, 2)) == "DECIMAL(10,2)")
    intercept[IllegalArgumentException] {
      SpectrumDdl.redshiftType(ArrayType(IntegerType))
    }
  }

  test("create schema DDL (publish_redshift.py:181)") {
    assert(SpectrumDdl.createSchemaDdl("myschema", "mydb", "arn:aws:iam::123:role/r") ==
      "CREATE EXTERNAL SCHEMA IF NOT EXISTS myschema FROM DATA CATALOG " +
        "database 'mydb' iam_role 'arn:aws:iam::123:role/r';")
  }

  test("create table DDL splits partition columns (publish_redshift.py:202)") {
    val ddl = SpectrumDdl.createTableDdl("t", "s", schema, Seq("grp"), "s3://b/k")
    assert(ddl ==
      "CREATE EXTERNAL TABLE s.t (id BIGINT, name VARCHAR, size INTEGER, price FLOAT, " +
        "ok BOOLEAN, ts TIMESTAMP) PARTITIONED BY (grp VARCHAR) " +
        "STORED AS PARQUET LOCATION 's3://b/k';")
    val noParts = SpectrumDdl.createTableDdl("t", "s", StructType(schema.take(2)), Nil, "s3://b/k")
    assert(!noParts.contains("PARTITIONED BY"))
  }

  test("create custom table DDL uses caller types verbatim (publish_redshift.py:241)") {
    val ddl = SpectrumDdl.createCustomTableDdl("t", "s",
      Seq("id" -> "BIGINT", "price" -> "DECIMAL(10,2)", "grp" -> "VARCHAR(12)"),
      Seq("grp"), "s3://b/k")
    assert(ddl ==
      "CREATE EXTERNAL TABLE s.t (id BIGINT, price DECIMAL(10,2)) " +
        "PARTITIONED BY (grp VARCHAR(12)) STORED AS PARQUET LOCATION 's3://b/k';")
  }

  test("add partition DDL from a data file path (publish_redshift.py:300)") {
    val ddl = SpectrumDdl.addPartitionDdl("bkt", "s", "t",
      "path/to/data/apple=abcd/banana=1234/abcd1234.parquet")
    assert(ddl ==
      "ALTER TABLE s.t ADD IF NOT EXISTS PARTITION (apple='abcd', banana='1234') " +
        "LOCATION 's3://bkt/path/to/data/apple=abcd/banana=1234';")
  }

  test("partition values with quotes are escaped in DDL") {
    val ddl = SpectrumDdl.addPartitionDdl("bkt", "s", "t",
      "d/name=O%27Brien/x.parquet")
    assert(ddl.contains("(name='O''Brien')"))
  }

  test("batch add partitions dedups by partition directory") {
    val ddls = SpectrumDdl.addPartitionsDdl("bkt", "s", "t", Seq(
      "d/p=1/a.parquet", "d/p=1/b.parquet", "d/p=2/c.parquet"))
    assert(ddls.length == 2)
    assert(ddls.head.contains("(p='1')") && ddls(1).contains("(p='2')"))
  }

  test("no partitions in path raises (publish_redshift.py:144)") {
    intercept[IllegalArgumentException] {
      SpectrumDdl.addPartitionDdl("bkt", "s", "t", "plain/path/file.parquet")
    }
  }

  test("name validation (publish_redshift.py:18)") {
    assert(SpectrumDdl.validateName("my_table").isEmpty)
    assert(SpectrumDdl.validateName("SELECT").isDefined)
    assert(SpectrumDdl.validateName("has space").isDefined)
    assert(SpectrumDdl.validateName("x" * 128).isDefined)
    intercept[IllegalArgumentException] {
      SpectrumDdl.requireValidNames("ok_name", "WHERE")
    }
  }
}
