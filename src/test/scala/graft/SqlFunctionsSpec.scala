package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fingerprint64, GraftSqlFunctions}

/** The SQL surface of the native expressions. */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered functions are callable from spark.sql") {
    GraftSqlFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_fingerprint64('hello world') AS fp,
        |       graft_simhash64(array('a','b','c')) AS sh,
        |       size(graft_shingles('a b c d', 2)) AS nsh,
        |       graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       size(graft_minhash_bands(graft_shingles('a b c d e f', 3), 64, 16)) AS nbands
        |""".stripMargin).collect().head
    assert(row.getAs[Long]("fp") == Fingerprint64.hashBytes("hello world".getBytes("UTF-8")))
    assert(row.getAs[Int]("nsh") == 3)
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Int]("nbands") == 16)
  }

  test("sketch aggregates are callable from spark.sql") {
    GraftSqlFunctions.register(spark)
    import spark.implicits._
    (0 until 2000).map(i => i % 300).toDF("x").createOrReplaceTempView("sk")
    val row = spark.sql(
      """SELECT graft_hll_distinct(x) AS nd,
        |       graft_tdigest_quantiles(x, 0.5, 0.95) AS q
        |FROM sk""".stripMargin).collect().head
    assert(math.abs(row.getAs[Long]("nd") - 300) <= 10)
    val q = row.getSeq[Double](row.fieldIndex("q"))
    assert(math.abs(q(0) - 149.5) < 10 && math.abs(q(1) - 284) < 10, s"$q")
  }

  test("zvalue, bloom and count-min are callable from spark.sql") {
    GraftSqlFunctions.register(spark)
    import spark.implicits._
    // interleave(x=3,y=1, 2 bits) = 0b111
    val z = spark.sql("SELECT graft_zvalue(array(3L, 1L), 2) AS z").collect().head.getLong(0)
    assert(z == 7L)
    (0L until 100L).toDF("k").createOrReplaceTempView("bl")
    val bloom = spark.sql("SELECT graft_bloom_agg(k, 4096, 5) AS b FROM bl")
      .collect().head.getAs[Array[Byte]]("b")
    val (nh, nb, words) = graft.functions.ProbFilterOps.deserializeBloom(bloom)
    assert(nh == 5 && nb == 4096 && words.exists(_ != 0L))
    val cm = spark.sql("SELECT graft_count_min_agg(k, 5, 64) AS s FROM bl")
      .collect().head.getAs[Array[Byte]]("s")
    assert(cm.length == 8 + 5 * 64 * 8)
  }

  test("extensions class injects all builders without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
  }

  test("non-literal size arguments are rejected with a clear error") {
    GraftSqlFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b', length('xx'))").collect()
    }
    assert(e.getMessage.contains("literal int"))
  }
}
