package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Publish

/** `.option("timestampAsOf", ts)` on `format("graft")` — the Delta reader
  * option pair: wall-clock literals resolve through the commit log's
  * in-commit timestamps.
  */
class TimestampAsOfOptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("timestampAsOf reads the snapshot in force at the literal") {
    val root = TestSpark.tmpDir("tsasof") + "/ds"
    Publish.publishVersioned(spark, Seq((1L, "v1")).toDF("id", "tag"), root, Nil)
    Thread.sleep(1100) // commit-ts resolution is ms; keep the boundary clean
    val between = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    Thread.sleep(1100)
    Publish.publishVersioned(spark, Seq((2L, "v2")).toDF("id", "tag"), root, Nil,
      mode = "append")
    val pinned = spark.read.format("graft")
      .option("timestampAsOf", between).load(root)
    assert(pinned.select("tag").as[String].collect().toSeq == Seq("v1"))
    assert(spark.read.format("graft").load(root).count() == 2)
    val e = intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", between)
        .option("versionAsOf", "1").load(root).collect()
    }
    assert(e.getMessage.contains("not both"), e.getMessage)
  }
}
