package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Multimodal binary-column plumbing (decode itself is a deterministic stub). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello"), (2L, "abcd")).toDF("doc_id", "text")

  test("payload attaches as binary with byte-accurate metadata") {
    val meta = Multimodal.extractMeta(Multimodal.attachPayload(docs))
    val r = meta.where($"doc_id" === 1).collect().head
    assert(r.getAs[Long]("n_bytes") == 5)
    assert(r.getAs[String]("magic") == "6865") // 'h','e'
    assert(r.getAs[Long]("width") == 5 % 640 + 16)
  }

  test("batch decode path (mapPartitions) agrees with the columnar extract") {
    val payload = Multimodal.attachPayload(docs)
    val columnar = Multimodal.extractMeta(payload)
      .select("doc_id", "n_bytes", "magic").as[(Long, Long, String)].collect().toSet
    val batch = Multimodal.decodeBatch(spark, payload)
      .map(m => (m.doc_id, m.n_bytes.toLong, m.magic)).collect().toSet
    assert(batch == columnar)
  }
}
