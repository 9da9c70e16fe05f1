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

  test("resize bounds dimensions preserving aspect") {
    val meta = Multimodal.extractMeta(Multimodal.attachPayload(docs))
    val resized = Multimodal.resizeMeta(meta, 10)
    val r = resized.where($"doc_id" === 1).collect().head
    assert(r.getAs[Long]("width") <= 10 && r.getAs[Long]("height") <= 10)
    val orig = meta.where($"doc_id" === 1).collect().head
    // aspect preserved within integer floor
    assert(r.getAs[Long]("width") * orig.getAs[Long]("height") -
      r.getAs[Long]("height") * orig.getAs[Long]("width") < orig.getAs[Long]("height"))
  }

  test("frame sampling explodes every-N frame rows with bounded stub bytes") {
    val frames = Multimodal.sampleFrames(Multimodal.attachPayload(docs), 2)
    val rows = frames.where($"doc_id" === 1)
      .select("frame_idx", "n_frames").as[(Long, Long)].collect()
    val n = rows.head._2
    assert(rows.map(_._1).toSeq == (0L until n by 2L).toSeq)
    assert(frames.columns.contains("frame_bytes"))
  }

  test("feature extraction emits fixed-dim deterministic embeddings") {
    val f = Multimodal.extractFeatures(Multimodal.attachPayload(docs), dim = 8)
    val vecs = f.select("features").as[Seq[Float]].collect()
    assert(vecs.forall(_.length == 8))
    assert(vecs.forall(_.forall(x => x >= -1f && x < 1f)))
    val again = Multimodal.extractFeatures(Multimodal.attachPayload(docs), dim = 8)
      .select("features").as[Seq[Float]].collect()
    assert(vecs.toSeq == again.toSeq)
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
