package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media metadata produced by the (stubbed) decoder. */
final case class MediaMeta(doc_id: Long, n_bytes: Int, magic: String,
                           width: Int, height: Int, channels: Int, checksum: Long)

/** Multimodal column handling: media (image/audio/video) ride through the
  * pipeline as opaque `binary` columns with typed metadata beside them.
  * The Spark-side plumbing — schema, batch shape, partition-parallel decode
  * via `mapPartitions`, metadata projection — is real; the byte-level
  * decode itself is a DETERMINISTIC STUB (this container has no media
  * libraries), clearly marked below, with the exact seam where a real
  * decoder (JNI/javacv/etc.) would slot in.
  */
object Multimodal {

  /** Attach a fake binary payload derived from the text column — stands in
    * for real media bytes so the binary-column plumbing is exercised
    * end-to-end with deterministic content.
    */
  def attachPayload(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), encode(col(textCol), "UTF-8").as("payload"))

  /** Columnar metadata extraction over the binary column — header-ish
    * facts that genuinely derive from bytes (length, leading-byte "magic")
    * plus STUB width/height/frames derived deterministically from the byte
    * length where a real header parse would go. Pure codegen'd projection.
    */
  def extractMeta(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val nBytes = length(col("payload")).cast("long")
    withPayload.select(
      col(idCol),
      nBytes.as("n_bytes"),
      upper(hex(substring(col("payload"), 1, 2))).as("magic"),
      // STUB: a real decoder reads these from the media header.
      (nBytes % 640 + 16).as("width"),
      ((nBytes * 7) % 480 + 16).as("height"),
      (nBytes % 30 + 1).as("frames"))
  }

  /** Batch "decode" via mapPartitions — the real distribution shape for a
    * heavyweight decoder: one decoder instance per partition, rows streamed
    * through it in batch, typed `Dataset[MediaMeta]` out. The inner
    * `decodeOne` is the STUB seam: swap its body for a real media decode
    * (the surrounding plumbing — per-partition init, streaming iterator,
    * typed encoder schema — is what matters at 100 TB).
    */
  def decodeBatch(spark: SparkSession, withPayload: DataFrame,
                  idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // A real implementation initializes the native decoder ONCE here.
        def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
          // STUB decode: deterministic pseudo-metadata from the bytes.
          var h = 1125899906842597L
          var i = 0
          while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
          val magic = bytes.take(2).map(b => f"$b%02X").mkString
          MediaMeta(id, bytes.length, magic,
            bytes.length % 640 + 16, (bytes.length * 7) % 480 + 16, 3, h)
        }
        rows.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }
}
