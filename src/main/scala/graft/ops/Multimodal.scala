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

  /** "Resize" metadata transform: recompute the stub dimensions to a
    * bounded box, preserving aspect — the columnar seam where a real
    * resize kernel (operating on the binary payload) would slot in. Pure
    * projection: no shuffle, stays in codegen.
    */
  def resizeMeta(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    meta.withColumn("width", floor(col("width") * scale).cast("long"))
      .withColumn("height", floor(col("height") * scale).cast("long"))
  }

  /** Frame sampling for video-like payloads: one output row per sampled
    * frame index (every `everyN`-th of `frames`). The explode shape is the
    * real distribution pattern — per-frame rows fan out for downstream
    * per-frame feature extraction; frame bytes themselves are the STUB
    * (deterministic slice of the payload standing in for a decoded frame).
    */
  def sampleFrames(withPayload: DataFrame, everyN: Int, idCol: String = "doc_id"): DataFrame = {
    val nFrames = length(col("payload")).cast("long") % 30 + 1
    withPayload
      .select(col(idCol), col("payload"), nFrames.as("n_frames"))
      .select(col(idCol), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyN.toLong))).as("frame_idx"),
        col("payload"))
      .withColumn("frame_bytes",
        substring(col("payload"), (col("frame_idx") % 16 + 1).cast("int"), lit(16)))
      .drop("payload")
  }

  /** Feature-extraction stub: a deterministic pseudo-embedding from the
    * payload bytes (hash-seeded), with the real shape — fixed-dim
    * array<float> column produced by a per-row kernel. Swap the generator
    * for a real encoder; the schema, typing, and distribution are what the
    * pipeline depends on.
    */
  def extractFeatures(withPayload: DataFrame, dim: Int = 16,
                      idCol: String = "doc_id"): DataFrame =
    withPayload.select(col(idCol),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod(xxhash64(col("payload"), d), lit(2000)).cast("double") / 1000.0 - 1.0)
          .cast("float"))
        .as("features"))

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
          val h = graft.functions.Fingerprint64.hashBytes(bytes)
          val magic = bytes.take(2).map(b => f"$b%02X").mkString
          MediaMeta(id, bytes.length, magic,
            bytes.length % 640 + 16, (bytes.length * 7) % 480 + 16, 3, h)
        }
        rows.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }
}
