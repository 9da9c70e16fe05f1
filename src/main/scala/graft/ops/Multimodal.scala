package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media metadata: real header facts for payloads `ImageIO` can
  * decode (PNG/JPEG/GIF/BMP — JVM-builtin codecs), deterministic stub
  * values otherwise.
  */
final case class MediaMeta(doc_id: Long, n_bytes: Int, magic: String,
                           width: Int, height: Int, channels: Int, checksum: Long)

/** A (possibly re-encoded) image payload with its decoded dimensions;
  * width/height are -1 when the payload is not a decodable image.
  */
final case class MediaPayload(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

/** One sampled frame of a moving-picture payload: REAL decoded facts for
  * animated GIF (the JVM-native container), stub rows (`container =
  * "stub"`, dims -1) for formats without a JVM codec.
  */
final case class FrameSample(doc_id: Long, container: String, n_frames: Int,
                             frame_idx: Int, width: Int, height: Int,
                             frame_crc: Long)

/** Decoded-audio metadata: real header facts for payloads the JVM's own
  * `javax.sound.sampled` parsers accept (WAV/AIFF/AU ship with the JDK),
  * deterministic stub values otherwise. `frames` is -1 when the container
  * doesn't declare a frame count.
  */
final case class AudioMeta(doc_id: Long, n_bytes: Int, magic: String,
                           sample_rate: Float, channels: Int, frames: Long,
                           duration_sec: Double, checksum: Long)

/** Multimodal column handling: media (image/audio/video) ride through the
  * pipeline as opaque `binary` columns with typed metadata beside them.
  * The Spark-side plumbing — schema, batch shape, partition-parallel decode
  * via `mapPartitions`, metadata projection — is real throughout. The
  * IMAGE kernels (decode, resize, pixel features) are real too, built on
  * the JVM's own `javax.imageio` codecs (PNG/JPEG/GIF/BMP) — no native
  * libraries needed. Payloads no codec accepts (audio/video — the
  * container ships no such codec) fall back to a DETERMINISTIC STUB,
  * clearly marked below, at the exact seam a JNI/javacv decoder would
  * slot into.
  */
object Multimodal {

  /** ImageIO defaults to a DISK-backed stream cache — a temp file (plus
    * fsync churn) per decode/encode, turning an in-memory transform into
    * per-row disk I/O in the executor hot loop. The payload is already a
    * byte array; switch the JVM to memory caching once.
    */
  private lazy val imageIoInMemory: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    imageIoInMemory
    try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null } // corrupt/truncated: not an image
  }

  /** Header parse for JDK-decodable audio containers (WAV/AIFF/AU); null
    * when no parser accepts the bytes. `getAudioFileFormat` sniffs the
    * header only — no sample data is decoded.
    */
  private def readAudioFormat(bytes: Array[Byte]): javax.sound.sampled.AudioFileFormat =
    try javax.sound.sampled.AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null } // not WAV/AIFF/AU

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

  /** REAL frame sampling for the one moving-picture container the JVM
    * can decode natively: animated GIF, through `ImageIO`'s own reader
    * (`getNumImages(true)` walks the image sequence; `read(i)` decodes
    * frame i with disposal compositing left to the caller — per-frame
    * rasters are what downstream feature kernels consume). Every
    * `everyN`-th frame emits one typed row with its REAL decoded
    * dimensions and a CRC32 over the pixel data. Non-GIF payloads (mp4
    * etc. — no JVM codec exists) take the same DETERMINISTIC STUB branch
    * as [[sampleFrames]], dimensioned -1, at the exact seam a
    * JNI/javacv decoder would slot into. Same scale shape as
    * [[decodeBatch]]: per-partition decoder state, rows streamed through
    * `mapPartitions`, frame BYTES never shuffled — only per-frame facts.
    */
  def sampleFramesDecoded(spark: SparkSession, withPayload: DataFrame,
                          everyN: Int, idCol: String = "doc_id"): Dataset[FrameSample] = {
    require(everyN >= 1, "everyN must be >= 1")
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInMemory
        def stub(id: Long, bytes: Array[Byte]): Seq[FrameSample] = {
          val n = (bytes.length % 30 + 1)
          (0 until n by everyN).map { i =>
            val crc = new java.util.zip.CRC32
            val off = i % math.max(1, bytes.length)
            crc.update(bytes, off, math.min(16, bytes.length - off))
            FrameSample(id, "stub", n, i, -1, -1, crc.getValue)
          }
        }
        it.flatMap { case (id, bytes) =>
          val isGif = bytes.length >= 6 && bytes(0) == 'G'.toByte &&
            bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte
          if (!isGif) stub(id, bytes)
          else {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); stub(id, bytes) }
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                val n = r.getNumImages(true)
                (0 until n by everyN).map { i =>
                  val img = r.read(i)
                  val crc = new java.util.zip.CRC32
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      val p = img.getRGB(x, y)
                      crc.update(p); crc.update(p >> 8)
                      crc.update(p >> 16); crc.update(p >>> 24)
                      x += 1
                    }
                    y += 1
                  }
                  FrameSample(id, "gif", n, i, img.getWidth, img.getHeight,
                    crc.getValue)
                }
              } finally { r.dispose(); iis.close() }
            }
          }
        }
      }
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

  /** Batch decode via mapPartitions — the real distribution shape for a
    * heavyweight decoder: decoder state per partition, rows streamed
    * through it in batch, typed `Dataset[MediaMeta]` out. Image payloads
    * decode FOR REAL through `ImageIO` (width/height/bands from the
    * actual header+raster); payloads no JVM codec accepts (audio/video)
    * take the STUB branch — deterministic pseudo-metadata at the seam a
    * native decoder would slot into.
    */
  def decodeBatch(spark: SparkSession, withPayload: DataFrame,
                  idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // A heavier native decoder would initialize ONCE here.
        def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
          val h = graft.functions.Fingerprint64.hashBytes(bytes)
          val magic = bytes.take(2).map(b => f"$b%02X").mkString
          val img = readImage(bytes)
          if (img != null)
            MediaMeta(id, bytes.length, magic,
              img.getWidth, img.getHeight, img.getRaster.getNumBands, h)
          else {
            val audio = readAudioFormat(bytes)
            if (audio != null)
              // real audio: no spatial dims (-1), channels from the header
              MediaMeta(id, bytes.length, magic, -1, -1,
                audio.getFormat.getChannels, h)
            else
              // STUB branch (video/unknown media): deterministic
              // pseudo-metadata — no JVM video codec exists.
              MediaMeta(id, bytes.length, magic,
                bytes.length % 640 + 16, (bytes.length * 7) % 480 + 16, 3, h)
          }
        }
        rows.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** REAL audio metadata: sample rate / channels / frame count / duration
    * parsed from the actual bytes for the JDK's own containers (WAV/AIFF/
    * AU) — the audio twin of [[decodeBatch]]'s `ImageIO` branch, at the
    * same partition-parallel seam. Bytes no JVM parser accepts (mp3/ogg —
    * the container ships no such codec) take the clearly-marked STUB
    * branch where a JNI decoder would slot in.
    */
  def decodeAudioBatch(spark: SparkSession, withPayload: DataFrame,
                       idCol: String = "doc_id"): Dataset[AudioMeta] = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val h = graft.functions.Fingerprint64.hashBytes(bytes)
          val magic = bytes.take(2).map(b => f"$b%02X").mkString
          val aff = readAudioFormat(bytes)
          if (aff != null) {
            val f = aff.getFormat
            val frames = aff.getFrameLength.toLong // NOT_SPECIFIED = -1
            val dur =
              if (frames >= 0 && f.getFrameRate > 0) frames / f.getFrameRate.toDouble
              else -1.0
            AudioMeta(id, bytes.length, magic, f.getSampleRate, f.getChannels, frames, dur, h)
          } else
            // STUB branch (non-JDK audio): deterministic pseudo-metadata.
            AudioMeta(id, bytes.length, magic, 8000f + bytes.length % 40000,
              bytes.length % 2 + 1, bytes.length.toLong, (bytes.length % 600) / 10.0, h)
        }
      }
  }

  /** REAL audio features: decode the PCM samples (not just the header)
    * via `AudioSystem.getAudioInputStream` and compute per-payload RMS
    * energy, peak amplitude, and zero-crossing rate — normalized to
    * [-1, 1] full scale, averaged across channels; plus duration. The
    * 4-dim `array<float>` is the shape a learned audio encoder would
    * emit, and the silence/energy numbers are the usual cheap filters
    * (drop silent or clipped clips) in a media curation pipeline. Rows
    * whose payload isn't signed 8/16-bit or unsigned 8-bit PCM that the
    * JDK can open are dropped (route them by [[decodeAudioBatch]]'s
    * metadata first). Partition-parallel, no
    * shuffle; samples stream through in chunks — nothing buffers a whole
    * clip.
    */
  def audioFeatures(spark: SparkSession, withPayload: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (ais == null) None
          else try {
            val f = ais.getFormat
            // decode path for the JDK containers: signed 8/16-bit PCM plus
            // unsigned 8-bit PCM (the standard 8-bit WAV encoding)
            val bits = f.getSampleSizeInBits
            val signed = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val unsigned8 = bits == 8 &&
              f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
            if (!(signed && (bits == 8 || bits == 16)) && !unsigned8) None
            else {
              val ch = f.getChannels
              val bytesPerSample = bits / 8
              val frameSize = f.getFrameSize
              val fullScale = if (bits == 8) 128.0 else 32768.0
              var sumSq = 0.0; var peak = 0.0; var crossings = 0L; var nFrames = 0L
              var lastSign = 0
              val buf = new Array[Byte](frameSize * 1024)
              var read = ais.read(buf)
              while (read > 0) {
                var off = 0
                while (off + frameSize <= read) {
                  // mean across channels -> one mono sample per frame
                  var s = 0.0
                  var c = 0
                  while (c < ch) {
                    val base = off + c * bytesPerSample
                    val v =
                      if (unsigned8) ((buf(base) & 0xff) - 128).toDouble
                      else if (bits == 8) buf(base).toDouble
                      else if (f.isBigEndian) ((buf(base) << 8) | (buf(base + 1) & 0xff)).toDouble
                      else ((buf(base + 1) << 8) | (buf(base) & 0xff)).toDouble
                    s += v; c += 1
                  }
                  s = s / ch / fullScale
                  sumSq += s * s
                  if (math.abs(s) > peak) peak = math.abs(s)
                  val sign = if (s > 0) 1 else if (s < 0) -1 else 0
                  if (sign != 0 && lastSign != 0 && sign != lastSign) crossings += 1
                  if (sign != 0) lastSign = sign
                  nFrames += 1
                  off += frameSize
                }
                read = ais.read(buf)
              }
              if (nFrames == 0) None
              else {
                val rms = math.sqrt(sumSq / nFrames)
                val zcr = crossings.toDouble / nFrames
                val dur = nFrames / f.getFrameRate.toDouble
                Some((id, Array(rms.toFloat, peak.toFloat, zcr.toFloat, dur.toFloat)))
              }
            }
          } finally ais.close()
        }
      }.toDF(idCol, "features")
  }

  /** REAL image resize: decode via `ImageIO`, scale the long side to
    * `maxSide` (aspect preserved, bilinear), re-encode as PNG. Runs
    * partition-parallel with no shuffle; images already inside the box
    * pass through byte-identical (no decode-recode churn), non-image
    * payloads pass through with (-1, -1) dimensions so callers can route
    * them to a different decoder.
    */
  def resizeImages(spark: SparkSession, withPayload: DataFrame, maxSide: Int,
                   idCol: String = "doc_id"): Dataset[MediaPayload] = {
    require(maxSide >= 1, s"maxSide must be positive, got $maxSide")
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) MediaPayload(id, bytes, -1, -1)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = maxSide.toDouble / math.max(w, h)
            if (scale >= 1.0) MediaPayload(id, bytes, w, h)
            else {
              val nw = math.max(1, math.round(w * scale).toInt)
              val nh = math.max(1, math.round(h * scale).toInt)
              val out = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val bos = new ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              MediaPayload(id, bos.toByteArray, nw, nh)
            }
          }
        }
      }
  }

  /** REAL pixel features: per-channel means (RGB, normalized to [0,1]),
    * aspect ratio, and an 8-bin luminance histogram — a 12-dim
    * `array<float>` per image, the shape a learned encoder would emit.
    * Rows whose payload doesn't decode are dropped (route them by
    * [[decodeBatch]]'s metadata first).
    */
  def imageFeatures(spark: SparkSession, withPayload: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0.0, 0.0, 0.0)
            val hist = new Array[Long](8)
            // bulk row fetch: one color-model conversion per ROW, not the
            // per-pixel getRGB(x, y) call path (bounds check + conversion
            // per pixel — dominant at media scale)
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              var x = 0
              while (x < w) {
                val rgb = rowBuf(x)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                sr += r; sg += g; sb += b
                // ITU-R BT.601 luma, binned to 8
                hist(((r * 299 + g * 587 + b * 114) / 1000) >> 5) += 1L
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h).toDouble
            val feats = Array(
              (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
              (w.toDouble / h).toFloat) ++ hist.map(c => (c / n).toFloat)
            Some((id, feats))
          }
        }
      }.toDF(idCol, "features")
  }

  /** 64-bit perceptual average-hash (aHash) of each image payload: decode
    * (real `ImageIO`), downscale to 8×8 grayscale, threshold each cell by
    * the mean — near-identical images differ in a few bits, so Hamming
    * distance is a visual-similarity metric. Non-image payloads are
    * dropped (they have no visual identity). Partition-parallel decode at
    * the same `mapPartitions` seam as [[decodeBatch]].
    */
  def averageHash64(spark: SparkSession, withPayload: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) None
          else {
            val small = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val g = small.createGraphics()
            try {
              g.drawImage(img, 0, 0, 8, 8, null)
            } finally g.dispose()
            val px = new Array[Int](64)
            small.getRaster.getPixels(0, 0, 8, 8, px)
            val mean = px.sum / 64.0
            var bits = 0L
            var i = 0
            while (i < 64) {
              if (px(i) >= mean) bits |= (1L << i)
              i += 1
            }
            Some((id, bits))
          }
        }
      }.toDF(idCol, "ahash")
  }

  /** Near-duplicate IMAGE pairs by perceptual-hash Hamming distance —
    * the multimodal twin of text SimHash dedup, riding the exact same
    * 16-bit-chunk bucket machinery (exhaustive for hamming ≤ 3: three
    * flipped bits cannot touch all four chunks). Visually re-encoded or
    * slightly-retouched copies land within a few bits; unrelated images
    * are ~32 bits apart.
    */
  def imageNearDupPairs(spark: SparkSession, withPayload: DataFrame,
                        idCol: String = "doc_id", maxHamming: Int = 3,
                        maxBucket: Int = 1000): DataFrame = {
    val hashes = averageHash64(spark, withPayload, idCol)
    graft.ops.Dedup.simHashPairs(hashes, idCol = idCol, textCol = idCol,
      maxHamming = maxHamming, maxBucket = maxBucket,
      sig = Some(col("ahash")))
  }
}
