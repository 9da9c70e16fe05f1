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

  /** A real PNG of the given size filled with one RGB color. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private lazy val images = Seq(
    (1L, png(40, 20, 0xff0000)), // red, landscape
    (2L, png(8, 32, 0x0000ff)),  // blue, portrait
    (3L, "definitely not an image".getBytes("UTF-8"))
  ).toDF("doc_id", "payload")

  test("decodeBatch reads REAL dimensions and bands from actual PNG bytes") {
    val metas = Multimodal.decodeBatch(spark, images).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).width == 40 && metas(1L).height == 20 && metas(1L).channels == 3)
    assert(metas(2L).width == 8 && metas(2L).height == 32 && metas(2L).channels == 3)
    assert(metas(1L).magic == "8950", "PNG signature bytes") //  P
    // the non-image payload takes the deterministic stub branch, not a crash
    assert(metas(3L).width == (metas(3L).n_bytes % 640 + 16))
  }

  test("resizeImages scales real pixels, preserves aspect, round-trips via ImageIO") {
    val out = Multimodal.resizeImages(spark, images, maxSide = 16)
      .collect().map(p => p.doc_id -> p).toMap
    assert(out(1L).width == 16 && out(1L).height == 8, "40x20 -> 16x8")
    assert(out(2L).width == 4 && out(2L).height == 16, "8x32 -> 4x16")
    // the resized payload is itself a decodable PNG of the new size
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).payload))
    assert(re.getWidth == 16 && re.getHeight == 8)
    // an all-red source stays red after bilinear resize
    assert((re.getRGB(8, 4) & 0xffffff) == 0xff0000)
    // non-image passes through untouched, flagged
    assert(out(3L).width == -1 && out(3L).payload.sameElements(
      "definitely not an image".getBytes("UTF-8")))
    // already-small images pass through byte-identical
    val small = Multimodal.resizeImages(spark, images, maxSide = 64)
      .collect().map(p => p.doc_id -> p).toMap
    assert(small(1L).payload.sameElements(
      images.where($"doc_id" === 1L).select("payload").as[Array[Byte]].head()))
  }

  test("imageFeatures computes real pixel statistics") {
    val feats = Multimodal.imageFeatures(spark, images)
      .as[(Long, Seq[Float])].collect().toMap
    assert(!feats.contains(3L), "non-images are dropped")
    val red = feats(1L)
    assert(red.length == 12)
    assert(math.abs(red(0) - 1.0f) < 1e-3 && red(1) < 1e-3 && red(2) < 1e-3,
      s"all-red image must have mean RGB ~ (1,0,0), got ${red.take(3)}")
    assert(math.abs(red(3) - 2.0f) < 1e-3, "aspect 40/20 = 2")
    // luminance of pure red = 76 (bin 2 of 8); histogram is a point mass
    assert(math.abs(red(4 + 2) - 1.0f) < 1e-3,
      s"red luma bin should hold all pixels: ${red.drop(4)}")
    val blue = feats(2L)
    assert(blue(2) > 0.999f && blue(0) < 1e-3 && math.abs(blue(3) - 0.25f) < 1e-3)
  }

  /** A real WAV container: `rate` Hz, `channels` channels, 16-bit PCM,
    * `frames` sample frames of silence.
    */
  private def wav(rate: Float, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A mono 16-bit WAV holding a sine wave of known amplitude/frequency. */
  private def sineWav(rate: Float, freq: Double, amplitude: Double,
                      seconds: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (amplitude * 32767.0 * math.sin(2 * math.Pi * freq * i / rate)).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFeatures computes real sample statistics from decoded PCM") {
    val audio = Seq(
      (1L, sineWav(8000f, 440.0, 0.5, 1.0)), // half-scale 440 Hz tone
      (2L, wav(8000f, 1, 8000)),             // 1 s of silence
      (3L, "not audio".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val feats = Multimodal.audioFeatures(spark, audio)
      .as[(Long, Seq[Float])].collect().toMap
    assert(!feats.contains(3L), "non-audio rows are dropped")
    val Seq(rms, peak, zcr, dur) = feats(1L).toSeq
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"sine RMS = A/sqrt(2), got $rms")
    assert(peak > 0.49f && peak <= 0.51f, s"sine peak = A, got $peak")
    // 440 cycles x 2 crossings over 8000 samples
    assert(math.abs(zcr - 2 * 440.0 / 8000) < 0.005, s"zcr 0.11, got $zcr")
    assert(math.abs(dur - 1.0) < 1e-3, s"duration 1 s, got $dur")
    val silent = feats(2L)
    assert(silent(0) == 0f && silent(1) == 0f && silent(2) == 0f,
      s"silence has zero energy/peak/crossings: $silent")
  }

  /** A mono UNSIGNED 8-bit WAV (the standard 8-bit WAV encoding) holding a
    * sine wave: sample = 128 + A·127·sin(·).
    */
  private def sineWavU8(rate: Float, freq: Double, amplitude: Double,
                        seconds: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, rate, 8, 1, 1, rate, false)
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n)
    var i = 0
    while (i < n) {
      data(i) = (128 + (amplitude * 127.0 * math.sin(2 * math.Pi * freq * i / rate)).toInt).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFeatures decodes unsigned 8-bit PCM (standard 8-bit WAV)") {
    val audio = Seq((1L, sineWavU8(8000f, 440.0, 0.5, 1.0)))
      .toDF("doc_id", "payload")
    val feats = Multimodal.audioFeatures(spark, audio)
      .as[(Long, Seq[Float])].collect().toMap
    val Seq(rms, peak, zcr, dur) = feats(1L).toSeq
    // 8-bit quantization is coarse: looser tolerances than the 16-bit spec
    assert(math.abs(rms - 0.5 * 127.0 / 128.0 / math.sqrt(2)) < 0.01,
      s"u8 sine RMS = A/sqrt(2), got $rms")
    assert(peak > 0.47f && peak <= 0.51f, s"u8 sine peak = A, got $peak")
    assert(math.abs(zcr - 2 * 440.0 / 8000) < 0.005, s"zcr 0.11, got $zcr")
    assert(math.abs(dur - 1.0) < 1e-3, s"duration 1 s, got $dur")
  }

  test("decodeAudioBatch reads REAL rate/channels/duration from actual WAV bytes") {
    val audio = Seq(
      (1L, wav(16000f, 2, 8000)),  // 0.5 s stereo
      (2L, wav(44100f, 1, 44100)), // 1 s mono
      (3L, "not audio at all".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val metas = Multimodal.decodeAudioBatch(spark, audio).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).sample_rate == 16000f && metas(1L).channels == 2
      && metas(1L).frames == 8000L)
    assert(math.abs(metas(1L).duration_sec - 0.5) < 1e-6)
    assert(metas(2L).sample_rate == 44100f && metas(2L).channels == 1)
    assert(math.abs(metas(2L).duration_sec - 1.0) < 1e-6)
    assert(metas(1L).magic == "5249", "RIFF signature bytes") // 'RI'
    // non-audio takes the deterministic stub branch, not a crash
    assert(metas(3L).channels == (metas(3L).n_bytes % 2 + 1))
    // decodeBatch routes the same bytes to real channel counts, no spatial dims
    val mixed = Multimodal.decodeBatch(spark, audio).collect()
      .map(m => m.doc_id -> m).toMap
    assert(mixed(1L).width == -1 && mixed(1L).height == -1 && mixed(1L).channels == 2)
  }

  /** A real PNG with per-pixel computed RGB (aHash needs structure — a
    * flat color image hashes degenerately).
    */
  private def patternPng(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, f(x, y)); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    frames.foreach(f => w.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), w.getDefaultWriteParam))
    w.endWriteSequence(); w.dispose(); ios.close()
    bos.toByteArray
  }

  private def solidFrame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  test("sampleFramesDecoded: REAL animated-GIF frames every Nth; stub branch for alien bytes") {
    val gif5 = animatedGif((0 until 5).map(i => solidFrame(8, 6, i * 0x111111)))
    val df = Seq((1L, gif5), (2L, "mp4-ish bytes with no jvm codec".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.sampleFramesDecoded(spark, df, everyN = 2).collect()
    val gifRows = rows.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(gifRows.map(_.frame_idx).toSeq == Seq(0, 2, 4),
      "every 2nd of 5 real frames")
    assert(gifRows.forall(r => r.container == "gif" && r.n_frames == 5 &&
      r.width == 8 && r.height == 6), s"real decoded dims, got ${gifRows.toSeq}")
    // frame content differs -> CRCs differ; decode is deterministic
    assert(gifRows.map(_.frame_crc).distinct.length == 3)
    val again = Multimodal.sampleFramesDecoded(spark, df, everyN = 2).collect()
      .filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(again.map(_.frame_crc).toSeq == gifRows.map(_.frame_crc).toSeq)
    // the codec-less payload takes the deterministic stub branch
    val stubRows = rows.filter(_.doc_id == 2L)
    assert(stubRows.nonEmpty && stubRows.forall(r =>
      r.container == "stub" && r.width == -1 && r.height == -1))
  }

  test("imageNearDupPairs: retouched copy found, unrelated image not, non-images dropped") {
    val grad = (x: Int, y: Int) => { val v = (x * 255 / 63) & 0xff; (v << 16) | (v << 8) | v }
    val gradTweaked = (x: Int, y: Int) =>
      if (x == 10 && y == 10) 0x777777 else grad(x, y)
    val inverse = (x: Int, y: Int) => { val v = 255 - ((x * 255 / 63) & 0xff); (v << 16) | (v << 8) | v }
    val imgs = Seq(
      (1L, patternPng(64, 64)(grad)),
      (2L, patternPng(64, 64)(gradTweaked)),
      (3L, patternPng(64, 64)(inverse)),
      (4L, "not an image at all".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    assert(Multimodal.averageHash64(spark, imgs).count() == 3) // non-image dropped
    val pairs = Multimodal.imageNearDupPairs(spark, imgs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
