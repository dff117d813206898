package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Multimodal plumbing: binary payload round-trip, iterator-batched feature
  * extraction (stub decoder), null handling, and the resize/frame-sample
  * plans.
  */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, ""), (4L, "frame sample me"))
    .toDF("doc_id", "text")

  test("packFromDocuments produces the typed media schema") {
    val media = Multimodal.packFromDocuments(docs)
    media.schema.fieldNames.toSeq shouldBe Seq("media_id", "payload", "meta")
    media.schema("payload").dataType.typeName shouldBe "binary"
    val kinds = media.select("meta.kind").as[String].collect().toSet
    kinds.subsetOf(Set("image", "audio", "video")) shouldBe true
    // payload round-trips the source bytes
    val p = media.filter($"media_id" === 0).select($"payload").head().getAs[Array[Byte]](0)
    new String(p, "UTF-8") shouldBe "hello world"
  }

  test("extractFeatures: deterministic stub features, byte counts, null payloads survive") {
    val media = Multimodal.packFromDocuments(docs)
      .withColumn("payload", when($"media_id" === 1, lit(null).cast("binary")).otherwise($"payload"))
    val out = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    out.length shouldBe 4
    val first = out.head
    first.getAs[Long]("n_bytes") shouldBe 11L
    val feats = first.getAs[scala.collection.Seq[Float]]("features")
    feats.length shouldBe Multimodal.FeatureDim
    feats.map(_.toDouble).sum shouldBe 1.0 +- 1e-5 // normalized histogram
    // matches the driver-side stub exactly (same bytes -> same features)
    feats.toArray shouldBe Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    // null payload -> null features, 0 bytes, row retained
    val nullRow = out(1)
    nullRow.getAs[Long]("n_bytes") shouldBe 0L
    nullRow.getAs[scala.collection.Seq[Float]]("features") shouldBe null
  }

  test("resizePlan never upscales and preserves aspect ratio direction") {
    val media = Multimodal.packFromDocuments(docs)
    val out = Multimodal.resizePlan(media, maxW = 64, maxH = 64).collect()
    out.foreach { r =>
      r.getAs[Int]("target_width") should be <= 64
      r.getAs[Int]("target_height") should be <= 64
      r.getAs[Int]("target_width") should be <= r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width")
    }
  }

  test("nearDupMedia: identical payloads pair via LSH buckets; distinct byte content does not") {
    // Crafted payloads with near-orthogonal byte histograms: 1 and 2 are
    // byte-identical (cos = 1); 3 shares only the space bin with them.
    val media = Seq(
      (1L, "aaaa aaaa aaaa"), (2L, "aaaa aaaa aaaa"), (3L, "bbbb bbbb bbbb"))
      .toDF("doc_id", "text")
      .select(
        $"doc_id".as("media_id"), encode($"text", "UTF-8").as("payload"),
        struct(lit("image").as("kind"), lit(4).as("width"), lit(4).as("height"),
          lit(16000).as("sample_rate_hz"), lit(0L).as("duration_ms")).as("meta"))
    val pairs = Multimodal.nearDupMedia(media)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  // --- real image decode (JDK ImageIO — no external media libs) -----------

  /** Deterministic test image: a horizontal luminance gradient with a
    * per-image phase so distinct `seed`s give distinct grids.
    */
  private def testImage(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val lum = ((x * 255 / math.max(w - 1, 1)) + seed * 40) % 256
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeBytes(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  test("decodeImage: real PNG bytes decode to the pixel-derived luminance grid") {
    val img = testImage(32, 16, seed = 0)
    val png = encodeBytes(img, "png")
    val feats = Multimodal.decodeImage(png).get
    feats.length shouldBe Multimodal.FeatureDim
    // Recompute the 4x2 grid means directly from the BufferedImage — the
    // features must come from PIXELS, not from the encoded bytes.
    val expected = {
      val sums = new Array[Double](8); val counts = new Array[Long](8)
      for (y <- 0 until 16; x <- 0 until 32) {
        val cell = math.min(1, y * 2 / 16) * 4 + math.min(3, x * 4 / 32)
        val rgb = img.getRGB(x, y)
        sums(cell) += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        counts(cell) += 1
      }
      (0 until 8).map(i => (sums(i) / (255.0 * counts(i))).toFloat)
    }
    feats.toSeq shouldBe expected
    // gradient: cells brighten left to right, top/bottom rows agree
    feats(0) should be < feats(3)
    feats(0) shouldBe feats(4)
    // and this is NOT the byte-histogram fallback
    feats.toSeq should not be Multimodal.decodeStub(png).toSeq
  }

  test("decode falls back to the byte histogram for non-image, non-audio payloads") {
    val textBytes = "not an image".getBytes("UTF-8")
    Multimodal.decodeImage(textBytes) shouldBe None
    Multimodal.decodeAudio(textBytes) shouldBe None
    Multimodal.decode(textBytes).toSeq shouldBe Multimodal.decodeStub(textBytes).toSeq
  }

  // --- real audio decode (JDK javax.sound.sampled — no external libs) ------

  /** Deterministic test clip: a sine carrier under an 8-step amplitude
    * staircase, so each RMS window has a distinct expected energy
    * (amp_w / sqrt(2)). `descending` flips the staircase for a
    * different-content clip.
    */
  private def testClip(n: Int, sampleRate: Float, descending: Boolean = false): Array[Double] =
    Array.tabulate(n) { i =>
      val w = math.min(7, i * 8 / n)
      val amp = if (descending) 0.8 - 0.1 * w else 0.1 + 0.1 * w
      amp * math.sin(2 * math.Pi * 440.0 * i / sampleRate)
    }

  /** Encode samples as a real WAV file: 16-bit signed or 8-bit unsigned
    * PCM, mono.
    */
  private def wavBytes(samples: Array[Double], sampleRate: Float, bits: Int): Array[Byte] = {
    import javax.sound.sampled._
    val data: Array[Byte] =
      if (bits == 16) {
        val b = new Array[Byte](samples.length * 2)
        var i = 0
        while (i < samples.length) {
          val s = math.max(-32768, math.min(32767, math.round(samples(i) * 32767).toInt))
          b(2 * i) = (s & 0xff).toByte
          b(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        b
      } else {
        samples.map(x => (math.round(math.max(-1.0, math.min(1.0, x)) * 127).toInt + 128).toByte)
      }
    val enc = if (bits == 16) AudioFormat.Encoding.PCM_SIGNED else AudioFormat.Encoding.PCM_UNSIGNED
    val fmt = new AudioFormat(enc, sampleRate, bits, 1, bits / 8, sampleRate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("decodeAudio: real WAV bytes decode to windowed RMS energies") {
    val wav = wavBytes(testClip(16000, 16000f), 16000f, bits = 16)
    val feats = Multimodal.decodeAudio(wav).get
    feats.length shouldBe Multimodal.FeatureDim
    // each window's RMS ~ amp_w / sqrt(2) for the staircase amplitudes
    for (w <- 0 until 8)
      feats(w).toDouble shouldBe ((0.1 + 0.1 * w) / math.sqrt(2.0)) +- 0.02
    // staircase: energies strictly increase window to window
    feats.sliding(2).foreach { case Array(a, b) => a should be < b }
    // decode() routes through the audio decoder, not the byte histogram
    Multimodal.decode(wav).toSeq shouldBe feats.toSeq
    Multimodal.decode(wav).toSeq should not be Multimodal.decodeStub(wav).toSeq
  }

  test("nearDupMedia: resampled + requantized audio dup pairs; different clip does not") {
    val original = wavBytes(testClip(16000, 16000f), 16000f, bits = 16)
    // the SAME sound re-ingested at half the sample rate and 8-bit depth
    val reEncoded = wavBytes(testClip(8000, 8000f), 8000f, bits = 8)
    val different = wavBytes(testClip(16000, 16000f, descending = true), 16000f, bits = 16)
    val media = Seq((1L, original), (2L, reEncoded), (3L, different))
      .toDF("media_id", "payload")
      .select(
        $"media_id", $"payload",
        struct(lit("audio").as("kind"), lit(0).as("width"), lit(0).as("height"),
          lit(16000).as("sample_rate_hz"), lit(1000L).as("duration_ms")).as("meta"))
    val pairs = Multimodal.nearDupMedia(media, minCos = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  test("nearDupMedia: JPEG-recompressed copy of a PNG pairs; a different image does not") {
    val a = testImage(64, 32, seed = 0)
    val media = Seq(
      (1L, encodeBytes(a, "png")), // original
      (2L, encodeBytes(a, "jpg")), // lossy recompression of the SAME pixels
      (3L, encodeBytes(testImage(64, 32, seed = 3), "png"))) // different content
      .toDF("media_id", "payload")
      .select(
        $"media_id", $"payload",
        struct(lit("image").as("kind"), lit(64).as("width"), lit(32).as("height"),
          lit(16000).as("sample_rate_hz"), lit(0L).as("duration_ms")).as("meta"))
    val pairs = Multimodal.nearDupMedia(media, minCos = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  // --- video container metadata (ISO-BMFF box walk — no codec needed) -----

  /** Minimal valid MP4: ftyp + moov{mvhd(v0), trak{tkhd(v0)}}. */
  private def miniMp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(512) // big-endian by default
    def box(name: String)(body: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val inner = java.nio.ByteBuffer.allocate(256)
      body(inner)
      val payload = java.util.Arrays.copyOf(inner.array(), inner.position())
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    val ftyp = box("ftyp")(b => b.put("isom".getBytes).putInt(512).put("isom".getBytes))
    val mvhd = box("mvhd") { b =>
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // ctime mtime
      b.putInt(timescale).putInt(duration)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate volume res
      (0 until 2).foreach(_ => b.putInt(0)) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt) // matrix
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2) // next_track_ID
    }
    val tkhd = box("tkhd") { b =>
      b.putInt(0) // version + flags
      b.putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration) // ctime mtime id res dur
      b.putInt(0).putInt(0) // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer alt volume res
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt) // matrix
      b.putInt(w << 16).putInt(h << 16) // 16.16 fixed dims
    }
    val trak = box("trak")(b => b.put(tkhd))
    val moov = box("moov") { b => b.put(mvhd).put(trak) }
    bb.put(ftyp).put(moov)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("probeVideoMeta parses duration and dimensions from a real MP4 box structure") {
    // 90 s at timescale 600, 640x360
    val mp4 = miniMp4(timescale = 600, duration = 54000, w = 640, h = 360)
    Multimodal.probeVideoMeta(mp4) shouldBe
      Some(Multimodal.VideoMeta(90000L, 640, 360))
    // non-BMFF payloads refuse cleanly
    Multimodal.probeVideoMeta("just text".getBytes("UTF-8")) shouldBe None
    Multimodal.probeVideoMeta(null) shouldBe None
  }

  test("videoMeta extracts container facts map-side; non-video rows drop out") {
    val media = Seq(
      (1L, miniMp4(600, 54000, 640, 360)),
      (2L, miniMp4(1000, 2500, 1920, 1080)),
      (3L, "not a video".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(
        $"media_id", $"payload",
        struct(lit("video").as("kind"), lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sample_rate_hz"), lit(0L).as("duration_ms")).as("meta"))
    val out = Multimodal.videoMeta(media).orderBy("media_id")
      .as[(Long, Long, Int, Int)].collect().toSeq
    out shouldBe Seq((1L, 90000L, 640, 360), (2L, 2500L, 1920, 1080))
  }

  test("frameSamplePlan explodes one row per sampled frame for video rows only") {
    val media = Multimodal.packFromDocuments(docs)
    val frames = Multimodal.frameSamplePlan(media, everyMs = 1000)
    val kinds = media.select($"media_id", $"meta.kind".as("kind"), $"meta.duration_ms".as("d"))
    val videoIds = kinds.filter($"kind" === "video" && $"d" > 0).select("media_id").as[Long].collect().toSet
    frames.select("media_id").distinct().as[Long].collect().toSet shouldBe videoIds
    // frame count = ceil(duration/1000) per video
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    kinds.filter($"kind" === "video" && $"d" > 0).as[(Long, String, Long)].collect().foreach {
      case (id, _, d) => counts(id) shouldBe (d + 999) / 1000
    }
  }
}
