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

  // --- REAL video frame decode (MJPEG-in-AVI — RIFF walk + JDK JPEG) -------

  /** Minimal valid MJPEG AVI: RIFF(AVI ){ LIST(hdrl){ avih, LIST(strl){
    * strh(vids/MJPG), strf } }, LIST(movi){ 00dc* } }. Little-endian sizes,
    * even-padded chunks — built independently of the parser under test.
    */
  private def miniAvi(frames: Seq[Array[Byte]], microsPerFrame: Int, w: Int, h: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = le(8 + payload.length + pad)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", (le(4).put(kind.getBytes("US-ASCII")).array() ++ children))
    val avih = {
      val b = le(56)
      b.putInt(microsPerFrame).putInt(0).putInt(0).putInt(0)
      b.putInt(frames.length) // dwTotalFrames
      b.putInt(0).putInt(1).putInt(0)
      b.putInt(w).putInt(h)
      b.array()
    }
    val strh = {
      val b = le(56)
      b.put("vids".getBytes).put("MJPG".getBytes)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(microsPerFrame).putInt(1000000) // dwScale/dwRate
      b.putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      b.putLong(0) // rcFrame
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = le(40)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.put("MJPG".getBytes).putInt(w * h * 3)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    le(8 + body.length).put("RIFF".getBytes).putInt(body.length).put(body).array()
  }

  private lazy val clipFrames = (0 until 10).map(s => encodeBytes(testImage(32, 16, seed = s), "jpg"))
  // 10 frames at 100 ms each = 1 s clip
  private lazy val clip = miniAvi(clipFrames, microsPerFrame = 100000, w = 32, h = 16)

  test("probeAviMeta parses the RIFF header facts and indexes every frame chunk") {
    val meta = Multimodal.probeAviMeta(clip).get
    meta.microsPerFrame shouldBe 100000L
    meta.totalFrames shouldBe 10
    meta.width shouldBe 32
    meta.height shouldBe 16
    meta.handler shouldBe "MJPG"
    meta.durationMs shouldBe 1000L
    meta.frameChunks.length shouldBe 10
    // refusals: non-AVI, truncated mid-chunk, null
    Multimodal.probeAviMeta("RIFFxxxxWAVE".getBytes("US-ASCII")) shouldBe None
    Multimodal.probeAviMeta(java.util.Arrays.copyOf(clip, clip.length - 7)) shouldBe None
    Multimodal.probeAviMeta(null) shouldBe None
  }

  test("decodeAviFrame decodes the SAME pixels as a standalone decode of that frame's JPEG") {
    val meta = Multimodal.probeAviMeta(clip).get
    for (i <- Seq(0, 4, 9))
      Multimodal.decodeAviFrame(meta, clip, i).get shouldBe Multimodal.decodeImage(clipFrames(i)).get
    Multimodal.decodeAviFrame(meta, clip, 10) shouldBe None
  }

  test("videoFrameFeatures samples frames by clip time and decodes only those") {
    val media = Seq((7L, clip)).toDF("media_id", "payload")
      .select($"media_id", $"payload",
        struct(lit("video").as("kind"), lit(32).as("width"), lit(16).as("height"),
          lit(0).as("sample_rate_hz"), lit(1000L).as("duration_ms")).as("meta"))
    val out = Multimodal.videoFrameFeatures(media, everyMs = 300).orderBy("frame_idx").collect()
    // 0, 300, 600, 900 ms -> frames 0, 3, 6, 9
    out.map(_.getAs[Int]("frame_idx")).toSeq shouldBe Seq(0, 3, 6, 9)
    out.map(_.getAs[Long]("frame_ms")).toSeq shouldBe Seq(0L, 300L, 600L, 900L)
    out.foreach { r =>
      val idx = r.getAs[Int]("frame_idx")
      r.getAs[scala.collection.Seq[Float]]("features").toArray shouldBe
        Multimodal.decodeImage(clipFrames(idx)).get
    }
    // a non-AVI payload contributes no frame rows (decoder, not stand-in)
    val mixed = media.union(
      Seq((8L, "not a clip".getBytes("UTF-8"))).toDF("media_id", "payload")
        .select($"media_id", $"payload",
          struct(lit("video").as("kind"), lit(0).as("width"), lit(0).as("height"),
            lit(0).as("sample_rate_hz"), lit(0L).as("duration_ms")).as("meta")))
    Multimodal.videoFrameFeatures(mixed, everyMs = 300)
      .select("media_id").distinct().as[Long].collect().toSeq shouldBe Seq(7L)
  }

  test("decode() routes MJPEG AVI to real frame decode, not the byte histogram") {
    val feats = Multimodal.decodeVideo(clip).get
    // clip-level features = mean of the sampled per-frame luminance grids
    val meta = Multimodal.probeAviMeta(clip).get
    val grids = (0 until 10).map(i => Multimodal.decodeAviFrame(meta, clip, i).get)
    val mean = (0 until Multimodal.FeatureDim).map(c => grids.map(_(c)).sum / grids.length).toArray
    feats.zip(mean).foreach { case (a, b) => a shouldBe b +- 1e-5f }
    // the full decode chain picks the video path for AVI bytes
    val viaChain = Multimodal.extractFeatures(
      Seq((1L, clip)).toDF("media_id", "payload")
        .select($"media_id", $"payload",
          struct(lit("video").as("kind"), lit(32).as("width"), lit(16).as("height"),
            lit(0).as("sample_rate_hz"), lit(1000L).as("duration_ms")).as("meta")))
      .select("features").head().getAs[scala.collection.Seq[Float]](0).toArray
    viaChain shouldBe feats
    viaChain should not be Multimodal.decodeStub(clip)
  }

  test("videoMeta recognizes AVI containers alongside MP4") {
    val media = Seq((1L, miniMp4(600, 54000, 640, 360)), (2L, clip))
      .toDF("media_id", "payload")
      .select($"media_id", $"payload",
        struct(lit("video").as("kind"), lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sample_rate_hz"), lit(0L).as("duration_ms")).as("meta"))
    val out = Multimodal.videoMeta(media).orderBy("media_id")
      .as[(Long, Long, Int, Int)].collect().toSeq
    out shouldBe Seq((1L, 90000L, 640, 360), (2L, 1000L, 32, 16))
  }
}
