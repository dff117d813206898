package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed via iterator-batched
  * `mapPartitions` (the Scala analog of Python's `mapInPandas` — one
  * partition streams through a reusable decoder without materializing the
  * partition).
  *
  * Image payloads are decoded FOR REAL via the JDK's `javax.imageio`
  * (PNG/JPEG/GIF/BMP — zero external media libraries) into a perceptual
  * mean-luminance thumbnail ([[decodeImage]]); audio payloads FOR REAL via
  * `javax.sound.sampled` (WAV/PCM/AU — also JDK-built-in) into windowed
  * RMS-energy features ([[decodeAudio]]); MJPEG-in-AVI video payloads FOR
  * REAL via a RIFF container walk + per-frame `javax.imageio` JPEG decode
  * ([[decodeVideo]], [[videoFrameFeatures]]); animated-GIF clips FOR REAL
  * via the pure-Scala INTER-FRAME decoder [[Gif]] (LZW + disposal
  * compositing — frame N depends on frames 0..N-1, validated against the
  * JDK's independent GIF encoder in MultimodalSpec) — inter-frame codecs
  * the JDK genuinely lacks (H.264 etc.) fall back to the deterministic
  * byte-histogram stand-in ([[decodeStub]]). Either way the Spark-side contract is
  * identical: schema, encoder, batch shape, null-payload handling, and
  * partition-local decoder reuse are what any production codec plugs into.
  *
  * Scale posture: payloads never shuffle — decode/feature-extract runs
  * map-side where the scan happens; only the small fixed-width feature
  * vectors flow downstream. Keep media tables partitioned so one partition's
  * payload batch fits executor memory (driver fixture ~binary rows <<
  * spark.sql.files.maxPartitionBytes).
  */
object Multimodal {

  /** Typed media metadata carried next to the opaque payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate_hz", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", mediaMetaSchema, nullable = false)))

  val FeatureDim = 8

  /** Build a synthetic media table from the documents fixture: text bytes
    * become the opaque payload, metadata derives deterministically from the
    * id. Stands in for `spark.read.format("binaryFile")` over a media lake.
    */
  def packFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate_hz"),
        (col("doc_id") % 10000).as("duration_ms")).as("meta"))

  /** Real image decode: `ImageIO.read` over the payload bytes (PNG/JPEG/
    * GIF/BMP via the JDK's built-in codecs), reduced to a `FeatureDim`-cell
    * (4 x 2) mean-luminance grid normalized to [0, 1] — the thumbnail stage
    * of the aHash perceptual-hash family. The grid averages ~W*H/8 pixels
    * per cell, so it is stable under lossy recompression (JPEG round-trip
    * noise averages out) while distinct content diverges; cosine over the
    * grids feeds the same LSH machinery the text/embedding paths use.
    * Returns None when the bytes are not a decodable image (no magic-number
    * match), letting [[decode]] fall back to the byte-histogram stand-in.
    */
  private[ops] def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(lumaGrid(img))
    } catch { case _: Exception => None }
  }

  /** The shared thumbnail reduction: a decoded frame to the `FeatureDim`-cell
    * (4 x 2) mean-luminance grid in [0, 1]. Used by both the still-image and
    * the per-video-frame decode paths so image and video features live in the
    * same space (a video of a still image featurizes like the image).
    */
  private def lumaGrid(img: java.awt.image.BufferedImage): Array[Float] = {
    val cols = 4
    val rows = FeatureDim / cols
    val sums = new Array[Double](FeatureDim)
    val counts = new Array[Long](FeatureDim)
    var y = 0
    while (y < img.getHeight) {
      val cy = math.min(rows - 1, y * rows / img.getHeight)
      var x = 0
      while (x < img.getWidth) {
        val cx = math.min(cols - 1, x * cols / img.getWidth)
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val c = cy * cols + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      out(i) = if (counts(i) == 0) 0.0f else (sums(i) / (255.0 * counts(i))).toFloat
      i += 1
    }
    out
  }

  /** Real audio decode: `javax.sound.sampled.AudioSystem` over the payload
    * bytes (WAV/PCM/AU/AIFF via the JDK's built-in codecs), converted to
    * 16-bit signed PCM, channel-mixed to mono, and reduced to `FeatureDim`
    * time-proportional windows of RMS energy normalized to [0, 1].
    *
    * The features are deliberately invariant to the two mutations a media
    * pipeline most often re-ingests: RESAMPLING (windows are fractions of
    * the clip, not fixed sample counts, so the same sound at 8 kHz and
    * 16 kHz yields ~identical window energies) and REQUANTIZATION (8-bit
    * vs 16-bit normalize to the same amplitude scale, quantization noise
    * averages out in the RMS), so a re-encoded duplicate verifies at
    * cos ~ 1 through the same LSH machinery the image path feeds.
    * Returns None when the bytes carry no recognizable audio header,
    * letting [[decode]] fall through.
    */
  private[ops] def decodeAudio(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val base = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val src = base.getFormat
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, base)
        try {
          val bytes = pcm.readAllBytes()
          val channels = target.getChannels
          val frameBytes = channels * 2
          val nFrames = bytes.length / frameBytes
          if (nFrames <= 0) return None
          // channel-mixed mono samples in [-1, 1]
          val mono = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            var sum = 0.0
            var c = 0
            while (c < channels) {
              val o = f * frameBytes + c * 2
              val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
              sum += s / 32768.0
              c += 1
            }
            mono(f) = sum / channels
            f += 1
          }
          // time-proportional windowed RMS (same index math as the image
          // grid cells, so short clips distribute remainder frames evenly)
          val sumSq = new Array[Double](FeatureDim)
          val counts = new Array[Long](FeatureDim)
          var i = 0
          while (i < nFrames) {
            val w = math.min(FeatureDim - 1, i * FeatureDim / nFrames)
            sumSq(w) += mono(i) * mono(i)
            counts(w) += 1
            i += 1
          }
          val out = new Array[Float](FeatureDim)
          var j = 0
          while (j < FeatureDim) {
            out(j) = if (counts(j) == 0) 0.0f else math.sqrt(sumSq(j) / counts(j)).toFloat
            j += 1
          }
          Some(out)
        } finally pcm.close()
      } finally base.close()
    } catch { case _: Exception => None }
  }

  /** Non-image, non-audio fallback: a deterministic byte histogram folded
    * to `FeatureDim` floats — the stand-in for the video codecs the JDK
    * does not ship. Keeps every payload featurizable so the distributed
    * plumbing (schema in/out, batching, nulls) is exercised uniformly.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        acc((payload(i) & 0xff) % FeatureDim) += 1.0f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      var j = 0
      while (j < FeatureDim) { acc(j) /= n; j += 1 }
    }
    acc
  }

  /** Full decode: real video decode (MJPEG-AVI; multi-frame GIF) first —
    * an animated GIF must featurize as a CLIP (mean over frames), not as
    * its first frame, and `ImageIO.read` would otherwise claim it — then
    * real image decode, then real audio decode; byte-histogram fallback
    * only for payloads no reachable codec recognizes (e.g. H.264 video).
    * Codec sniffing is by content (magic numbers), not metadata, so
    * mislabeled rows still decode correctly.
    */
  private[ops] def decode(payload: Array[Byte]): Array[Float] =
    decodeVideo(payload)
      .orElse(decodeImage(payload))
      .orElse(decodeAudio(payload))
      .getOrElse(decodeStub(payload))

  private val featureRowSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Decode + feature-extract over a media table. Iterator-in/iterator-out:
    * decoder state lives per partition and streams rows — the same shape a
    * heavyweight codec or model session needs. Image and audio payloads get
    * the real JDK decodes; everything else the histogram fallback.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = Encoders.row(featureRowSchema)
    media.select(col("media_id"), col("payload"), col("meta.kind").as("kind"))
      .mapPartitions { rows =>
        // per-partition decoder/session init happens here
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val features = if (payload == null) null else decode(payload)
          Row(
            r.getAs[Long]("media_id"),
            r.getAs[String]("kind"),
            if (payload == null) 0L else payload.length.toLong,
            features)
        }
      }(enc)
  }

  /** Media near-dup: decoded feature vectors into the SAME LSH machinery
    * the text/embedding paths use ([[Similarity.lshBucketCandidates]]) —
    * bucket on hyperplane signatures, verify candidates with exact cosine.
    * Payloads never shuffle (decode is map-side; only FeatureDim floats
    * flow into the bucket join), and candidates come from an equi-join on
    * bucket keys, never all-pairs. For image payloads this is perceptual
    * dedup end to end: the ImageIO luminance grid is recompression-stable,
    * so a JPEG round-trip of the same picture lands in the same buckets and
    * verifies at cos ~ 1.
    */
  def nearDupMedia(media: DataFrame, bits: Int = 8, minCos: Double = 0.999): DataFrame = {
    val feats = extractFeatures(media)
      .filter(col("features").isNotNull)
      .select(col("media_id").as("vec_id"), col("features").as("v"))
    Similarity.lshBucketCandidates(feats, bits, FeatureDim)
      .filter(col("cos") >= minCos)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Caption-side feature vectors: the caption's UTF-8 bytes through the
    * SAME byte-histogram kernel the opaque-payload fallback uses
    * ([[decodeStub]]), so caption features and media features live in one
    * comparable space. This is the honest stub for the text encoder of a
    * CLIP-style dual-encoder (no model weights ship in this container);
    * production swaps the kernel for a real encoder behind `mapInPandas`
    * — every join, bucket, and scoring stage downstream is unchanged.
    * Same iterator-in/iterator-out shape as [[extractFeatures]] so
    * per-partition encoder sessions have a place to live.
    */
  def captionFeatures(
      captions: DataFrame,
      idCol: String = "caption_id",
      mediaCol: String = "media_id",
      textCol: String = "caption"): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(mediaCol, LongType, nullable = false),
      StructField("cfeat", ArrayType(FloatType, containsNull = false), nullable = true))))
    captions.select(col(idCol), col(mediaCol), encode(col(textCol), "UTF-8").as("_b"))
      .mapPartitions { rows =>
        rows.map { r =>
          val b = r.getAs[Array[Byte]]("_b")
          Row(r.getAs[Long](idCol), r.getAs[Long](mediaCol),
            if (b == null) null else decodeStub(b))
        }
      }(enc)
  }

  /** Caption↔media consistency scoring — the CLIP-score audit every
    * image/caption corpus runs before training (mislabeled pairs, swapped
    * captions, scraper drift): each caption is scored against ITS paired
    * media (`cos_pair`, the native vector_dot cosine) and against the
    * best LSH-retrieved media in the shared feature space (`best_cos`);
    * `consistent = cos_pair >= best_cos` — a caption whose best retrieval
    * beats its own pairing is exactly a candidate mislabel for review.
    *
    * Scale shape: decode and caption encoding are map-side
    * (iterator-in/iterator-out, payloads never shuffle — only
    * [[FeatureDim]] floats per row move); the paired score is a
    * media_id equi-join; retrieval candidates come from the hyperplane
    * bucket equi-join (shared planes on both sides, the x09/x11 LSH
    * family), with the media side's hot buckets capped at `maxBucket`
    * (the [[Similarity.bucketMemberPairs]] guard) so one featureless
    * blob cluster cannot emit a quadratic candidate wave. Nothing
    * data-sized broadcasts; no all-pairs stage anywhere (spec-pinned).
    *
    * Output: (caption_id, media_id, cos_pair, best_cos, consistent),
    * cosines rounded to 6 (the x08 convention). No DuckDB oracle is
    * possible — the driver fixtures ship no media table — so the
    * contract is spec-verified (CaptionConsistencySpec: planted swapped
    * captions are flagged, intact pairs score 1.0 and stay consistent).
    */
  def captionConsistency(
      media: DataFrame, captions: DataFrame,
      bits: Int = 8, maxBucket: Int = Dedup.ShingleDfCap): DataFrame = {
    val mf = extractFeatures(media).filter(col("features").isNotNull)
      .select(
        col("media_id"), col("features").as("mv"),
        Similarity.lshSignature(col("features"), bits, FeatureDim).as("bucket"),
        Similarity.norm(col("features"), FeatureDim).as("mn"))
    val cf = captionFeatures(captions).filter(col("cfeat").isNotNull)
      .select(
        col("caption_id"), col("media_id"), col("cfeat").as("cv"),
        Similarity.lshSignature(col("cfeat"), bits, FeatureDim).as("bucket"),
        Similarity.norm(col("cfeat"), FeatureDim).as("cn"))
    val paired = cf.join(mf.select(col("media_id"), col("mv"), col("mn")), "media_id")
      .select(col("caption_id"), col("media_id"),
        round(Similarity.cosineStatic(col("cv"), col("mv"), col("cn"), col("mn"), FeatureDim), 6)
          .as("cos_pair"))
    // hot-bucket cap on the media side (count-filter, not collect_list:
    // the retrieval join streams, so only the CAP decision needs the count)
    val cool = mf.groupBy(col("bucket")).agg(count(lit(1)).as("_bc"))
      .filter(col("_bc") <= maxBucket).select(col("bucket"))
    val best = cf.join(mf.join(cool, "bucket").select(
        col("bucket"), col("mv"), col("mn")), "bucket")
      .select(col("caption_id"),
        round(Similarity.cosineStatic(col("cv"), col("mv"), col("cn"), col("mn"), FeatureDim), 6)
          .as("cos"))
      .groupBy(col("caption_id")).agg(max(col("cos")).as("best_cos"))
    paired.join(best, Seq("caption_id"), "left")
      .select(col("caption_id"), col("media_id"), col("cos_pair"),
        coalesce(col("best_cos"), col("cos_pair")).as("best_cos"))
      .withColumn("consistent",
        (col("cos_pair") >= col("best_cos")).cast("int"))
      .orderBy(col("caption_id"))
  }

  /** Parsed MP4 container facts (no codec needed — pure box walking). */
  case class VideoMeta(duration_ms: Long, width: Int, height: Int)

  /** Real MP4/ISO-BMFF container metadata probe: walks the box structure
    * (`[size][type][payload]`, sizes big-endian) to `moov/mvhd` for
    * timescale + duration and `moov/trak/tkhd` for track dimensions
    * (16.16 fixed point). This is the honest middle ground for video:
    * the JDK ships no video CODEC (frame decode stays the byte-histogram
    * stand-in), but container METADATA — what a catalog/dedup pipeline
    * actually filters and partitions on — needs no codec at all.
    * Returns None for payloads that are not ISO-BMFF. Version-0 and
    * version-1 (64-bit) mvhd/tkhd boxes both parse.
    */
  private[ops] def probeVideoMeta(payload: Array[Byte]): Option[VideoMeta] = {
    if (payload == null || payload.length < 16) return None
    def u32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def boxType(o: Int): String =
      new String(payload, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // top level must start with a well-formed box whose type is known ISO-BMFF
    if (!Set("ftyp", "moov", "mdat", "free", "styp").contains(boxType(0))) return None
    try {
      // walk [from, to) for a child box named `name`; returns payload
      // offset+size. size==1 means 64-bit extended size (16-byte header).
      def find(from: Int, to: Int, name: String): Option[(Int, Int)] = {
        var o = from
        while (o + 8 <= to) {
          var size = u32(o)
          var hdr = 8
          if (size == 1 && o + 16 <= to) { size = u64(o + 8); hdr = 16 }
          if (size < hdr || o.toLong + size > to) return None
          if (boxType(o) == name) return Some((o + hdr, (size - hdr).toInt))
          o += size.toInt
        }
        None
      }
      val (moov, moovLen) = find(0, payload.length, "moov").getOrElse(return None)
      val (mvhd, _) = find(moov, moov + moovLen, "mvhd").getOrElse(return None)
      val version = payload(mvhd) & 0xff
      val (timescale, duration) =
        if (version == 1) (u32(mvhd + 4 + 16), u64(mvhd + 4 + 20))
        else (u32(mvhd + 4 + 8), u32(mvhd + 4 + 12))
      if (timescale == 0) return None
      val durationMs = duration * 1000L / timescale
      // first track's dimensions (width/height are the LAST 8 bytes of tkhd,
      // 16.16 fixed — stable across tkhd versions)
      val dims = find(moov, moov + moovLen, "trak").flatMap { case (trak, trakLen) =>
        find(trak, trak + trakLen, "tkhd").map { case (tkhd, tkhdLen) =>
          (u32(tkhd + tkhdLen - 8) >> 16, u32(tkhd + tkhdLen - 4) >> 16)
        }
      }
      val (w, h) = dims.getOrElse((0L, 0L))
      Some(VideoMeta(durationMs, w.toInt, h.toInt))
    } catch { case _: Exception => None }
  }

  // --- AVI/MJPEG: REAL video frame decode, pure JDK --------------------------
  //
  // The JDK ships no inter-frame video codec (H.264/VP9/MPEG are out of
  // reach without external libraries), but Motion-JPEG needs none: every
  // frame of an MJPEG stream is a standalone JPEG, and `javax.imageio`
  // decodes JPEG. So for MJPEG-in-AVI — a format real capture pipelines
  // still emit — frame decode is REAL here: a RIFF container walk locates
  // the `movi` frame chunks, and each sampled frame decodes through the
  // same `lumaGrid` reduction the still-image path uses. Other codecs
  // still fall back to the labeled byte-histogram stand-in.

  /** Parsed AVI container facts from `avih` (+ first video `strh`). */
  private[ops] case class AviMeta(
      microsPerFrame: Long, totalFrames: Int, width: Int, height: Int,
      handler: String, frameChunks: IndexedSeq[(Int, Int)]) {
    def durationMs: Long = microsPerFrame * totalFrames / 1000L
  }

  /** RIFF/AVI walk: header facts plus the (offset, length) of every stream-0
    * video frame chunk (`00dc`/`00db`) inside the `movi` list — an in-memory
    * frame index, so sampled decode seeks straight to the frames it needs
    * and never JPEG-decodes the rest. RIFF sizes are little-endian (unlike
    * ISO-BMFF); chunks pad to even offsets. Returns None for non-AVI bytes
    * or a malformed chunk tree.
    */
  private[ops] def probeAviMeta(payload: Array[Byte]): Option[AviMeta] = {
    if (payload == null || payload.length < 24) return None
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    try {
      // find a child: plain chunk by id, or LIST by its list-type
      def find(from: Int, to: Int, name: String): Option[(Int, Int)] = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(o)
          val size = u32(o + 4)
          if (o.toLong + 8 + size > to) return None
          if (id == name) return Some((o + 8, size.toInt))
          if (id == "LIST" && size >= 4 && fourcc(o + 8) == name)
            return Some((o + 12, size.toInt - 4))
          o += 8 + size.toInt + (size.toInt & 1) // RIFF even padding
        }
        None
      }
      val end = math.min(payload.length.toLong, 8L + u32(4)).toInt
      val (hdrl, hdrlLen) = find(12, end, "hdrl").getOrElse(return None)
      val (avih, avihLen) = find(hdrl, hdrl + hdrlLen, "avih").getOrElse(return None)
      if (avihLen < 40) return None
      val mpf = u32(avih)
      val totalFrames = u32(avih + 16).toInt
      val w = u32(avih + 32).toInt
      val h = u32(avih + 36).toInt
      val handler = find(hdrl, hdrl + hdrlLen, "strl")
        .flatMap { case (strl, strlLen) => find(strl, strl + strlLen, "strh") }
        .collect { case (strh, len) if len >= 8 && fourcc(strh) == "vids" => fourcc(strh + 4) }
        .getOrElse("")
      val (movi, moviLen) = find(12, end, "movi").getOrElse(return None)
      val frames = IndexedSeq.newBuilder[(Int, Int)]
      var o = movi
      while (o + 8 <= movi + moviLen) {
        val id = fourcc(o)
        val size = u32(o + 4).toInt
        if (size < 0 || o + 8 + size > movi + moviLen) return None
        if (id == "00dc" || id == "00db") frames += ((o + 8, size))
        o += 8 + size + (size & 1)
      }
      Some(AviMeta(mpf, totalFrames, w, h, handler, frames.result()))
    } catch { case _: Exception => None }
  }

  /** Decode ONE frame of an MJPEG AVI by index — seeks via the frame chunk
    * table, JPEG-decodes just that chunk. None when the index is out of
    * range or the chunk bytes aren't a decodable JPEG.
    */
  private[ops] def decodeAviFrame(meta: AviMeta, payload: Array[Byte], idx: Int): Option[Array[Float]] = {
    if (idx < 0 || idx >= meta.frameChunks.length) return None
    val (off, len) = meta.frameChunks(idx)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload, off, len))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None else Some(lumaGrid(img))
    } catch { case _: Exception => None }
  }

  /** Clip-level features for an MJPEG AVI: the mean luminance grid over up
    * to 8 evenly-spaced frames (first frame always included). Lives in the
    * same feature space as [[decodeImage]], so image-vs-video near-dup
    * (a clip of a still vs the still itself) works through the same LSH
    * machinery. None for non-AVI payloads or when no frame decodes.
    */
  private[ops] def decodeVideo(payload: Array[Byte]): Option[Array[Float]] =
    probeAviMeta(payload).flatMap { meta =>
      val n = meta.frameChunks.length
      if (n == 0) None
      else {
        val step = math.max(1, n / 8)
        meanGrid((0 until n by step).flatMap(decodeAviFrame(meta, payload, _)))
      }
    }.orElse(decodeGifVideo(payload))

  /** Clip-level features for a multi-frame GIF: mean luma grid over up to
    * 8 evenly-spaced composited frames — ONE sequential inter-frame pass
    * ([[Gif.decodeFrames]]). Single-frame GIFs return None so the still-
    * image path ([[decodeImage]]) handles them as images.
    */
  private def decodeGifVideo(payload: Array[Byte]): Option[Array[Float]] =
    Gif.probe(payload).filter(_.frames.length > 1).flatMap { meta =>
      val n = meta.frames.length
      val step = math.max(1, n / 8)
      val want = (0 until n by step).toSet
      meanGrid(Gif.decodeFrames(payload, meta, want).map(f => lumaGrid(f._2)).toSeq)
    }

  private def meanGrid(grids: Seq[Array[Float]]): Option[Array[Float]] =
    if (grids.isEmpty) None
    else {
      val acc = new Array[Float](FeatureDim)
      grids.foreach { g => var i = 0; while (i < FeatureDim) { acc(i) += g(i); i += 1 } }
      var i = 0
      while (i < FeatureDim) { acc(i) /= grids.length; i += 1 }
      Some(acc)
    }

  private val frameFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_ms", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** REAL frame-sampled video decode: for every MJPEG-AVI or animated-GIF
    * payload, decode one frame per `everyMs` of clip time (the executable
    * counterpart of [[frameSamplePlan]], which only plans timestamps).
    * Map-side only; only FeatureDim floats per frame flow downstream. The
    * two formats sample differently because their dependency structure
    * differs: AVI's frame index makes each sampled frame an independent
    * single-chunk JPEG decode (skipped frames cost nothing), while GIF's
    * inter-frame compositing decodes the chain once sequentially and
    * emits at the sampled indices (skipped frames cost decode but no
    * copy). Other payloads yield no rows (they have no decodable
    * frames), keeping this an honest decoder, not a stand-in.
    */
  def videoFrameFeatures(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    val enc = Encoders.row(frameFeatureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val mediaId = r.getAs[Long]("media_id")
          probeAviMeta(payload) match {
            case Some(meta) =>
              val mpf = math.max(meta.microsPerFrame, 1L)
              Iterator.iterate(0L)(_ + everyMs)
                .takeWhile(ms => ms < meta.durationMs || ms == 0L)
                .map(ms => (ms, math.min((ms * 1000L / mpf).toInt, meta.frameChunks.length - 1)))
                .distinctBy(_._2)
                .flatMap { case (ms, idx) =>
                  decodeAviFrame(meta, payload, idx).map(g =>
                    Row(mediaId, idx, ms, g))
                }.toSeq
            case None =>
              Gif.probe(payload).filter(_.frames.length > 1).toSeq.flatMap { g =>
                val samples = Iterator.iterate(0L)(_ + everyMs)
                  .takeWhile(ms => ms < g.durationMs || ms == 0L)
                  .map(ms => (ms, g.frameAt(ms)))
                  .distinctBy(_._2).toVector
                val wanted = samples.map(_._2).toSet
                val imgs = Gif.decodeFrames(payload, g, wanted).toMap
                samples.flatMap { case (ms, idx) =>
                  imgs.get(idx).map(img => Row(mediaId, idx, ms, lumaGrid(img)))
                }
              }
          }
        }
      }(enc)
  }

  /** Container-metadata extraction over a media table: (media_id,
    * duration_ms, width, height) for every payload with a parseable
    * ISO-BMFF or RIFF/AVI structure. Map-side only (same mapPartitions
    * shape as [[extractFeatures]]); payloads never shuffle.
    */
  def videoMeta(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = Encoders.row(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          probeVideoMeta(payload)
            .orElse(probeAviMeta(payload).map(a => VideoMeta(a.durationMs, a.width, a.height)))
            .orElse(Gif.probe(payload).filter(_.frames.length > 1)
              .map(g => VideoMeta(g.durationMs, g.width, g.height)))
            .map(m => Row(r.getAs[Long]("media_id"), m.duration_ms, m.width, m.height))
        }
      }(enc)
  }

  /** Metadata-only resize: scales target dimensions without touching
    * payloads (a real resize would re-encode in the same mapPartitions
    * shape as extractFeatures).
    */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      least(lit(maxW.toDouble) / col("meta.width"), lit(maxH.toDouble) / col("meta.height")))
    media.select(
      col("media_id"), col("payload"), col("meta"),
      floor(col("meta.width") * scale).cast("int").as("target_width"),
      floor(col("meta.height") * scale).cast("int").as("target_height"))
  }

  /** Frame sampling plan for video rows: one row per sampled frame
    * timestamp at `everyMs` — a generator (explode) over the metadata,
    * payload untouched until a decoder consumes (media_id, frame_ms).
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("meta.kind") === "video" && col("meta.duration_ms") > 0)
      .select(
        col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))).as("frame_ms"))
}
