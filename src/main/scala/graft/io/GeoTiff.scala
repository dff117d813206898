package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal GeoTIFF reader/writer for DEM statistics rasters — the raster
  * half of the reference's `writers.gdal` artifact `data/dem.tif` (a GDAL
  * GeoTIFF whose six float64 bands are the per-cell min/max/mean/idw/
  * count/stdev of elevation; no producing code survives in the reference
  * repo, only the committed artifact).
  *
  * Scope is deliberately the DEM-raster subset of TIFF 6.0 + GeoTIFF 1.1:
  *  - uncompressed strips (Compression=1), chunky or planar layout,
  *    IEEE-float samples (SampleFormat=3) of 32 or 64 bits;
  *  - georeferencing via ModelPixelScale + one ModelTiepoint (the GDAL
  *    affine-less form), CRS via GeoKeyDirectory key 2048 (geographic)
  *    or 3072 (projected);
  *  - GDAL band descriptions (tag 42112 XML) and GDAL_NODATA (42113).
  * Anything else — compression, tiles, palette, integer samples — fails
  * loudly with the offending tag value, same posture as EptSource's
  * unsupported-payload refusal.
  *
  * Scale posture (mirrors [[Raster]]): a DEM grid is bounded by the
  * RESOLUTION choice, not the point count — the distributed work (the
  * per-cell aggregation, [[graft.ops.PointCloudOps.demRaster]]) happens in
  * Spark, and this driver-side encode moves one row per cell, exactly the
  * data volume the reference hands to GDAL. `MaxPixels` enforces it.
  */
object GeoTiff {

  /** One raster band: a display name (GDAL band description) and
    * row-major `width * height` cell values.
    */
  final case class Band(name: String, values: Array[Double])

  /** A georeferenced multi-band raster. Pixel (col, row) covers the
    * ground square with top-left corner
    * `(originX + col * scaleX, originY - row * scaleY)` — GDAL's
    * north-up PixelIsArea convention (row grows southward).
    */
  final case class Raster(
      width: Int,
      height: Int,
      originX: Double,
      originY: Double,
      scaleX: Double,
      scaleY: Double,
      epsg: Int,
      nodata: Option[Double],
      bands: Seq[Band]) {
    require(width > 0 && height > 0, s"empty raster ${width}x$height")
    require(bands.nonEmpty, "raster needs at least one band")
    bands.foreach { b =>
      require(b.values.length == width * height,
        s"band '${b.name}': ${b.values.length} values for ${width}x$height raster")
    }
  }

  /** Driver-side guard: a raster this size should never exist — the grid
    * resolution, not the data, sets cell count (see scale posture above).
    */
  val MaxPixels: Int = 64 * 1024 * 1024

  // TIFF tag ids (TIFF 6.0 §8; GeoTIFF 1.1 §7; GDAL's two private tags)
  private val TWidth = 256
  private val THeight = 257
  private val TBits = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPlanar = 284
  private val TExtraSamples = 338
  private val TSampleFormat = 339
  private val TPixelScale = 33550
  private val TTiepoint = 33922
  private val TGeoKeys = 34735
  private val TGeoAscii = 34737
  private val TGdalMetadata = 42112
  private val TGdalNodata = 42113

  // ---------------------------------------------------------------- read

  private final class Ifd(buf: ByteBuffer, entries: Map[Int, (Int, Int, Long)]) {
    def has(tag: Int): Boolean = entries.contains(tag)

    /** Entry values as longs (SHORT/LONG), inline or at offset. */
    def longs(tag: Int): Array[Long] = {
      val (typ, cnt, vo) = entries(tag)
      val size = typ match {
        case 3 => 2
        case 4 => 4
        case other => fail(s"tag $tag: unsupported integer type $other")
      }
      val at = if (size.toLong * cnt <= 4) None else Some(vo)
      Array.tabulate(cnt) { i =>
        at match {
          case Some(off) =>
            if (size == 2) buf.getShort(off.toInt + 2 * i) & 0xffffL
            else buf.getInt(off.toInt + 4 * i) & 0xffffffffL
          case None =>
            // inline values live in the entry's raw 4-byte value slot,
            // not at an offset — read them from the slot position
            val slot = inlineSlots(tag)
            if (size == 2) buf.getShort(slot + 2 * i) & 0xffffL
            else buf.getInt(slot + 4 * i) & 0xffffffffL
        }
      }
    }

    /** tag -> absolute position of its 4-byte value slot. */
    var inlineSlots: Map[Int, Int] = Map.empty

    def long1(tag: Int, default: Long = -1): Long =
      if (has(tag)) longs(tag)(0)
      else if (default >= 0) default
      else fail(s"missing required tag $tag")

    def doubles(tag: Int): Array[Double] = {
      val (typ, cnt, vo) = entries(tag)
      if (typ != 12) fail(s"tag $tag: expected DOUBLE type, got $typ")
      Array.tabulate(cnt)(i => buf.getDouble(vo.toInt + 8 * i))
    }

    def ascii(tag: Int): String = {
      val (typ, cnt, vo) = entries(tag)
      if (typ != 2) fail(s"tag $tag: expected ASCII type, got $typ")
      val bytes =
        if (cnt <= 4) Array.tabulate(cnt)(i => buf.get(inlineSlots(tag) + i))
        else Array.tabulate(cnt)(i => buf.get(vo.toInt + i))
      new String(bytes.takeWhile(_ != 0), "US-ASCII")
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GeoTiff: $msg")

  /** Parse a GeoTIFF from bytes. See object scaladoc for the supported
    * subset; everything else fails loudly.
    */
  def read(bytes: Array[Byte]): Raster = {
    if (bytes.length < 8) fail(s"truncated file (${bytes.length} bytes)")
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => fail("not a TIFF (missing II/MM byte-order mark)")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    if ((buf.getShort(2) & 0xffff) != 42) fail("bad TIFF magic")
    val ifdOff = buf.getInt(4)
    val n = buf.getShort(ifdOff) & 0xffff
    var entries = Map.empty[Int, (Int, Int, Long)]
    var slots = Map.empty[Int, Int]
    (0 until n).foreach { i =>
      val e = ifdOff + 2 + 12 * i
      val tag = buf.getShort(e) & 0xffff
      val typ = buf.getShort(e + 2) & 0xffff
      val cnt = buf.getInt(e + 4)
      val vo = buf.getInt(e + 8) & 0xffffffffL
      entries += tag -> (typ, cnt, vo)
      slots += tag -> (e + 8)
    }
    val ifd = new Ifd(buf, entries)
    ifd.inlineSlots = slots

    val w = ifd.long1(TWidth).toInt
    val h = ifd.long1(THeight).toInt
    if (w.toLong * h > MaxPixels)
      fail(s"${w}x$h exceeds MaxPixels=$MaxPixels — not a DEM-resolution raster")
    val nBands = ifd.long1(TSamplesPerPixel, default = 1).toInt
    val comp = ifd.long1(TCompression, default = 1)
    if (comp != 1) fail(s"unsupported Compression=$comp (only 1 = none)")
    if (ifd.has(322)) fail("tiled TIFF unsupported (strips only)")
    val bits = ifd.longs(TBits)
    if (bits.distinct.length != 1 || (bits(0) != 32 && bits(0) != 64))
      fail(s"unsupported BitsPerSample=${bits.mkString(",")} (uniform 32/64 float only)")
    val fmts = if (ifd.has(TSampleFormat)) ifd.longs(TSampleFormat) else Array.fill(nBands)(3L)
    if (fmts.exists(_ != 3))
      fail(s"unsupported SampleFormat=${fmts.mkString(",")} (3 = IEEE float only)")
    val planar = ifd.long1(TPlanar, default = 1).toInt
    val rowsPerStrip = ifd.long1(TRowsPerStrip, default = h.toLong).toInt
    val offsets = ifd.longs(TStripOffsets)
    val counts = ifd.longs(TStripByteCounts)
    if (offsets.length != counts.length)
      fail(s"${offsets.length} strip offsets vs ${counts.length} byte counts")

    val sampleBytes = bits(0).toInt / 8
    def get(off: Long): Double =
      if (sampleBytes == 8) buf.getDouble(off.toInt) else buf.getFloat(off.toInt).toDouble

    val bandVals = Array.fill(nBands)(new Array[Double](w * h))
    val stripsPerBand = (h + rowsPerStrip - 1) / rowsPerStrip
    planar match {
      case 2 =>
        // planar: strips are band-major — band 0's strips, then band 1's…
        if (offsets.length != nBands * stripsPerBand)
          fail(s"planar: ${offsets.length} strips for $nBands bands x $stripsPerBand")
        (0 until nBands).foreach { b =>
          (0 until stripsPerBand).foreach { s =>
            val base = offsets(b * stripsPerBand + s)
            val row0 = s * rowsPerStrip
            val rows = math.min(rowsPerStrip, h - row0)
            val expect = rows.toLong * w * sampleBytes
            if (counts(b * stripsPerBand + s) < expect)
              fail(s"planar strip band=$b s=$s: ${counts(b * stripsPerBand + s)} bytes < $expect")
            var i = 0
            while (i < rows * w) {
              bandVals(b)(row0 * w + i) = get(base + i.toLong * sampleBytes)
              i += 1
            }
          }
        }
      case 1 =>
        // chunky: samples interleaved per pixel, strips row-major
        if (offsets.length != stripsPerBand)
          fail(s"chunky: ${offsets.length} strips for $stripsPerBand expected")
        (0 until stripsPerBand).foreach { s =>
          val base = offsets(s)
          val row0 = s * rowsPerStrip
          val rows = math.min(rowsPerStrip, h - row0)
          var i = 0
          while (i < rows * w) {
            var b = 0
            while (b < nBands) {
              bandVals(b)(row0 * w + i) = get(base + (i.toLong * nBands + b) * sampleBytes)
              b += 1
            }
            i += 1
          }
        }
      case other => fail(s"unsupported PlanarConfiguration=$other")
    }

    // georeferencing: pixel-scale + tiepoint (i,j,k, X,Y,Z) — raster point
    // (i,j) pins ground point (X,Y); normalize to the (0,0) origin form
    val scale = if (ifd.has(TPixelScale)) ifd.doubles(TPixelScale) else fail("missing ModelPixelScale")
    val tp = if (ifd.has(TTiepoint)) ifd.doubles(TTiepoint) else fail("missing ModelTiepoint")
    if (tp.length < 6) fail(s"ModelTiepoint has ${tp.length} values, need 6")
    val originX = tp(3) - tp(0) * scale(0)
    val originY = tp(4) + tp(1) * scale(1)

    val epsg = {
      if (!ifd.has(TGeoKeys)) fail("missing GeoKeyDirectory")
      val gk = ifd.longs(TGeoKeys)
      // rows of (keyId, location, count, value); header row first
      val keys = gk.grouped(4).drop(1).map(r => r(0).toInt -> r).toMap
      def keyVal(id: Int): Option[Int] =
        keys.get(id).collect { case r if r(1) == 0 => r(3).toInt }
      keyVal(3072).orElse(keyVal(2048))
        .getOrElse(fail("GeoKeyDirectory has neither key 3072 (projected) nor 2048 (geographic)"))
    }

    val nodata =
      if (ifd.has(TGdalNodata)) {
        val s = ifd.ascii(TGdalNodata).trim
        try Some(s.toDouble)
        catch { case _: NumberFormatException => fail(s"bad GDAL_NODATA '$s'") }
      } else None

    val names: Map[Int, String] =
      if (ifd.has(TGdalMetadata)) parseBandDescriptions(ifd.ascii(TGdalMetadata))
      else Map.empty
    val bands = (0 until nBands).map { b =>
      Band(names.getOrElse(b, s"band_$b"), bandVals(b))
    }
    Raster(w, h, originX, originY, scale(0), scale(1), epsg, nodata, bands)
  }

  def read(path: String): Raster = read(Files.readAllBytes(Paths.get(path)))

  /** GDAL band descriptions: `<Item name="DESCRIPTION" sample="N"
    * role="description">name</Item>` inside `<GDALMetadata>`. A targeted
    * match, not an XML parser — the tag is GDAL-authored machine output.
    */
  private[io] def parseBandDescriptions(xml: String): Map[Int, String] = {
    val item =
      """<Item name="DESCRIPTION" sample="(\d+)" role="description">([^<]*)</Item>""".r
    item.findAllMatchIn(xml).map(m => m.group(1).toInt -> m.group(2)).toMap
  }

  // --------------------------------------------------------------- write

  /** Encode as the same shape GDAL gave `dem.tif`: little-endian, planar,
    * float64, one strip per band, GDAL band descriptions + NODATA. Reading
    * back any written raster reproduces it exactly (GeoTiffSpec).
    */
  def toBytes(r: Raster): Array[Byte] = {
    if (r.width.toLong * r.height > MaxPixels)
      fail(s"${r.width}x${r.height} exceeds MaxPixels=$MaxPixels")
    val nBands = r.bands.length
    val pixels = r.width * r.height

    val gdalXml = {
      val items = r.bands.zipWithIndex.map { case (b, i) =>
        s"""  <Item name="DESCRIPTION" sample="$i" role="description">${b.name}</Item>"""
      }
      ("<GDALMetadata>\n" + items.mkString("\n") + "\n</GDALMetadata>\n\u0000").getBytes("US-ASCII")
    }
    val nodataAscii = r.nodata.map { v =>
      val s = if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
      (s + "\u0000").getBytes("US-ASCII")
    }
    // GeoKeys: version header + ModelType + RasterType + EPSG (geographic
    // CRS key 2048 if epsg looks geographic, else projected key 3072).
    val geographic = r.epsg == 4326 || (r.epsg >= 4000 && r.epsg < 5000)
    val epsgKey = if (geographic) 2048 else 3072
    val modelType = if (geographic) 2 else 1
    val geoKeys: Array[Int] = Array(
      1, 1, 0, 3,
      1024, 0, 1, modelType,
      1025, 0, 1, 1,
      epsgKey, 0, 1, r.epsg)

    // layout: header(8) | band data | tag payload area | IFD
    var off = 8L
    val stripOffsets = Array.tabulate(nBands)(b => off + b.toLong * pixels * 8)
    off += nBands.toLong * pixels * 8

    case class Entry(tag: Int, typ: Int, cnt: Int, inline: Option[Array[Byte]], payload: Option[Array[Byte]])
    val payloads = new ByteArrayOutputStream()
    var payloadBase = off

    def le(bytes: Int)(vals: Long*): Array[Byte] = {
      val bb = ByteBuffer.allocate(bytes * vals.length).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(v => if (bytes == 2) bb.putShort(v.toShort) else bb.putInt(v.toInt))
      bb.array()
    }
    def leD(vals: Double*): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * vals.length).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      bb.array()
    }

    var entries = Vector.empty[Entry]
    def add(tag: Int, typ: Int, cnt: Int, data: Array[Byte]): Unit =
      entries :+= (if (data.length <= 4) Entry(tag, typ, cnt, Some(data.padTo(4, 0.toByte)), None)
                   else Entry(tag, typ, cnt, None, Some(data)))

    add(TWidth, 4, 1, le(4)(r.width))
    add(THeight, 4, 1, le(4)(r.height))
    add(TBits, 3, nBands, le(2)(Seq.fill(nBands)(64L): _*))
    add(TCompression, 3, 1, le(2)(1))
    add(TPhotometric, 3, 1, le(2)(1))
    add(TStripOffsets, 4, nBands, le(4)(stripOffsets: _*))
    add(TSamplesPerPixel, 3, 1, le(2)(nBands))
    add(TRowsPerStrip, 3, 1, le(2)(r.height))
    add(TStripByteCounts, 4, nBands, le(4)(Seq.fill(nBands)(pixels.toLong * 8): _*))
    add(TPlanar, 3, 1, le(2)(2))
    if (nBands > 1)
      add(TExtraSamples, 3, nBands - 1, le(2)(Seq.fill(nBands - 1)(0L): _*))
    add(TSampleFormat, 3, nBands, le(2)(Seq.fill(nBands)(3L): _*))
    add(TPixelScale, 12, 3, leD(r.scaleX, r.scaleY, 0.0))
    add(TTiepoint, 12, 6, leD(0, 0, 0, r.originX, r.originY, 0))
    add(TGeoKeys, 3, geoKeys.length, le(2)(geoKeys.map(_.toLong): _*))
    add(TGdalMetadata, 2, gdalXml.length, gdalXml)
    nodataAscii.foreach(b => add(TGdalNodata, 2, b.length, b))

    // resolve payload offsets
    val resolved = entries.map { e =>
      e.payload match {
        case Some(p) =>
          val at = payloadBase + payloads.size()
          payloads.write(p)
          if (payloads.size() % 2 == 1) payloads.write(0) // TIFF word alignment
          (e, at)
        case None => (e, 0L)
      }
    }
    val ifdOff = payloadBase + payloads.size()

    val out = new ByteArrayOutputStream()
    // header
    out.write('I'); out.write('I')
    out.write(le(2)(42)); out.write(le(4)(ifdOff))
    // band data (planar float64, row-major per band)
    r.bands.foreach { b =>
      val bb = ByteBuffer.allocate(b.values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.values.foreach(bb.putDouble)
      out.write(bb.array())
    }
    out.write(payloads.toByteArray)
    // IFD: count, entries sorted by tag, next-IFD = 0
    out.write(le(2)(resolved.length))
    resolved.sortBy(_._1.tag).foreach { case (e, at) =>
      out.write(le(2)(e.tag))
      out.write(le(2)(e.typ))
      out.write(le(4)(e.cnt))
      e.inline match {
        case Some(b) => out.write(b)
        case None => out.write(le(4)(at))
      }
    }
    out.write(le(4)(0))
    out.toByteArray
  }

  def write(r: Raster, path: String): Unit = {
    val f = Paths.get(path)
    Option(f.getParent).foreach(Files.createDirectories(_))
    Files.write(f, toBytes(r))
  }
}
