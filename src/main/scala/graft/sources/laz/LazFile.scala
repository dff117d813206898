package graft.sources.laz

/** LAZ (LASzip-compressed LAS) container support for the point formats
  * EPT trees serve: LAS 1.2 point formats 0-3 plus extra bytes under
  * compressor 2 (pointwise chunked), and LAS 1.4 point formats 6-8 plus
  * extra bytes under compressor 3 (layered chunked, the LASzip "native
  * extension" — see [[Point14DecItem]] for the layer/context scheme and
  * its provenance note), coder 0 (arithmetic) throughout. This is the
  * payload format of `usgs-lidar-public`-style Entwine trees — each
  * `ept-data/<key>.laz` node is a complete little LAS file with a
  * `laszip encoded` VLR describing the item chain; newer USGS trees are
  * LAS 1.4 (the reference reads both through PDAL's laszip,
  * scripts/usgs_lidar.py:118-124).
  *
  * Layout (public spec, laszip.org):
  *  - 227-byte LAS 1.2 header; `point_data_format` has bit 7 set to
  *    mark compression; VLRs follow, one of which is the laszip VLR
  *    (user id "laszip encoded", record id 22204) carrying compressor /
  *    coder / chunk size / item list;
  *  - at `offset_to_point_data`: an 8-byte little-endian offset to the
  *    chunk table, then the chunks back to back;
  *  - each chunk: the first point RAW (uncompressed item layout), then
  *    a fresh arithmetic-coder stream over the remaining points with
  *    fresh per-item models;
  *  - the chunk table: u32 version(0), u32 chunk count, then the chunk
  *    byte sizes delta-coded through an [[IntCompressor]](32, 2) in
  *    their own arithmetic stream. The reader uses the table to start
  *    each chunk at its exact byte offset, so per-chunk decode is also
  *    embarrassingly parallel if ever needed.
  *
  * Decoded point records are byte-identical to the uncompressed LAS
  * record layout (that is the round-trip contract [[LazSpec]] pins).
  */
object LazFile {

  val HeaderSize = 227
  val HeaderSize14 = 375
  val VlrHeaderSize = 54
  val LaszipUserId = "laszip encoded"
  val LaszipRecordId = 22204
  val CompressorPointwiseChunked = 2
  val CompressorLayeredChunked = 3
  val DefaultChunkSize = 50000

  // laszip item type ids
  val ItemByte = 0
  val ItemPoint10 = 6
  val ItemGpsTime11 = 7
  val ItemRgb12 = 8
  val ItemPoint14 = 10
  val ItemRgb14 = 11
  val ItemRgbNir14 = 12
  val ItemByte14 = 14

  final case class Item(itemType: Int, size: Int, version: Int)

  /** Items for a LAS 1.2 point format + trailing extra bytes
    * (compressor 2, pointwise chunked, item version 2).
    */
  def itemsFor(pointFormat: Int, extraBytes: Int): Seq[Item] = {
    val base = pointFormat match {
      case 0 => Seq(Item(ItemPoint10, 20, 2))
      case 1 => Seq(Item(ItemPoint10, 20, 2), Item(ItemGpsTime11, 8, 2))
      case 2 => Seq(Item(ItemPoint10, 20, 2), Item(ItemRgb12, 6, 2))
      case 3 => Seq(Item(ItemPoint10, 20, 2), Item(ItemGpsTime11, 8, 2), Item(ItemRgb12, 6, 2))
      case f if f >= 6 && f <= 8 => return itemsFor14(f, extraBytes)
      case f => throw new IllegalArgumentException(
        s"LAZ point format $f not supported (LAS 1.2 formats 0-3 and LAS 1.4 " +
          "formats 6-8 only — formats 4/5/9/10 carry waveform packets EPT trees do not serve)")
    }
    if (extraBytes > 0) base :+ Item(ItemByte, extraBytes, 2) else base
  }

  /** Items for a LAS 1.4 point format 6-8 + trailing extra bytes
    * (compressor 3, layered chunked, item version 3).
    */
  def itemsFor14(pointFormat: Int, extraBytes: Int): Seq[Item] = {
    val base = pointFormat match {
      case 6 => Seq(Item(ItemPoint14, 30, 3))
      case 7 => Seq(Item(ItemPoint14, 30, 3), Item(ItemRgb14, 6, 3))
      case 8 => Seq(Item(ItemPoint14, 30, 3), Item(ItemRgbNir14, 8, 3))
      case f => throw new IllegalArgumentException(
        s"LAS 1.4 point format $f not supported (formats 6-8 only — " +
          "formats 9/10 carry waveform packets EPT trees do not serve)")
    }
    if (extraBytes > 0) base :+ Item(ItemByte14, extraBytes, 3) else base
  }

  /** The LAS fields the EPT reader needs. */
  final case class Header(
      pointFormat: Int,
      recordLength: Int,
      npoints: Long,
      offsetToPoints: Int,
      compressed: Boolean,
      scale: Array[Double],
      offset: Array[Double],
      chunkSize: Int,
      items: Seq[Item],
      compressor: Int = CompressorPointwiseChunked) {
    def extraBytes: Int = recordLength - (pointFormat match {
      case 0 => 20
      case 1 => 28
      case 2 => 26
      case 3 => 34
      case 6 => 30
      case 7 => 36
      case 8 => 38
      case _ => recordLength
    })
  }

  private def u16(b: Array[Byte], off: Int): Int = Items.getU16(b, off)
  private def u32(b: Array[Byte], off: Int): Long = Items.getI32(b, off).toLong & 0xFFFFFFFFL
  private def f64(b: Array[Byte], off: Int): Double =
    java.lang.Double.longBitsToDouble(Items.getI64(b, off))

  def parseHeader(buf: Array[Byte]): Header = {
    require(buf.length >= HeaderSize && buf(0) == 'L' && buf(1) == 'A' && buf(2) == 'S' && buf(3) == 'F',
      "not a LAS/LAZ file (missing LASF signature)")
    val headerSize = u16(buf, 94)
    val offsetToPoints = u32(buf, 96).toInt
    val nVlrs = u32(buf, 100).toInt
    val fmtRaw = buf(104) & 0xFF
    val compressed = (fmtRaw & 0x80) != 0
    val pointFormat = fmtRaw & 0x7F
    val recordLength = u16(buf, 105)
    // LAS 1.4 zeroes the legacy u32 count for the new point formats and
    // carries the real count as a u64 at offset 247
    val legacyNpoints = u32(buf, 107)
    val npoints =
      if (legacyNpoints == 0 && headerSize >= HeaderSize14) Items.getI64(buf, 247)
      else legacyNpoints
    val scale = Array(f64(buf, 131), f64(buf, 139), f64(buf, 147))
    val offset = Array(f64(buf, 155), f64(buf, 163), f64(buf, 171))

    var chunkSize = DefaultChunkSize
    var items: Seq[Item] = Seq.empty
    var compressor = CompressorPointwiseChunked
    if (compressed) {
      // walk the VLRs for the laszip record
      var p = headerSize
      var found = false
      var i = 0
      while (i < nVlrs && !found) {
        val userId = new String(buf, p + 2, 16, "US-ASCII").takeWhile(_ != 0)
        val recordId = u16(buf, p + 18)
        val len = u16(buf, p + 20)
        if (userId == LaszipUserId && recordId == LaszipRecordId) {
          val v = p + VlrHeaderSize
          compressor = u16(buf, v)
          require(
            compressor == CompressorPointwiseChunked || compressor == CompressorLayeredChunked,
            s"LAZ compressor $compressor not supported (pointwise-chunked=2 and " +
              "layered-chunked=3 only)")
          chunkSize = u32(buf, v + 12).toInt
          val numItems = u16(buf, v + 32)
          items = (0 until numItems).map { j =>
            val q = v + 34 + 6 * j
            Item(u16(buf, q), u16(buf, q + 2), u16(buf, q + 4))
          }
          if (compressor == CompressorPointwiseChunked) {
            items.foreach { it =>
              require(
                it.itemType == ItemPoint10 || it.itemType == ItemGpsTime11 ||
                  it.itemType == ItemRgb12 || it.itemType == ItemByte,
                s"LAZ item type ${it.itemType} not supported under pointwise compression")
              require(it.version == 2,
                s"LAZ item version ${it.version} not supported under pointwise compression (v2 only)")
            }
          } else {
            items.foreach { it =>
              require(
                it.itemType == ItemPoint14 || it.itemType == ItemRgb14 ||
                  it.itemType == ItemRgbNir14 || it.itemType == ItemByte14,
                s"LAZ item type ${it.itemType} not supported under layered compression " +
                  "(POINT14/RGB14/RGBNIR14/BYTE14 only — wavepackets are out of scope)")
              require(it.version == 3,
                s"LAZ item version ${it.version} not supported under layered compression (v3 only)")
            }
          }
          found = true
        }
        p += VlrHeaderSize + len
        i += 1
      }
      require(found, "compressed LAZ without a laszip VLR")
    }
    Header(pointFormat, recordLength, npoints, offsetToPoints, compressed, scale, offset,
      chunkSize, items, compressor)
  }

  private def decoderFor(item: Item, dec: ArithmeticDecoder, first: Array[Byte], off: Int): ItemDec =
    item.itemType match {
      case ItemPoint10 => new Point10Dec(dec, first, off)
      case ItemGpsTime11 => new GpsTime11Dec(dec, first, off)
      case ItemRgb12 => new Rgb12Dec(dec, first, off)
      case ItemByte => new ByteDec(dec, item.size, first, off)
    }

  private def encoderFor(item: Item, enc: ArithmeticEncoder, first: Array[Byte], off: Int): ItemEnc =
    item.itemType match {
      case ItemPoint10 => new Point10Enc(enc, first, off)
      case ItemGpsTime11 => new GpsTime11Enc(enc, first, off)
      case ItemRgb12 => new Rgb12Enc(enc, first, off)
      case ItemByte => new ByteEnc(enc, item.size, first, off)
    }

  private def decoder14For(item: Item): Item14Dec = item.itemType match {
    case ItemPoint14 => new Point14DecItem
    case ItemRgb14 => new Rgb14DecItem
    case ItemRgbNir14 => new RgbNir14DecItem
    case ItemByte14 => new Byte14DecItem(item.size)
  }

  private def encoder14For(item: Item): Item14Enc = item.itemType match {
    case ItemPoint14 => new Point14EncItem
    case ItemRgb14 => new Rgb14EncItem
    case ItemRgbNir14 => new RgbNir14EncItem
    case ItemByte14 => new Byte14EncItem(item.size)
  }

  /** Decode every point record of a LAZ file already in memory (EPT
    * nodes are node-sized — a few MB at most — so whole-file buffers
    * keep the reader simple and the executor access pattern sequential).
    * Returns records in the uncompressed LAS layout, `recordLength`
    * bytes each.
    */
  def decompress(buf: Array[Byte]): (Header, Array[Array[Byte]]) = {
    val h = parseHeader(buf)
    require(h.compressed, "decompress called on an uncompressed LAS file")
    val stride = h.items.map(_.size).sum
    require(stride == h.recordLength,
      s"laszip item sizes ($stride) disagree with the header record length (${h.recordLength})")
    if (h.compressor == CompressorLayeredChunked) return decompressLayered(buf, h, stride)

    // chunk table -> chunk byte sizes -> chunk start offsets
    val chunkTableOffset = Items.getI64(buf, h.offsetToPoints)
    val chunksStart = h.offsetToPoints + 8
    val nChunks = ((h.npoints + h.chunkSize - 1) / h.chunkSize).toInt
    val chunkSizes = readChunkTable(buf, chunkTableOffset.toInt, nChunks)

    val out = new Array[Array[Byte]](h.npoints.toInt)
    var outPos = 0
    var chunkStart = chunksStart
    var c = 0
    while (c < nChunks) {
      val inChunk = math.min(h.chunkSize.toLong, h.npoints - c.toLong * h.chunkSize).toInt
      val chunkEnd = chunkStart + chunkSizes(c)
      // first point raw
      val firstRec = new Array[Byte](stride)
      System.arraycopy(buf, chunkStart, firstRec, 0, stride)
      out(outPos) = firstRec
      outPos += 1
      if (inChunk > 1) {
        val dec = new ArithmeticDecoder(buf, chunkStart + stride, chunkEnd)
        // item decoders seeded with the raw first point, in item order
        var off = 0
        val decs = h.items.map { it =>
          val d = decoderFor(it, dec, firstRec, off)
          off += it.size
          d
        }
        var p = 1
        while (p < inChunk) {
          val rec = new Array[Byte](stride)
          var o = 0
          var j = 0
          while (j < decs.length) {
            decs(j).read(rec, o)
            o += h.items(j).size
            j += 1
          }
          out(outPos) = rec
          outPos += 1
          p += 1
        }
      }
      chunkStart = chunkEnd
      c += 1
    }
    (h, out)
  }

  /** Decode a layered-chunked (compressor 3) stream — the LASzip native
    * extension for LAS 1.4 point formats 6-8. Each chunk:
    * a u32 point count, every item's per-layer byte sizes (u32 each,
    * items in order), then per item its RAW first-point slice followed
    * by that item's layer byte streams back to back. Item codecs carry
    * four scanner-channel contexts seeded lazily as channels appear.
    */
  private def decompressLayered(
      buf: Array[Byte], h: Header, stride: Int): (Header, Array[Array[Byte]]) = {
    val chunkTableOffset = Items.getI64(buf, h.offsetToPoints)
    val chunksStart = h.offsetToPoints + 8
    val nChunks = ((h.npoints + h.chunkSize - 1) / h.chunkSize).toInt
    val chunkSizes = readChunkTable(buf, chunkTableOffset.toInt, nChunks)

    val offs = h.items.scanLeft(0)(_ + _.size).init.toArray
    val out = new Array[Array[Byte]](h.npoints.toInt)
    var outPos = 0
    var chunkStart = chunksStart
    var c = 0
    while (c < nChunks) {
      val expected = math.min(h.chunkSize.toLong, h.npoints - c.toLong * h.chunkSize).toInt
      val cnt = u32(buf, chunkStart).toInt
      require(cnt == expected,
        s"layered chunk $c stores $cnt points, header implies $expected")
      var p = chunkStart + 4
      val decs = h.items.map(decoder14For).toArray
      val sizes = decs.map { d =>
        val s = new Array[Int](d.nLayers)
        var k = 0
        while (k < d.nLayers) { s(k) = u32(buf, p).toInt; p += 4; k += 1 }
        s
      }
      val firstRec = new Array[Byte](stride)
      val ctx = new Ctx14
      var j = 0
      while (j < decs.length) {
        System.arraycopy(buf, p, firstRec, offs(j), h.items(j).size)
        p += h.items(j).size
        p = decs(j).bind(buf, p, sizes(j))
        decs(j).init(firstRec, offs(j), ctx)
        j += 1
      }
      require(p <= chunkStart + chunkSizes(c),
        s"layered chunk $c overruns its chunk-table size")
      out(outPos) = firstRec
      outPos += 1
      var q = 1
      while (q < cnt) {
        val rec = new Array[Byte](stride)
        var i = 0
        while (i < decs.length) {
          decs(i).read(rec, offs(i), ctx)
          i += 1
        }
        out(outPos) = rec
        outPos += 1
        q += 1
      }
      chunkStart += chunkSizes(c)
      c += 1
    }
    (h, out)
  }

  private def readChunkTable(buf: Array[Byte], tableOff: Int, nChunks: Int): Array[Int] = {
    val version = u32(buf, tableOff)
    require(version == 0, s"unknown LAZ chunk table version $version")
    val stored = u32(buf, tableOff + 4).toInt
    require(stored == nChunks,
      s"chunk table stores $stored chunks, header implies $nChunks")
    val dec = new ArithmeticDecoder(buf, tableOff + 8, buf.length)
    val ic = new IntDecompressor(dec, 32, 2)
    val sizes = new Array[Int](nChunks)
    var i = 0
    while (i < nChunks) {
      sizes(i) = ic.decompress(if (i == 0) 0 else sizes(i - 1), 1)
      i += 1
    }
    sizes
  }

  /** Compress point records (uncompressed LAS layout) into a complete
    * LAZ file: header + laszip VLR + chunked streams + chunk table.
    */
  def compress(
      pointFormat: Int,
      records: Array[Array[Byte]],
      scale: Array[Double],
      offset: Array[Double],
      chunkSize: Int = DefaultChunkSize,
      extraBytes: Int = 0): Array[Byte] = {
    val items = itemsFor(pointFormat, extraBytes)
    val stride = items.map(_.size).sum
    records.foreach(r => require(r.length == stride, s"record length ${r.length} != stride $stride"))

    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i < records.length) {
      val inChunk = math.min(chunkSize, records.length - i)
      val enc = new ArithmeticEncoder
      var off = 0
      val encs = items.map { it =>
        val e = encoderFor(it, enc, records(i), off)
        off += it.size
        e
      }
      var p = 1
      while (p < inChunk) {
        var o = 0
        var j = 0
        while (j < encs.length) {
          encs(j).write(records(i + p), o)
          o += items(j).size
          j += 1
        }
        p += 1
      }
      val coded = if (inChunk > 1) enc.done() else Array.empty[Byte]
      val chunk = new Array[Byte](stride + coded.length)
      System.arraycopy(records(i), 0, chunk, 0, stride)
      System.arraycopy(coded, 0, chunk, stride, coded.length)
      chunks += chunk
      i += inChunk
    }

    // chunk table
    val tableEnc = new ArithmeticEncoder
    val ic = new IntCompressor(tableEnc, 32, 2)
    var prev = 0
    chunks.foreach { ch => ic.compress(prev, ch.length, 1); prev = ch.length }
    val tableBody = if (chunks.nonEmpty) tableEnc.done() else Array.empty[Byte]

    // assemble
    val vlrLen = 34 + 6 * items.length
    val offsetToPoints = HeaderSize + VlrHeaderSize + vlrLen
    val chunksStart = offsetToPoints + 8
    val chunkBytes = chunks.map(_.length).sum
    val tableOff = chunksStart + chunkBytes
    val total = tableOff + 8 + tableBody.length
    val out = new Array[Byte](total)

    writeHeader(out, pointFormat, stride, records.length, offsetToPoints, scale, offset,
      compressed = true, nVlrs = 1)
    writeLaszipVlr(out, HeaderSize, items, chunkSize)
    Items.putI64(out, offsetToPoints, tableOff.toLong)
    var pos = chunksStart
    chunks.foreach { ch => System.arraycopy(ch, 0, out, pos, ch.length); pos += ch.length }
    Items.putI32(out, tableOff, 0) // table version
    Items.putI32(out, tableOff + 4, chunks.length)
    System.arraycopy(tableBody, 0, out, tableOff + 8, tableBody.length)
    out
  }

  /** Compress LAS 1.4 point records (formats 6-8, uncompressed record
    * layout) into a complete layered-chunked LAZ file: LAS 1.4 header +
    * laszip VLR (compressor 3, item version 3) + layered chunks + the
    * standard chunk table.
    */
  def compress14(
      pointFormat: Int,
      records: Array[Array[Byte]],
      scale: Array[Double],
      offset: Array[Double],
      chunkSize: Int = DefaultChunkSize,
      extraBytes: Int = 0): Array[Byte] = {
    val items = itemsFor14(pointFormat, extraBytes)
    val stride = items.map(_.size).sum
    records.foreach(r => require(r.length == stride, s"record length ${r.length} != stride $stride"))
    val offs = items.scanLeft(0)(_ + _.size).init.toArray

    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i < records.length) {
      val inChunk = math.min(chunkSize, records.length - i)
      val encs = items.map(encoder14For).toArray
      val ctx = new Ctx14
      var j = 0
      while (j < encs.length) { encs(j).init(records(i), offs(j), ctx); j += 1 }
      var p = 1
      while (p < inChunk) {
        var k = 0
        while (k < encs.length) { encs(k).write(records(i + p), offs(k), ctx); k += 1 }
        p += 1
      }
      val layers = encs.map(_.layerBytes())
      val sizesBytes = 4 * layers.map(_.length).sum
      val layerBytes = layers.map(_.map(_.length).sum).sum
      val chunk = new Array[Byte](4 + sizesBytes + stride + layerBytes)
      Items.putI32(chunk, 0, inChunk)
      var pos = 4
      layers.foreach(_.foreach { l => Items.putI32(chunk, pos, l.length); pos += 4 })
      j = 0
      while (j < encs.length) {
        System.arraycopy(records(i), offs(j), chunk, pos, items(j).size)
        pos += items(j).size
        layers(j).foreach { l => System.arraycopy(l, 0, chunk, pos, l.length); pos += l.length }
        j += 1
      }
      chunks += chunk
      i += inChunk
    }

    // chunk table (identical mechanism to the pointwise scheme)
    val tableEnc = new ArithmeticEncoder
    val ic = new IntCompressor(tableEnc, 32, 2)
    var prev = 0
    chunks.foreach { ch => ic.compress(prev, ch.length, 1); prev = ch.length }
    val tableBody = if (chunks.nonEmpty) tableEnc.done() else Array.empty[Byte]

    val vlrLen = 34 + 6 * items.length
    val offsetToPoints = HeaderSize14 + VlrHeaderSize + vlrLen
    val chunksStart = offsetToPoints + 8
    val chunkBytes = chunks.map(_.length).sum
    val tableOff = chunksStart + chunkBytes
    val total = tableOff + 8 + tableBody.length
    val out = new Array[Byte](total)

    writeHeader(out, pointFormat, stride, records.length, offsetToPoints, scale, offset,
      compressed = true, nVlrs = 1)
    writeLaszipVlr(out, HeaderSize14, items, chunkSize, CompressorLayeredChunked)
    Items.putI64(out, offsetToPoints, tableOff.toLong)
    var pos = chunksStart
    chunks.foreach { ch => System.arraycopy(ch, 0, out, pos, ch.length); pos += ch.length }
    Items.putI32(out, tableOff, 0)
    Items.putI32(out, tableOff + 4, chunks.length)
    System.arraycopy(tableBody, 0, out, tableOff + 8, tableBody.length)
    out
  }

  /** Write an UNCOMPRESSED LAS file from the same records (the
    * "uncompressed twin" used by fixtures and by tests that pin the
    * decode bit-identically). Formats 0-3 produce a LAS 1.2 header,
    * formats 6-8 a LAS 1.4 header.
    */
  def writeUncompressed(
      pointFormat: Int,
      records: Array[Array[Byte]],
      scale: Array[Double],
      offset: Array[Double]): Array[Byte] = {
    val hdr = if (pointFormat >= 6) HeaderSize14 else HeaderSize
    val stride = if (records.isEmpty) 0 else records(0).length
    val out = new Array[Byte](hdr + stride * records.length)
    writeHeader(out, pointFormat, stride, records.length, hdr, scale, offset,
      compressed = false, nVlrs = 0)
    var pos = hdr
    records.foreach { r => System.arraycopy(r, 0, out, pos, r.length); pos += r.length }
    out
  }

  /** Point records of an uncompressed LAS buffer. */
  def readUncompressed(buf: Array[Byte]): (Header, Array[Array[Byte]]) = {
    val h = parseHeader(buf)
    require(!h.compressed, "readUncompressed called on a LAZ file")
    val out = new Array[Array[Byte]](h.npoints.toInt)
    var i = 0
    while (i < h.npoints) {
      val rec = new Array[Byte](h.recordLength)
      System.arraycopy(buf, h.offsetToPoints + i.toInt * h.recordLength, rec, 0, h.recordLength)
      out(i.toInt) = rec
      i += 1
    }
    (h, out)
  }

  private def writeHeader(
      out: Array[Byte], pointFormat: Int, recordLength: Int, npoints: Int, offsetToPoints: Int,
      scale: Array[Double], offset: Array[Double], compressed: Boolean, nVlrs: Int): Unit = {
    val las14 = pointFormat >= 6
    out(0) = 'L'; out(1) = 'A'; out(2) = 'S'; out(3) = 'F'
    out(24) = 1
    out(25) = if (las14) 4 else 2
    Items.putU16(out, 94, if (las14) HeaderSize14 else HeaderSize)
    Items.putI32(out, 96, offsetToPoints)
    Items.putI32(out, 100, nVlrs)
    out(104) = ((pointFormat & 0x7F) | (if (compressed) 0x80 else 0)).toByte
    Items.putU16(out, 105, recordLength)
    // the legacy u32 count does not apply to the 1.4-only formats: zero
    // it and store the real count in the 1.4 u64 field
    if (las14) {
      Items.putI32(out, 107, 0)
      Items.putI64(out, 247, npoints.toLong)
    } else Items.putI32(out, 107, npoints)
    var d = 0
    while (d < 3) {
      Items.putI64(out, 131 + 8 * d, java.lang.Double.doubleToLongBits(scale(d)))
      Items.putI64(out, 155 + 8 * d, java.lang.Double.doubleToLongBits(offset(d)))
      d += 1
    }
  }

  private def writeLaszipVlr(
      out: Array[Byte], at: Int, items: Seq[Item], chunkSize: Int,
      compressor: Int = CompressorPointwiseChunked): Unit = {
    val vlrLen = 34 + 6 * items.length
    // VLR header
    val uid = LaszipUserId.getBytes("US-ASCII")
    System.arraycopy(uid, 0, out, at + 2, uid.length)
    Items.putU16(out, at + 18, LaszipRecordId)
    Items.putU16(out, at + 20, vlrLen)
    // VLR body
    val v = at + VlrHeaderSize
    Items.putU16(out, v, compressor)
    Items.putU16(out, v + 2, 0) // coder: arithmetic
    out(v + 4) = if (compressor == CompressorLayeredChunked) 3 else 2 // laszip version major
    out(v + 5) = 4 // minor
    Items.putU16(out, v + 6, 3) // revision
    Items.putI32(out, v + 8, 0) // options
    Items.putI32(out, v + 12, chunkSize)
    Items.putI64(out, v + 16, -1L) // num special evlrs
    Items.putI64(out, v + 24, -1L) // offset special evlrs
    Items.putU16(out, v + 32, items.length)
    items.zipWithIndex.foreach { case (it, j) =>
      val q = v + 34 + 6 * j
      Items.putU16(out, q, it.itemType)
      Items.putU16(out, q + 2, it.size)
      Items.putU16(out, q + 4, it.version)
    }
  }
}
