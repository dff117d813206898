package graft.sources.laz

/** LAZ (LASzip-compressed LAS) container support for the point formats
  * EPT trees serve: LAS 1.2 point formats 0-3 plus extra bytes,
  * compressor 2 (pointwise chunked), coder 0 (arithmetic). This is the
  * payload format of `usgs-lidar-public`-style Entwine trees — each
  * `ept-data/<key>.laz` node is a complete little LAS file with a
  * `laszip encoded` VLR describing the item chain.
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
  val VlrHeaderSize = 54
  val LaszipUserId = "laszip encoded"
  val LaszipRecordId = 22204
  val CompressorPointwiseChunked = 2
  val DefaultChunkSize = 50000

  // laszip item type ids
  val ItemByte = 0
  val ItemPoint10 = 6
  val ItemGpsTime11 = 7
  val ItemRgb12 = 8

  final case class Item(itemType: Int, size: Int, version: Int)

  /** Items for a LAS 1.2 point format + trailing extra bytes. */
  def itemsFor(pointFormat: Int, extraBytes: Int): Seq[Item] = {
    val base = pointFormat match {
      case 0 => Seq(Item(ItemPoint10, 20, 2))
      case 1 => Seq(Item(ItemPoint10, 20, 2), Item(ItemGpsTime11, 8, 2))
      case 2 => Seq(Item(ItemPoint10, 20, 2), Item(ItemRgb12, 6, 2))
      case 3 => Seq(Item(ItemPoint10, 20, 2), Item(ItemGpsTime11, 8, 2), Item(ItemRgb12, 6, 2))
      case f => throw new IllegalArgumentException(
        s"LAZ point format $f not supported (LAS 1.2 formats 0-3 only — " +
          "the formats EPT/Entwine trees serve)")
    }
    if (extraBytes > 0) base :+ Item(ItemByte, extraBytes, 2) else base
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
      items: Seq[Item]) {
    def extraBytes: Int = recordLength - (pointFormat match {
      case 0 => 20
      case 1 => 28
      case 2 => 26
      case 3 => 34
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
    val npoints = u32(buf, 107)
    val scale = Array(f64(buf, 131), f64(buf, 139), f64(buf, 147))
    val offset = Array(f64(buf, 155), f64(buf, 163), f64(buf, 171))

    var chunkSize = DefaultChunkSize
    var items: Seq[Item] = Seq.empty
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
          val compressor = u16(buf, v)
          require(compressor == CompressorPointwiseChunked,
            s"LAZ compressor $compressor not supported (pointwise-chunked=2 only — " +
              "LAS 1.4 layered compression is out of scope)")
          chunkSize = u32(buf, v + 12).toInt
          val numItems = u16(buf, v + 32)
          items = (0 until numItems).map { j =>
            val q = v + 34 + 6 * j
            Item(u16(buf, q), u16(buf, q + 2), u16(buf, q + 4))
          }
          items.foreach { it =>
            require(
              it.itemType == ItemPoint10 || it.itemType == ItemGpsTime11 ||
                it.itemType == ItemRgb12 || it.itemType == ItemByte,
              s"LAZ item type ${it.itemType} not supported")
            require(it.version == 2, s"LAZ item version ${it.version} not supported (v2 only)")
          }
          found = true
        }
        p += VlrHeaderSize + len
        i += 1
      }
      require(found, "compressed LAZ without a laszip VLR")
    }
    Header(pointFormat, recordLength, npoints, offsetToPoints, compressed, scale, offset,
      chunkSize, items)
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

  /** Write an UNCOMPRESSED LAS 1.2 file from the same records (the
    * "uncompressed twin" used by fixtures and by tests that pin the
    * decode bit-identically).
    */
  def writeUncompressed(
      pointFormat: Int,
      records: Array[Array[Byte]],
      scale: Array[Double],
      offset: Array[Double]): Array[Byte] = {
    val stride = if (records.isEmpty) 0 else records(0).length
    val out = new Array[Byte](HeaderSize + stride * records.length)
    writeHeader(out, pointFormat, stride, records.length, HeaderSize, scale, offset,
      compressed = false, nVlrs = 0)
    var pos = HeaderSize
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
    out(0) = 'L'; out(1) = 'A'; out(2) = 'S'; out(3) = 'F'
    out(24) = 1 // version 1.2
    out(25) = 2
    Items.putU16(out, 94, HeaderSize)
    Items.putI32(out, 96, offsetToPoints)
    Items.putI32(out, 100, nVlrs)
    out(104) = ((pointFormat & 0x7F) | (if (compressed) 0x80 else 0)).toByte
    Items.putU16(out, 105, recordLength)
    Items.putI32(out, 107, npoints)
    var d = 0
    while (d < 3) {
      Items.putI64(out, 131 + 8 * d, java.lang.Double.doubleToLongBits(scale(d)))
      Items.putI64(out, 155 + 8 * d, java.lang.Double.doubleToLongBits(offset(d)))
      d += 1
    }
  }

  private def writeLaszipVlr(out: Array[Byte], at: Int, items: Seq[Item], chunkSize: Int): Unit = {
    val vlrLen = 34 + 6 * items.length
    // VLR header
    val uid = LaszipUserId.getBytes("US-ASCII")
    System.arraycopy(uid, 0, out, at + 2, uid.length)
    Items.putU16(out, at + 18, LaszipRecordId)
    Items.putU16(out, at + 20, vlrLen)
    // VLR body
    val v = at + VlrHeaderSize
    Items.putU16(out, v, CompressorPointwiseChunked)
    Items.putU16(out, v + 2, 0) // coder: arithmetic
    out(v + 4) = 2 // laszip version major
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
