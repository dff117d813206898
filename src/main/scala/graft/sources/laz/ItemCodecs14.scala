package graft.sources.laz

/** LASzip "native extension" (item version 3) codecs for the LAS 1.4
  * point formats 6-8: POINT14, RGB14, RGBNIR14 and BYTE14 under the
  * layered-chunked scheme (compressor 3). Two structural differences
  * from the v2 pointwise codecs:
  *
  *  - LAYERS: each item splits its fields into independently coded byte
  *    streams (POINT14: channel/returns/XY, Z, classification, flags,
  *    intensity, scan angle, user data, point source, GPS time), each a
  *    standalone arithmetic-coder stream whose byte size is recorded in
  *    the chunk header. A layer in which nothing was coded is stored as
  *    zero bytes.
  *  - CONTEXTS: every item keeps FOUR parallel model sets, one per
  *    scanner channel. A channel change switches the active context,
  *    lazily seeding an unused one from the PREVIOUS context's last
  *    point, so interleaved flight lines each predict from their own
  *    history.
  *
  * Implemented from the published LASzip 3.4 native-extension algorithm
  * (laszip.org; reference behavior: the PDAL/laszip read path the
  * reference uses, scripts/usgs_lidar.py:118-124). Provenance caveats,
  * also pinned in LazSpec: this environment has no external laszip
  * to cross-validate byte streams against, and the published 16x16
  * 6-context return-map constant table is not derivable offline, so
  * [[Point14Tables.Map6]] uses a documented clamp of the public v2
  * 8x8 table (context choice affects only model selection — the
  * round-trip contract and the layered container layout are exact
  * regardless).
  */
private[laz] object Point14Tables {
  /** 6-valued (number of returns, return number) prediction-stream map:
    * clamp of the public v2 8x8 NumberReturnMap (see provenance note).
    */
  val Map6: Array[Array[Int]] = Array.tabulate(16, 16) { (n, r) =>
    math.min(Items.NumberReturnMap(math.min(n, 7))(math.min(r, 7)), 5)
  }

  /** 8-valued height-level map: |n - r| clamped to 7 (the v2 level table
    * is exactly |n - r| on 8x8; this is its 16x16 extension).
    */
  val Level8: Array[Array[Int]] = Array.tabulate(16, 16) { (n, r) =>
    math.min(math.abs(n - r), 7)
  }
}

/** Per-point shared context: POINT14 reads/writes it first and decides
  * the scanner-channel context every following item of the point uses.
  */
private[laz] final class Ctx14 { var c: Int = 0 }

/** A layered item decoder: binds its layers from the chunk buffer, is
  * seeded with the chunk's raw first point, then decodes point by point.
  */
private[laz] sealed trait Item14Dec {
  def nLayers: Int
  /** Bind this item's layer streams; `sizes` are this item's layer byte
    * counts in order; returns the buffer position after the layers.
    */
  def bind(buf: Array[Byte], start: Int, sizes: Array[Int]): Int
  def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit
  def read(item: Array[Byte], off: Int, ctx: Ctx14): Unit
}

/** A layered item encoder: buffers each layer in its own coder; the
  * container collects the layer bytes at chunk end.
  */
private[laz] sealed trait Item14Enc {
  def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit
  def write(item: Array[Byte], off: Int, ctx: Ctx14): Unit
  /** Finished layer byte arrays, in layer order (empty array = layer in
    * which nothing was coded).
    */
  def layerBytes(): Array[Array[Byte]]
}

/** One bufferable layer on the encode side. `mark()` records that a
  * symbol was actually coded: an unmarked layer serializes to zero
  * bytes (not a bare coder flush), and the decoder skips binding
  * zero-size layers entirely — the contract that lets all-constant
  * fields (scan angle, point source, GPS time) cost nothing per chunk.
  */
private[laz] final class Layer14 {
  val enc = new ArithmeticEncoder
  private var used = false
  def mark(): Unit = used = true
  def bytes(): Array[Byte] = if (used) enc.done() else Array.empty[Byte]
}

// ---------------------------------------------------------------- POINT14

private[laz] object Point14 {
  val Size = 30

  /** Field views over a 30-byte point14 record at `off`. */
  @inline def retNum(b: Array[Byte], off: Int): Int = b(off + 14) & 0xF
  @inline def numRet(b: Array[Byte], off: Int): Int = (b(off + 14) >> 4) & 0xF
  @inline def classFlags(b: Array[Byte], off: Int): Int = b(off + 15) & 0xF
  @inline def scanner(b: Array[Byte], off: Int): Int = (b(off + 15) >> 4) & 3
  @inline def scanDir(b: Array[Byte], off: Int): Int = (b(off + 15) >> 6) & 1
  @inline def edge(b: Array[Byte], off: Int): Int = (b(off + 15) >> 7) & 1
  /** The 6-bit composite coded in the flags layer. */
  @inline def flags6(b: Array[Byte], off: Int): Int =
    classFlags(b, off) | (scanDir(b, off) << 4) | (edge(b, off) << 5)
}

private[laz] final class Point14DecItem extends Item14Dec {
  import Items._

  override def nLayers: Int = 9

  private var dXY: ArithmeticDecoder = _
  private var dZ: ArithmeticDecoder = _
  private var dClass: ArithmeticDecoder = _
  private var dFlags: ArithmeticDecoder = _
  private var dInt: ArithmeticDecoder = _
  private var dSA: ArithmeticDecoder = _
  private var dUD: ArithmeticDecoder = _
  private var dPS: ArithmeticDecoder = _
  private var dGps: ArithmeticDecoder = _

  override def bind(buf: Array[Byte], start: Int, sizes: Array[Int]): Int = {
    var p = start
    def mk(sz: Int): ArithmeticDecoder = {
      val d = if (sz > 0) new ArithmeticDecoder(buf, p, p + sz) else null
      p += sz
      d
    }
    dXY = mk(sizes(0)); dZ = mk(sizes(1)); dClass = mk(sizes(2)); dFlags = mk(sizes(3))
    dInt = mk(sizes(4)); dSA = mk(sizes(5)); dUD = mk(sizes(6)); dPS = mk(sizes(7))
    dGps = mk(sizes(8))
    p
  }

  /** Per-scanner-channel model set + last-point state. Seeded from a
    * 30-byte record (the chunk's raw first point, or — on a lazy
    * context creation — the previous context's last point).
    */
  private final class PCtx(seed: Array[Byte], seedOff: Int) {
    val lastRec = new Array[Byte](Point14.Size)
    System.arraycopy(seed, seedOff, lastRec, 0, Point14.Size)
    var gpsChanged = false

    val mChanged = Array.fill(8)(new SymbolModel(128, withTable = true))
    val mScanner = new SymbolModel(3, withTable = true)
    private val mNum = new Array[SymbolModel](16)
    def numModel(i: Int): SymbolModel = {
      if (mNum(i) == null) mNum(i) = new SymbolModel(16, withTable = true); mNum(i)
    }
    private val mRet = new Array[SymbolModel](16)
    def retModel(i: Int): SymbolModel = {
      if (mRet(i) == null) mRet(i) = new SymbolModel(16, withTable = true); mRet(i)
    }
    val mRetGpsSame = new SymbolModel(13, withTable = true)
    val icDx = new IntDecompressor(dXY, 32, 2)
    val icDy = new IntDecompressor(dXY, 32, 22)
    val icZ = new IntDecompressor(dZ, 32, 20)
    val medX: Array[StreamingMedian5] = Array.fill(12)(new StreamingMedian5)
    val medY: Array[StreamingMedian5] = Array.fill(12)(new StreamingMedian5)
    val lastZ: Array[Int] = Array.fill(8)(getI32(lastRec, 8))
    private val mClass = new Array[SymbolModel](64)
    def classModel(i: Int): SymbolModel = {
      if (mClass(i) == null) mClass(i) = new SymbolModel(256, withTable = true); mClass(i)
    }
    private val mFlags = new Array[SymbolModel](64)
    def flagsModel(i: Int): SymbolModel = {
      if (mFlags(i) == null) mFlags(i) = new SymbolModel(64, withTable = true); mFlags(i)
    }
    private val mUD = new Array[SymbolModel](64)
    def udModel(i: Int): SymbolModel = {
      if (mUD(i) == null) mUD(i) = new SymbolModel(256, withTable = true); mUD(i)
    }
    val icInt = new IntDecompressor(dInt, 16, 4)
    val lastInt: Array[Int] = Array.fill(8)(getU16(lastRec, 12))
    val icSA = new IntDecompressor(dSA, 16, 2)
    val icPS = new IntDecompressor(dPS, 16, 1)
    // GPS multi-sequence machinery (the v2 GPSTIME11 algorithm with the
    // independent slot-allocation cursor), per context, on the gps layer
    val mGpsMulti = new SymbolModel(GpsTime.MultiTotal, withTable = true)
    val mGps0Diff = new SymbolModel(6, withTable = true)
    val icGps = new IntDecompressor(dGps, 32, 9)
    val gpsSeq = new Array[Long](4)
    val gpsDiff = new Array[Int](4)
    val gpsExtreme = new Array[Int](4)
    var gpsLast = 0
    var gpsNext = 0
    gpsSeq(0) = getI64(lastRec, 22)

    def readGps(): Long = {
      if (gpsDiff(gpsLast) == 0) {
        val multi = dGps.decodeSymbol(mGps0Diff)
        if (multi == 1) {
          val d = icGps.decompress(0, 0)
          gpsDiff(gpsLast) = d
          gpsSeq(gpsLast) += d
          gpsExtreme(gpsLast) = 0
        } else if (multi == 2) {
          gpsNext = (gpsNext + 1) & 3
          val high = icGps.decompress((gpsSeq(gpsLast) >>> 32).toInt, 8)
          gpsSeq(gpsNext) = ((high.toLong & 0xFFFFFFFFL) << 32) | dGps.readInt()
          gpsLast = gpsNext
          gpsDiff(gpsLast) = 0
          gpsExtreme(gpsLast) = 0
        } else if (multi > 2) {
          gpsLast = (gpsLast + multi - 2) & 3
          return readGps()
        }
      } else {
        val multi = dGps.decodeSymbol(mGpsMulti)
        if (multi == 1) {
          gpsSeq(gpsLast) += icGps.decompress(gpsDiff(gpsLast), 1)
          gpsExtreme(gpsLast) = 0
        } else if (multi < GpsTime.MultiUnchanged) {
          var d = 0
          if (multi == 0) {
            d = icGps.decompress(0, 7)
            gpsExtreme(gpsLast) += 1
            if (gpsExtreme(gpsLast) > 3) { gpsDiff(gpsLast) = d; gpsExtreme(gpsLast) = 0 }
          } else if (multi < GpsTime.Multi) {
            d =
              if (multi < 10) icGps.decompress(multi * gpsDiff(gpsLast), 2)
              else icGps.decompress(multi * gpsDiff(gpsLast), 3)
          } else if (multi == GpsTime.Multi) {
            d = icGps.decompress(GpsTime.Multi * gpsDiff(gpsLast), 4)
            gpsExtreme(gpsLast) += 1
            if (gpsExtreme(gpsLast) > 3) { gpsDiff(gpsLast) = d; gpsExtreme(gpsLast) = 0 }
          } else {
            val neg = GpsTime.Multi - multi
            if (neg > GpsTime.MultiMinus) {
              d = icGps.decompress(neg * gpsDiff(gpsLast), 5)
            } else {
              d = icGps.decompress(GpsTime.MultiMinus * gpsDiff(gpsLast), 6)
              gpsExtreme(gpsLast) += 1
              if (gpsExtreme(gpsLast) > 3) { gpsDiff(gpsLast) = d; gpsExtreme(gpsLast) = 0 }
            }
          }
          gpsSeq(gpsLast) += d
        } else if (multi == GpsTime.MultiCodeFull) {
          gpsNext = (gpsNext + 1) & 3
          val high = icGps.decompress((gpsSeq(gpsLast) >>> 32).toInt, 8)
          gpsSeq(gpsNext) = ((high.toLong & 0xFFFFFFFFL) << 32) | dGps.readInt()
          gpsLast = gpsNext
          gpsDiff(gpsLast) = 0
          gpsExtreme(gpsLast) = 0
        } else if (multi > GpsTime.MultiCodeFull) {
          gpsLast = (gpsLast + multi - GpsTime.MultiCodeFull) & 3
          return readGps()
        }
        // multi == MultiUnchanged: exact repeat of the sequence value
      }
      gpsSeq(gpsLast)
    }
  }

  private val ctxs = new Array[PCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = Point14.scanner(first, off)
    ctxs(cur) = new PCtx(first, off)
    ctx.c = cur
  }

  override def read(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    val old = ctxs(cur)
    val lastR0 = Point14.retNum(old.lastRec, 0)
    val lastN0 = Point14.numRet(old.lastRec, 0)
    val lpr = (if (lastR0 == 1) 1 else 0) | (if (lastR0 >= lastN0) 2 else 0) |
      (if (old.gpsChanged) 4 else 0)
    val cv = dXY.decodeSymbol(old.mChanged(lpr))

    if ((cv & 64) != 0) {
      val diff = dXY.decodeSymbol(old.mScanner)
      val sc = (cur + diff + 1) & 3
      if (ctxs(sc) == null) ctxs(sc) = new PCtx(old.lastRec, 0)
      cur = sc
    }
    ctx.c = cur
    val cc = ctxs(cur)
    val last = cc.lastRec
    val gpsChangedNow = (cv & 16) != 0

    val lastR = Point14.retNum(last, 0)
    val lastN = Point14.numRet(last, 0)
    val n = if ((cv & 4) != 0) dXY.decodeSymbol(cc.numModel(lastN)) else lastN
    val r = (cv & 3) match {
      case 0 => lastR
      case 1 => (lastR + 1) & 15
      case 2 => (lastR + 15) & 15
      case _ =>
        if (gpsChangedNow) dXY.decodeSymbol(cc.retModel(lastR))
        else (lastR + dXY.decodeSymbol(cc.mRetGpsSame) + 2) & 15
    }
    val m = Point14Tables.Map6(n)(r)
    val l = Point14Tables.Level8(n)(r)
    val cpr = (if (r == 1) 2 else 0) + (if (r >= n) 1 else 0)
    val gpsBit = if (gpsChangedNow) 1 else 0

    // X, Y (channel/returns/XY layer), Z (its own layer)
    val medIdx = (m << 1) | gpsBit
    val dx = cc.icDx.decompress(cc.medX(medIdx).get, if (n == 1) 1 else 0)
    val x = getI32(last, 0) + dx
    cc.medX(medIdx).add(dx)
    val kx = cc.icDx.k
    val dy = cc.icDy.decompress(
      cc.medY(medIdx).get, (if (n == 1) 1 else 0) + (if (kx < 20) kx & 0xFFFFFFFE else 20))
    val y = getI32(last, 4) + dy
    cc.medY(medIdx).add(dy)
    val kxy = (cc.icDx.k + cc.icDy.k) / 2
    val z = cc.icZ.decompress(
      cc.lastZ(l), (if (n == 1) 1 else 0) + (if (kxy < 18) kxy & 0xFFFFFFFE else 18))
    cc.lastZ(l) = z

    // classification / flags / intensity / scan angle / user data /
    // point source / gps time, each from its own layer
    val lastClass = last(16) & 0xFF
    val ccc = ((lastClass & 0x1F) << 1) + (if (cpr == 3) 1 else 0)
    val klass = dClass.decodeSymbol(cc.classModel(ccc))
    val fl = dFlags.decodeSymbol(cc.flagsModel(Point14.flags6(last, 0)))
    val intIdx = (cpr << 1) | gpsBit
    val inten = cc.icInt.decompress(cc.lastInt(intIdx), cpr)
    cc.lastInt(intIdx) = inten
    val sa =
      if ((cv & 8) != 0) cc.icSA.decompress(getU16(last, 18), gpsBit)
      else getU16(last, 18)
    val ud = dUD.decodeSymbol(cc.udModel((last(17) & 0xFF) / 4))
    val ps =
      if ((cv & 32) != 0) cc.icPS.decompress(getU16(last, 20), 0)
      else getU16(last, 20)
    val gps = if (gpsChangedNow) cc.readGps() else getI64(last, 22)

    putI32(item, off, x)
    putI32(item, off + 4, y)
    putI32(item, off + 8, z)
    putU16(item, off + 12, inten)
    item(off + 14) = ((r & 0xF) | ((n & 0xF) << 4)).toByte
    item(off + 15) = ((fl & 0xF) | (cur << 4) | (((fl >> 4) & 1) << 6) | (((fl >> 5) & 1) << 7)).toByte
    item(off + 16) = klass.toByte
    item(off + 17) = ud.toByte
    putU16(item, off + 18, sa)
    putU16(item, off + 20, ps)
    putI64(item, off + 22, gps)

    System.arraycopy(item, off, cc.lastRec, 0, Point14.Size)
    cc.gpsChanged = gpsChangedNow
  }
}

private[laz] final class Point14EncItem extends Item14Enc {
  import Items._

  private val lXY = new Layer14
  private val lZ = new Layer14
  private val lClass = new Layer14
  private val lFlags = new Layer14
  private val lInt = new Layer14
  private val lSA = new Layer14
  private val lUD = new Layer14
  private val lPS = new Layer14
  private val lGps = new Layer14

  private final class PCtx(seed: Array[Byte], seedOff: Int) {
    val lastRec = new Array[Byte](Point14.Size)
    System.arraycopy(seed, seedOff, lastRec, 0, Point14.Size)
    var gpsChanged = false

    val mChanged = Array.fill(8)(new SymbolModel(128, withTable = false))
    val mScanner = new SymbolModel(3, withTable = false)
    private val mNum = new Array[SymbolModel](16)
    def numModel(i: Int): SymbolModel = {
      if (mNum(i) == null) mNum(i) = new SymbolModel(16, withTable = false); mNum(i)
    }
    private val mRet = new Array[SymbolModel](16)
    def retModel(i: Int): SymbolModel = {
      if (mRet(i) == null) mRet(i) = new SymbolModel(16, withTable = false); mRet(i)
    }
    val mRetGpsSame = new SymbolModel(13, withTable = false)
    val icDx = new IntCompressor(lXY.enc, 32, 2)
    val icDy = new IntCompressor(lXY.enc, 32, 22)
    val icZ = new IntCompressor(lZ.enc, 32, 20)
    val medX: Array[StreamingMedian5] = Array.fill(12)(new StreamingMedian5)
    val medY: Array[StreamingMedian5] = Array.fill(12)(new StreamingMedian5)
    val lastZ: Array[Int] = Array.fill(8)(getI32(lastRec, 8))
    private val mClass = new Array[SymbolModel](64)
    def classModel(i: Int): SymbolModel = {
      if (mClass(i) == null) mClass(i) = new SymbolModel(256, withTable = false); mClass(i)
    }
    private val mFlags = new Array[SymbolModel](64)
    def flagsModel(i: Int): SymbolModel = {
      if (mFlags(i) == null) mFlags(i) = new SymbolModel(64, withTable = false); mFlags(i)
    }
    private val mUD = new Array[SymbolModel](64)
    def udModel(i: Int): SymbolModel = {
      if (mUD(i) == null) mUD(i) = new SymbolModel(256, withTable = false); mUD(i)
    }
    val icInt = new IntCompressor(lInt.enc, 16, 4)
    val lastInt: Array[Int] = Array.fill(8)(getU16(lastRec, 12))
    val icSA = new IntCompressor(lSA.enc, 16, 2)
    val icPS = new IntCompressor(lPS.enc, 16, 1)
    val mGpsMulti = new SymbolModel(GpsTime.MultiTotal, withTable = false)
    val mGps0Diff = new SymbolModel(6, withTable = false)
    val icGps = new IntCompressor(lGps.enc, 32, 9)
    val gpsSeq = new Array[Long](4)
    val gpsDiff = new Array[Int](4)
    val gpsExtreme = new Array[Int](4)
    var gpsLast = 0
    var gpsNext = 0
    gpsSeq(0) = getI64(lastRec, 22)

    def writeGps(curr: Long): Unit = {
      val e = lGps.enc
      if (gpsDiff(gpsLast) == 0) {
        if (curr == gpsSeq(gpsLast)) {
          e.encodeSymbol(mGps0Diff, 0)
        } else {
          val diff64 = curr - gpsSeq(gpsLast)
          val diff32 = diff64.toInt
          if (diff64 == diff32.toLong) {
            e.encodeSymbol(mGps0Diff, 1)
            icGps.compress(0, diff32, 0)
            gpsDiff(gpsLast) = diff32
            gpsExtreme(gpsLast) = 0
            gpsSeq(gpsLast) = curr
          } else {
            var i = 1
            while (i < 4) {
              val other = curr - gpsSeq((gpsLast + i) & 3)
              if (other == other.toInt.toLong) {
                e.encodeSymbol(mGps0Diff, i + 2)
                gpsLast = (gpsLast + i) & 3
                writeGps(curr)
                return
              }
              i += 1
            }
            e.encodeSymbol(mGps0Diff, 2)
            icGps.compress((gpsSeq(gpsLast) >>> 32).toInt, (curr >>> 32).toInt, 8)
            e.writeInt(curr & 0xFFFFFFFFL)
            gpsNext = (gpsNext + 1) & 3
            gpsSeq(gpsNext) = curr
            gpsLast = gpsNext
            gpsDiff(gpsLast) = 0
            gpsExtreme(gpsLast) = 0
          }
        }
      } else {
        if (curr == gpsSeq(gpsLast)) {
          e.encodeSymbol(mGpsMulti, GpsTime.MultiUnchanged)
        } else {
          val diff64 = curr - gpsSeq(gpsLast)
          val diff32 = diff64.toInt
          if (diff64 == diff32.toLong) {
            val multi = GpsTime.quantize(diff32.toFloat / gpsDiff(gpsLast).toFloat)
            if (multi == 1) {
              e.encodeSymbol(mGpsMulti, 1)
              icGps.compress(gpsDiff(gpsLast), diff32, 1)
              gpsExtreme(gpsLast) = 0
            } else if (multi > 0) {
              if (multi < GpsTime.Multi) {
                e.encodeSymbol(mGpsMulti, multi)
                if (multi < 10) icGps.compress(multi * gpsDiff(gpsLast), diff32, 2)
                else icGps.compress(multi * gpsDiff(gpsLast), diff32, 3)
              } else {
                e.encodeSymbol(mGpsMulti, GpsTime.Multi)
                icGps.compress(GpsTime.Multi * gpsDiff(gpsLast), diff32, 4)
                gpsExtreme(gpsLast) += 1
                if (gpsExtreme(gpsLast) > 3) { gpsDiff(gpsLast) = diff32; gpsExtreme(gpsLast) = 0 }
              }
            } else if (multi < 0) {
              if (multi > GpsTime.MultiMinus) {
                e.encodeSymbol(mGpsMulti, GpsTime.Multi - multi)
                icGps.compress(multi * gpsDiff(gpsLast), diff32, 5)
              } else {
                e.encodeSymbol(mGpsMulti, GpsTime.Multi - GpsTime.MultiMinus)
                icGps.compress(GpsTime.MultiMinus * gpsDiff(gpsLast), diff32, 6)
                gpsExtreme(gpsLast) += 1
                if (gpsExtreme(gpsLast) > 3) { gpsDiff(gpsLast) = diff32; gpsExtreme(gpsLast) = 0 }
              }
            } else {
              e.encodeSymbol(mGpsMulti, 0)
              icGps.compress(0, diff32, 7)
              gpsExtreme(gpsLast) += 1
              if (gpsExtreme(gpsLast) > 3) { gpsDiff(gpsLast) = diff32; gpsExtreme(gpsLast) = 0 }
            }
            gpsSeq(gpsLast) = curr
          } else {
            var i = 1
            while (i < 4) {
              val other = curr - gpsSeq((gpsLast + i) & 3)
              if (other == other.toInt.toLong) {
                e.encodeSymbol(mGpsMulti, GpsTime.MultiCodeFull + i)
                gpsLast = (gpsLast + i) & 3
                writeGps(curr)
                return
              }
              i += 1
            }
            e.encodeSymbol(mGpsMulti, GpsTime.MultiCodeFull)
            icGps.compress((gpsSeq(gpsLast) >>> 32).toInt, (curr >>> 32).toInt, 8)
            e.writeInt(curr & 0xFFFFFFFFL)
            gpsNext = (gpsNext + 1) & 3
            gpsSeq(gpsNext) = curr
            gpsLast = gpsNext
            gpsDiff(gpsLast) = 0
            gpsExtreme(gpsLast) = 0
          }
        }
      }
    }
  }

  private val ctxs = new Array[PCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = Point14.scanner(first, off)
    ctxs(cur) = new PCtx(first, off)
    ctx.c = cur
  }

  override def write(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    val old = ctxs(cur)
    val sc = Point14.scanner(item, off)
    // "changed" bits compare against the context the point BELONGS to:
    // its own channel's last point if that context is live, else the
    // current context's last point (which would seed it) — exactly what
    // the decoder will predict from.
    val tgt = if (sc != cur && ctxs(sc) != null) ctxs(sc) else old
    val tl = tgt.lastRec

    val r = Point14.retNum(item, off)
    val n = Point14.numRet(item, off)
    val sa = getU16(item, off + 18)
    val ps = getU16(item, off + 20)
    val gps = getI64(item, off + 22)
    val lastR = Point14.retNum(tl, 0)
    val lastN = Point14.numRet(tl, 0)

    var cv = 0
    if (sc != cur) cv |= 64
    if (ps != getU16(tl, 20)) cv |= 32
    val gpsChangedNow = gps != getI64(tl, 22)
    if (gpsChangedNow) cv |= 16
    if (sa != getU16(tl, 18)) cv |= 8
    if (n != lastN) cv |= 4
    val rcode =
      if (r == lastR) 0
      else if (r == ((lastR + 1) & 15)) 1
      else if (r == ((lastR + 15) & 15)) 2
      else 3
    cv |= rcode

    val lastR0 = Point14.retNum(old.lastRec, 0)
    val lastN0 = Point14.numRet(old.lastRec, 0)
    val lpr = (if (lastR0 == 1) 1 else 0) | (if (lastR0 >= lastN0) 2 else 0) |
      (if (old.gpsChanged) 4 else 0)
    lXY.mark(); lZ.mark(); lClass.mark(); lFlags.mark(); lInt.mark(); lUD.mark()
    lXY.enc.encodeSymbol(old.mChanged(lpr), cv)

    if (sc != cur) {
      lXY.enc.encodeSymbol(old.mScanner, ((sc + 4 - cur) & 3) - 1)
      if (ctxs(sc) == null) ctxs(sc) = new PCtx(old.lastRec, 0)
      cur = sc
    }
    ctx.c = cur
    val cc = ctxs(cur)
    val last = cc.lastRec

    if ((cv & 4) != 0) lXY.enc.encodeSymbol(cc.numModel(lastN), n)
    if (rcode == 3) {
      if (gpsChangedNow) lXY.enc.encodeSymbol(cc.retModel(lastR), r)
      else lXY.enc.encodeSymbol(cc.mRetGpsSame, (r - lastR + 16 - 2) & 15)
    }
    val m = Point14Tables.Map6(n)(r)
    val l = Point14Tables.Level8(n)(r)
    val cpr = (if (r == 1) 2 else 0) + (if (r >= n) 1 else 0)
    val gpsBit = if (gpsChangedNow) 1 else 0

    val x = getI32(item, off)
    val y = getI32(item, off + 4)
    val z = getI32(item, off + 8)
    val medIdx = (m << 1) | gpsBit
    val dx = x - getI32(last, 0)
    cc.icDx.compress(cc.medX(medIdx).get, dx, if (n == 1) 1 else 0)
    cc.medX(medIdx).add(dx)
    val kx = cc.icDx.k
    val dy = y - getI32(last, 4)
    cc.icDy.compress(
      cc.medY(medIdx).get, dy, (if (n == 1) 1 else 0) + (if (kx < 20) kx & 0xFFFFFFFE else 20))
    cc.medY(medIdx).add(dy)
    val kxy = (cc.icDx.k + cc.icDy.k) / 2
    cc.icZ.compress(
      cc.lastZ(l), z, (if (n == 1) 1 else 0) + (if (kxy < 18) kxy & 0xFFFFFFFE else 18))
    cc.lastZ(l) = z

    val lastClass = last(16) & 0xFF
    val ccc = ((lastClass & 0x1F) << 1) + (if (cpr == 3) 1 else 0)
    lClass.enc.encodeSymbol(cc.classModel(ccc), item(off + 16) & 0xFF)
    lFlags.enc.encodeSymbol(cc.flagsModel(Point14.flags6(last, 0)), Point14.flags6(item, off))
    val intIdx = (cpr << 1) | gpsBit
    val inten = getU16(item, off + 12)
    cc.icInt.compress(cc.lastInt(intIdx), inten, cpr)
    cc.lastInt(intIdx) = inten
    if ((cv & 8) != 0) { lSA.mark(); cc.icSA.compress(getU16(last, 18), sa, gpsBit) }
    lUD.enc.encodeSymbol(cc.udModel((last(17) & 0xFF) / 4), item(off + 17) & 0xFF)
    if ((cv & 32) != 0) { lPS.mark(); cc.icPS.compress(getU16(last, 20), ps, 0) }
    if (gpsChangedNow) { lGps.mark(); cc.writeGps(gps) }

    System.arraycopy(item, off, cc.lastRec, 0, Point14.Size)
    cc.gpsChanged = gpsChangedNow
  }

  override def layerBytes(): Array[Array[Byte]] =
    Array(lXY.bytes(), lZ.bytes(), lClass.bytes(), lFlags.bytes(), lInt.bytes(),
      lSA.bytes(), lUD.bytes(), lPS.bytes(), lGps.bytes())
}

// ----------------------------------------------------------------- RGB14

/** RGB14 (one "RGB" layer): the v2 RGB12 prediction scheme with four
  * scanner-channel contexts.
  */
private[laz] final class Rgb14DecItem extends Item14Dec {
  import Items._

  override def nLayers: Int = 1
  private var d: ArithmeticDecoder = _

  override def bind(buf: Array[Byte], start: Int, sizes: Array[Int]): Int = {
    d = if (sizes(0) > 0) new ArithmeticDecoder(buf, start, start + sizes(0)) else null
    start + sizes(0)
  }

  private final class RCtx(r0: Int, g0: Int, b0: Int) {
    val mByteUsed = new SymbolModel(128, withTable = true)
    val mDiff = Array.fill(6)(new SymbolModel(256, withTable = true))
    val last = Array(r0, g0, b0)
  }

  private val ctxs = new Array[RCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = ctx.c
    ctxs(cur) = new RCtx(getU16(first, off), getU16(first, off + 2), getU16(first, off + 4))
  }

  override def read(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    if (ctx.c != cur) {
      if (ctxs(ctx.c) == null) {
        val o = ctxs(cur).last
        ctxs(ctx.c) = new RCtx(o(0), o(1), o(2))
      }
      cur = ctx.c
    }
    val cc = ctxs(cur)
    val last = cc.last
    val sym = d.decodeSymbol(cc.mByteUsed)
    var r = 0; var g = 0; var b = 0
    r =
      if ((sym & 1) != 0) (d.decodeSymbol(cc.mDiff(0)) + (last(0) & 0xFF)) & 0xFF
      else last(0) & 0xFF
    r |=
      (if ((sym & 2) != 0) ((d.decodeSymbol(cc.mDiff(1)) + (last(0) >>> 8)) & 0xFF) << 8
       else last(0) & 0xFF00)
    if ((sym & 64) != 0) {
      var diff = (r & 0xFF) - (last(0) & 0xFF)
      g =
        if ((sym & 4) != 0) (d.decodeSymbol(cc.mDiff(2)) + u8Clamp(diff + (last(1) & 0xFF))) & 0xFF
        else last(1) & 0xFF
      if ((sym & 16) != 0) {
        diff = (diff + ((g & 0xFF) - (last(1) & 0xFF))) / 2
        b = (d.decodeSymbol(cc.mDiff(4)) + u8Clamp(diff + (last(2) & 0xFF))) & 0xFF
      } else b = last(2) & 0xFF
      diff = (r >>> 8) - (last(0) >>> 8)
      g |=
        (if ((sym & 8) != 0) ((d.decodeSymbol(cc.mDiff(3)) + u8Clamp(diff + (last(1) >>> 8))) & 0xFF) << 8
         else last(1) & 0xFF00)
      if ((sym & 32) != 0) {
        diff = (diff + ((g >>> 8) - (last(1) >>> 8))) / 2
        b |= ((d.decodeSymbol(cc.mDiff(5)) + u8Clamp(diff + (last(2) >>> 8))) & 0xFF) << 8
      } else b |= last(2) & 0xFF00
    } else {
      g = r
      b = r
    }
    putU16(item, off, r)
    putU16(item, off + 2, g)
    putU16(item, off + 4, b)
    last(0) = r; last(1) = g; last(2) = b
  }
}

private[laz] final class Rgb14EncItem extends Item14Enc {
  import Items._

  private val lay = new Layer14

  private final class RCtx(r0: Int, g0: Int, b0: Int) {
    val mByteUsed = new SymbolModel(128, withTable = false)
    val mDiff = Array.fill(6)(new SymbolModel(256, withTable = false))
    val last = Array(r0, g0, b0)
  }

  private val ctxs = new Array[RCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = ctx.c
    ctxs(cur) = new RCtx(getU16(first, off), getU16(first, off + 2), getU16(first, off + 4))
  }

  override def write(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    if (ctx.c != cur) {
      if (ctxs(ctx.c) == null) {
        val o = ctxs(cur).last
        ctxs(ctx.c) = new RCtx(o(0), o(1), o(2))
      }
      cur = ctx.c
    }
    val cc = ctxs(cur)
    val last = cc.last
    lay.mark()
    val e = lay.enc
    val r = getU16(item, off)
    val g = getU16(item, off + 2)
    val b = getU16(item, off + 4)
    var sym = 0
    if ((r & 0xFF) != (last(0) & 0xFF)) sym |= 1
    if ((r >>> 8) != (last(0) >>> 8)) sym |= 2
    val colored =
      (r & 0xFF) != (g & 0xFF) || (r & 0xFF) != (b & 0xFF) ||
        (r >>> 8) != (g >>> 8) || (r >>> 8) != (b >>> 8)
    if (colored) {
      sym |= 64
      if ((g & 0xFF) != (last(1) & 0xFF)) sym |= 4
      if ((g >>> 8) != (last(1) >>> 8)) sym |= 8
      if ((b & 0xFF) != (last(2) & 0xFF)) sym |= 16
      if ((b >>> 8) != (last(2) >>> 8)) sym |= 32
    }
    e.encodeSymbol(cc.mByteUsed, sym)
    if ((sym & 1) != 0) e.encodeSymbol(cc.mDiff(0), ((r & 0xFF) - (last(0) & 0xFF)) & 0xFF)
    if ((sym & 2) != 0) e.encodeSymbol(cc.mDiff(1), ((r >>> 8) - (last(0) >>> 8)) & 0xFF)
    if ((sym & 64) != 0) {
      var diff = (r & 0xFF) - (last(0) & 0xFF)
      if ((sym & 4) != 0)
        e.encodeSymbol(cc.mDiff(2), ((g & 0xFF) - u8Clamp(diff + (last(1) & 0xFF))) & 0xFF)
      if ((sym & 16) != 0) {
        diff = (diff + ((g & 0xFF) - (last(1) & 0xFF))) / 2
        e.encodeSymbol(cc.mDiff(4), ((b & 0xFF) - u8Clamp(diff + (last(2) & 0xFF))) & 0xFF)
      }
      diff = (r >>> 8) - (last(0) >>> 8)
      if ((sym & 8) != 0)
        e.encodeSymbol(cc.mDiff(3), ((g >>> 8) - u8Clamp(diff + (last(1) >>> 8))) & 0xFF)
      if ((sym & 32) != 0) {
        diff = (diff + ((g >>> 8) - (last(1) >>> 8))) / 2
        e.encodeSymbol(cc.mDiff(5), ((b >>> 8) - u8Clamp(diff + (last(2) >>> 8))) & 0xFF)
      }
    }
    last(0) = r; last(1) = g; last(2) = b
  }

  override def layerBytes(): Array[Array[Byte]] = Array(lay.bytes())
}

// -------------------------------------------------------------- RGBNIR14

/** RGBNIR14 (layers "RGB", "NIR"): the RGB14 scheme plus a per-byte
  * delta-coded near-infrared channel on its own layer.
  */
private[laz] final class RgbNir14DecItem extends Item14Dec {
  import Items._

  override def nLayers: Int = 2
  private val rgb = new Rgb14DecItem
  private var dNir: ArithmeticDecoder = _

  override def bind(buf: Array[Byte], start: Int, sizes: Array[Int]): Int = {
    val p = rgb.bind(buf, start, sizes)
    dNir = if (sizes(1) > 0) new ArithmeticDecoder(buf, p, p + sizes(1)) else null
    p + sizes(1)
  }

  private final class NCtx(n0: Int) {
    val mUsed = new SymbolModel(4, withTable = true)
    val mDiff0 = new SymbolModel(256, withTable = true)
    val mDiff1 = new SymbolModel(256, withTable = true)
    var last = n0
  }

  private val ctxs = new Array[NCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    rgb.init(first, off, ctx)
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = ctx.c
    ctxs(cur) = new NCtx(getU16(first, off + 6))
  }

  override def read(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    rgb.read(item, off, ctx)
    if (ctx.c != cur) {
      if (ctxs(ctx.c) == null) ctxs(ctx.c) = new NCtx(ctxs(cur).last)
      cur = ctx.c
    }
    val cc = ctxs(cur)
    val sym = dNir.decodeSymbol(cc.mUsed)
    var nir = 0
    nir =
      if ((sym & 1) != 0) (dNir.decodeSymbol(cc.mDiff0) + (cc.last & 0xFF)) & 0xFF
      else cc.last & 0xFF
    nir |=
      (if ((sym & 2) != 0) ((dNir.decodeSymbol(cc.mDiff1) + (cc.last >>> 8)) & 0xFF) << 8
       else cc.last & 0xFF00)
    putU16(item, off + 6, nir)
    cc.last = nir
  }
}

private[laz] final class RgbNir14EncItem extends Item14Enc {
  import Items._

  private val rgb = new Rgb14EncItem
  private val lay = new Layer14

  private final class NCtx(n0: Int) {
    val mUsed = new SymbolModel(4, withTable = false)
    val mDiff0 = new SymbolModel(256, withTable = false)
    val mDiff1 = new SymbolModel(256, withTable = false)
    var last = n0
  }

  private val ctxs = new Array[NCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    rgb.init(first, off, ctx)
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = ctx.c
    ctxs(cur) = new NCtx(getU16(first, off + 6))
  }

  override def write(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    rgb.write(item, off, ctx)
    if (ctx.c != cur) {
      if (ctxs(ctx.c) == null) ctxs(ctx.c) = new NCtx(ctxs(cur).last)
      cur = ctx.c
    }
    val cc = ctxs(cur)
    lay.mark()
    val e = lay.enc
    val nir = getU16(item, off + 6)
    var sym = 0
    if ((nir & 0xFF) != (cc.last & 0xFF)) sym |= 1
    if ((nir >>> 8) != (cc.last >>> 8)) sym |= 2
    e.encodeSymbol(cc.mUsed, sym)
    if ((sym & 1) != 0) e.encodeSymbol(cc.mDiff0, ((nir & 0xFF) - (cc.last & 0xFF)) & 0xFF)
    if ((sym & 2) != 0) e.encodeSymbol(cc.mDiff1, ((nir >>> 8) - (cc.last >>> 8)) & 0xFF)
    cc.last = nir
  }

  override def layerBytes(): Array[Array[Byte]] =
    rgb.layerBytes() ++ Array(lay.bytes())
}

// ---------------------------------------------------------------- BYTE14

/** BYTE14 (one layer PER extra byte): per-byte delta coding with four
  * scanner-channel contexts — the v2 BYTE scheme, layered.
  */
private[laz] final class Byte14DecItem(size: Int) extends Item14Dec {
  override def nLayers: Int = size
  private val decs = new Array[ArithmeticDecoder](size)

  override def bind(buf: Array[Byte], start: Int, sizes: Array[Int]): Int = {
    var p = start
    var i = 0
    while (i < size) {
      decs(i) = if (sizes(i) > 0) new ArithmeticDecoder(buf, p, p + sizes(i)) else null
      p += sizes(i)
      i += 1
    }
    p
  }

  private final class BCtx(seed: Array[Byte], seedOff: Int) {
    val models: Array[SymbolModel] = Array.fill(size)(new SymbolModel(256, withTable = true))
    val last = new Array[Byte](size)
    System.arraycopy(seed, seedOff, last, 0, size)
  }

  private val ctxs = new Array[BCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = ctx.c
    ctxs(cur) = new BCtx(first, off)
  }

  override def read(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    if (ctx.c != cur) {
      if (ctxs(ctx.c) == null) ctxs(ctx.c) = new BCtx(ctxs(cur).last, 0)
      cur = ctx.c
    }
    val cc = ctxs(cur)
    var i = 0
    while (i < size) {
      cc.last(i) = ((decs(i).decodeSymbol(cc.models(i)) + (cc.last(i) & 0xFF)) & 0xFF).toByte
      item(off + i) = cc.last(i)
      i += 1
    }
  }
}

private[laz] final class Byte14EncItem(size: Int) extends Item14Enc {
  private val lays: Array[Layer14] = Array.fill(size)(new Layer14)

  private final class BCtx(seed: Array[Byte], seedOff: Int) {
    val models: Array[SymbolModel] = Array.fill(size)(new SymbolModel(256, withTable = false))
    val last = new Array[Byte](size)
    System.arraycopy(seed, seedOff, last, 0, size)
  }

  private val ctxs = new Array[BCtx](4)
  private var cur = 0

  override def init(first: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    java.util.Arrays.fill(ctxs.asInstanceOf[Array[AnyRef]], null)
    cur = ctx.c
    ctxs(cur) = new BCtx(first, off)
  }

  override def write(item: Array[Byte], off: Int, ctx: Ctx14): Unit = {
    if (ctx.c != cur) {
      if (ctxs(ctx.c) == null) ctxs(ctx.c) = new BCtx(ctxs(cur).last, 0)
      cur = ctx.c
    }
    val cc = ctxs(cur)
    var i = 0
    while (i < size) {
      lays(i).mark()
      lays(i).enc.encodeSymbol(cc.models(i), ((item(off + i) & 0xFF) - (cc.last(i) & 0xFF)) & 0xFF)
      cc.last(i) = item(off + i)
      i += 1
    }
  }

  override def layerBytes(): Array[Array[Byte]] = lays.map(_.bytes())
}
