package graft.sources.laz

/** LASzip v2 per-item codecs for the point formats EPT trees serve
  * (LAS 1.2 formats 0-3 plus extra bytes): POINT10, GPSTIME11, RGB12,
  * BYTE. Each codec pair implements the published pointwise prediction
  * scheme — POINT10 predicts x/y deltas with a 5-value streaming median
  * keyed by the return configuration, z by return level, GPSTIME11
  * tracks four interleaved pulse sequences with multiplier-coded
  * deltas, RGB12 codes per-byte deltas with red-delta chaining, BYTE
  * codes plain per-byte deltas.
  *
  * Every decoder reads/writes the item's bytes at the LAS uncompressed
  * record layout, so a decoded point record is byte-identical to its
  * uncompressed twin.
  */
private[laz] object Items {

  /** Streaming median of the last five values (the POINT10 x/y delta
    * predictor): alternating high/low insertion, median = slot 2.
    */
  final class StreamingMedian5 {
    private val v = new Array[Int](5)
    private var high = true

    def add(x: Int): Unit = {
      if (high) {
        if (x < v(2)) {
          v(4) = v(3); v(3) = v(2)
          if (x < v(0)) { v(2) = v(1); v(1) = v(0); v(0) = x }
          else if (x < v(1)) { v(2) = v(1); v(1) = x }
          else v(2) = x
        } else {
          if (x < v(3)) { v(4) = v(3); v(3) = x }
          else v(4) = x
          high = false
        }
      } else {
        if (v(2) < x) {
          v(0) = v(1); v(1) = v(2)
          if (v(4) < x) { v(2) = v(3); v(3) = v(4); v(4) = x }
          else if (v(3) < x) { v(2) = v(3); v(3) = x }
          else v(2) = x
        } else {
          if (v(1) < x) { v(0) = v(1); v(1) = x }
          else v(0) = x
          high = true
        }
      }
    }

    def get: Int = v(2)
  }

  /** Return-configuration context tables (public LASzip v2 constants):
    * map (number_of_returns, return_number) to one of 16 prediction
    * streams / 8 height levels.
    */
  val NumberReturnMap: Array[Array[Int]] = Array(
    Array(15, 14, 13, 12, 11, 10, 9, 8),
    Array(14, 0, 1, 3, 6, 10, 10, 9),
    Array(13, 1, 2, 4, 7, 11, 11, 10),
    Array(12, 3, 4, 5, 8, 12, 12, 11),
    Array(11, 6, 7, 8, 9, 13, 13, 12),
    Array(10, 10, 11, 12, 13, 14, 14, 13),
    Array(9, 10, 11, 12, 13, 14, 15, 14),
    Array(8, 9, 10, 11, 12, 13, 14, 15))

  val NumberReturnLevel: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7),
    Array(1, 0, 1, 2, 3, 4, 5, 6),
    Array(2, 1, 0, 1, 2, 3, 4, 5),
    Array(3, 2, 1, 0, 1, 2, 3, 4),
    Array(4, 3, 2, 1, 0, 1, 2, 3),
    Array(5, 4, 3, 2, 1, 0, 1, 2),
    Array(6, 5, 4, 3, 2, 1, 0, 1),
    Array(7, 6, 5, 4, 3, 2, 1, 0))

  // little-endian field access over a point record buffer
  def getU16(b: Array[Byte], off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
  }
  def getI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) | ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
    b(off + 2) = ((v >>> 16) & 0xFF).toByte
    b(off + 3) = ((v >>> 24) & 0xFF).toByte
  }
  def getI64(b: Array[Byte], off: Int): Long =
    (getI32(b, off).toLong & 0xFFFFFFFFL) | (getI32(b, off + 4).toLong << 32)
  def putI64(b: Array[Byte], off: Int, v: Long): Unit = {
    putI32(b, off, (v & 0xFFFFFFFFL).toInt)
    putI32(b, off + 4, (v >>> 32).toInt)
  }

  def u8Clamp(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x
}

/** One LASzip item codec: reads or writes `size` bytes of the point
  * record at `off`, using the shared entropy coder.
  */
private[laz] sealed trait ItemDec { def read(item: Array[Byte], off: Int): Unit }
private[laz] sealed trait ItemEnc { def write(item: Array[Byte], off: Int): Unit }

// ---------------------------------------------------------------- POINT10

private[laz] final class Point10Dec(dec: ArithmeticDecoder, first: Array[Byte], firstOff: Int)
  extends ItemDec {
  import Items._

  private val mChanged = new SymbolModel(64, withTable = true)
  private val mScanAngleRank =
    Array(new SymbolModel(256, withTable = true), new SymbolModel(256, withTable = true))
  private val mBitByte = new Array[SymbolModel](256)
  private val mClassification = new Array[SymbolModel](256)
  private val mUserData = new Array[SymbolModel](256)
  private val icIntensity = new IntDecompressor(dec, 16, 4)
  private val icPsid = new IntDecompressor(dec, 16, 1)
  private val icDx = new IntDecompressor(dec, 32, 2)
  private val icDy = new IntDecompressor(dec, 32, 22)
  private val icZ = new IntDecompressor(dec, 32, 20)
  private val lastXMed = Array.fill(16)(new StreamingMedian5)
  private val lastYMed = Array.fill(16)(new StreamingMedian5)
  private val lastIntensity = new Array[Int](16)
  private val lastHeight = new Array[Int](8)

  // the 20-byte running "last" record
  private val last = new Array[Byte](20)
  System.arraycopy(first, firstOff, last, 0, 20)
  // intensity of the initial last record is zero by spec
  last(12) = 0
  last(13) = 0

  private def lazily(arr: Array[SymbolModel], ctx: Int): SymbolModel = {
    if (arr(ctx) == null) arr(ctx) = new SymbolModel(256, withTable = true)
    arr(ctx)
  }

  override def read(item: Array[Byte], off: Int): Unit = {
    val changed = dec.decodeSymbol(mChanged)
    var r = 0; var n = 0; var m = 0; var l = 0
    if (changed != 0) {
      if ((changed & 32) != 0) {
        val ctx = last(14) & 0xFF
        last(14) = dec.decodeSymbol(lazily(mBitByte, ctx)).toByte
      }
      val flags = last(14) & 0xFF
      r = flags & 7
      n = (flags >>> 3) & 7
      m = NumberReturnMap(n)(r)
      l = NumberReturnLevel(n)(r)
      if ((changed & 16) != 0) {
        val inten = icIntensity.decompress(lastIntensity(m), if (m < 3) m else 3) & 0xFFFF
        putU16(last, 12, inten)
        lastIntensity(m) = inten
      } else {
        putU16(last, 12, lastIntensity(m))
      }
      if ((changed & 8) != 0) {
        val ctx = last(15) & 0xFF
        last(15) = dec.decodeSymbol(lazily(mClassification, ctx)).toByte
      }
      if ((changed & 4) != 0) {
        val f = (last(14) >>> 6) & 1
        val v = dec.decodeSymbol(mScanAngleRank(f))
        last(16) = ((v + (last(16) & 0xFF)) & 0xFF).toByte
      }
      if ((changed & 2) != 0) {
        val ctx = last(17) & 0xFF
        last(17) = dec.decodeSymbol(lazily(mUserData, ctx)).toByte
      }
      if ((changed & 1) != 0) {
        putU16(last, 18, icPsid.decompress(getU16(last, 18), 0) & 0xFFFF)
      }
    } else {
      val flags = last(14) & 0xFF
      r = flags & 7
      n = (flags >>> 3) & 7
      m = NumberReturnMap(n)(r)
      l = NumberReturnLevel(n)(r)
    }

    // x
    val medX = lastXMed(m).get
    val diffX = icDx.decompress(medX, if (n == 1) 1 else 0)
    putI32(last, 0, getI32(last, 0) + diffX)
    lastXMed(m).add(diffX)
    // y, contexted by x's correction width
    val medY = lastYMed(m).get
    val kX = icDx.k
    val diffY = icDy.decompress(
      medY, (if (n == 1) 1 else 0) + (if (kX < 20) kX & 0xFFFFFFFE else 20))
    putI32(last, 4, getI32(last, 4) + diffY)
    lastYMed(m).add(diffY)
    // z, absolute against the height of this return level
    val kXY = (icDx.k + icDy.k) / 2
    val z = icZ.decompress(
      lastHeight(l), (if (n == 1) 1 else 0) + (if (kXY < 18) kXY & 0xFFFFFFFE else 18))
    putI32(last, 8, z)
    lastHeight(l) = z

    System.arraycopy(last, 0, item, off, 20)
  }
}

private[laz] final class Point10Enc(enc: ArithmeticEncoder, first: Array[Byte], firstOff: Int)
  extends ItemEnc {
  import Items._

  private val mChanged = new SymbolModel(64, withTable = false)
  private val mScanAngleRank =
    Array(new SymbolModel(256, withTable = false), new SymbolModel(256, withTable = false))
  private val mBitByte = new Array[SymbolModel](256)
  private val mClassification = new Array[SymbolModel](256)
  private val mUserData = new Array[SymbolModel](256)
  private val icIntensity = new IntCompressor(enc, 16, 4)
  private val icPsid = new IntCompressor(enc, 16, 1)
  private val icDx = new IntCompressor(enc, 32, 2)
  private val icDy = new IntCompressor(enc, 32, 22)
  private val icZ = new IntCompressor(enc, 32, 20)
  private val lastXMed = Array.fill(16)(new StreamingMedian5)
  private val lastYMed = Array.fill(16)(new StreamingMedian5)
  private val lastIntensity = new Array[Int](16)
  private val lastHeight = new Array[Int](8)

  private val last = new Array[Byte](20)
  System.arraycopy(first, firstOff, last, 0, 20)
  last(12) = 0
  last(13) = 0

  private def lazily(arr: Array[SymbolModel], ctx: Int): SymbolModel = {
    if (arr(ctx) == null) arr(ctx) = new SymbolModel(256, withTable = false)
    arr(ctx)
  }

  override def write(item: Array[Byte], off: Int): Unit = {
    val flags = item(off + 14) & 0xFF
    val r = flags & 7
    val n = (flags >>> 3) & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)
    val intensity = getU16(item, off + 12)

    var changed = 0
    if (last(14) != item(off + 14)) changed |= 32
    if (lastIntensity(m) != intensity) changed |= 16
    if (last(15) != item(off + 15)) changed |= 8
    if (last(16) != item(off + 16)) changed |= 4
    if (last(17) != item(off + 17)) changed |= 2
    if (getU16(last, 18) != getU16(item, off + 18)) changed |= 1
    enc.encodeSymbol(mChanged, changed)

    if ((changed & 32) != 0) {
      val ctx = last(14) & 0xFF
      enc.encodeSymbol(lazily(mBitByte, ctx), item(off + 14) & 0xFF)
    }
    if ((changed & 16) != 0) {
      icIntensity.compress(lastIntensity(m), intensity, if (m < 3) m else 3)
      lastIntensity(m) = intensity
    }
    if ((changed & 8) != 0) {
      val ctx = last(15) & 0xFF
      enc.encodeSymbol(lazily(mClassification, ctx), item(off + 15) & 0xFF)
    }
    if ((changed & 4) != 0) {
      val f = (flags >>> 6) & 1
      enc.encodeSymbol(mScanAngleRank(f), ((item(off + 16) & 0xFF) - (last(16) & 0xFF)) & 0xFF)
    }
    if ((changed & 2) != 0) {
      val ctx = last(17) & 0xFF
      enc.encodeSymbol(lazily(mUserData, ctx), item(off + 17) & 0xFF)
    }
    if ((changed & 1) != 0) {
      icPsid.compress(getU16(last, 18), getU16(item, off + 18), 0)
    }

    // x
    val medX = lastXMed(m).get
    val diffX = getI32(item, off) - getI32(last, 0)
    icDx.compress(medX, diffX, if (n == 1) 1 else 0)
    lastXMed(m).add(diffX)
    // y
    val medY = lastYMed(m).get
    val kX = icDx.k
    val diffY = getI32(item, off + 4) - getI32(last, 4)
    icDy.compress(medY, diffY, (if (n == 1) 1 else 0) + (if (kX < 20) kX & 0xFFFFFFFE else 20))
    lastYMed(m).add(diffY)
    // z
    val kXY = (icDx.k + icDy.k) / 2
    val z = getI32(item, off + 8)
    icZ.compress(
      lastHeight(l), z, (if (n == 1) 1 else 0) + (if (kXY < 18) kXY & 0xFFFFFFFE else 18))
    lastHeight(l) = z

    System.arraycopy(item, off, last, 0, 20)
  }
}

// -------------------------------------------------------------- GPSTIME11

private[laz] object GpsTime {
  val Multi = 500
  val MultiMinus = -10
  val MultiUnchanged: Int = Multi - MultiMinus + 1 // 511
  val MultiCodeFull: Int = Multi - MultiMinus + 2 // 512
  val MultiTotal: Int = Multi - MultiMinus + 6 // 516

  def quantize(f: Float): Int = if (f >= 0) (f + 0.5f).toInt else (f - 0.5f).toInt
}

private[laz] final class GpsTime11Dec(dec: ArithmeticDecoder, first: Array[Byte], firstOff: Int)
  extends ItemDec {
  import Items._

  private val mMulti = new SymbolModel(GpsTime.MultiTotal, withTable = true)
  private val mZeroDiff = new SymbolModel(6, withTable = true)
  private val icGps = new IntDecompressor(dec, 32, 9)
  private[laz] val lastGps = new Array[Long](4)
  private val lastDiff = new Array[Int](4)
  private val extreme = new Array[Int](4)
  private[laz] var last = 0
  // Independent slot-allocation cursor: advances ONLY when a huge (>32-bit)
  // difference opens a new sequence slot, and does NOT follow sequence
  // switches — matching the published LASzip v2 algorithm. Using
  // (last+1)&3 here instead desynchronizes against real laszip streams
  // with interleaved flight lines. (private[laz] so LazSpec can pin the
  // slot-machine trace against a hand-derived trace of the algorithm.)
  private[laz] var next = 0

  lastGps(0) = getI64(first, firstOff)

  override def read(item: Array[Byte], off: Int): Unit = {
    if (lastDiff(last) == 0) {
      val multi = dec.decodeSymbol(mZeroDiff)
      if (multi == 1) {
        val d = icGps.decompress(0, 0)
        lastDiff(last) = d
        lastGps(last) += d
        extreme(last) = 0
      } else if (multi == 2) {
        next = (next + 1) & 3
        val high = icGps.decompress((lastGps(last) >>> 32).toInt, 8)
        lastGps(next) = ((high.toLong & 0xFFFFFFFFL) << 32) | dec.readInt()
        last = next
        lastDiff(last) = 0
        extreme(last) = 0
      } else if (multi > 2) {
        last = (last + multi - 2) & 3
        read(item, off)
        return
      }
      // multi == 0: unchanged
    } else {
      val multi = dec.decodeSymbol(mMulti)
      if (multi == 1) {
        lastGps(last) += icGps.decompress(lastDiff(last), 1)
        extreme(last) = 0
      } else if (multi < GpsTime.MultiUnchanged) {
        var d = 0
        if (multi == 0) {
          d = icGps.decompress(0, 7)
          extreme(last) += 1
          if (extreme(last) > 3) { lastDiff(last) = d; extreme(last) = 0 }
        } else if (multi < GpsTime.Multi) {
          d =
            if (multi < 10) icGps.decompress(multi * lastDiff(last), 2)
            else icGps.decompress(multi * lastDiff(last), 3)
        } else if (multi == GpsTime.Multi) {
          d = icGps.decompress(GpsTime.Multi * lastDiff(last), 4)
          extreme(last) += 1
          if (extreme(last) > 3) { lastDiff(last) = d; extreme(last) = 0 }
        } else {
          val neg = GpsTime.Multi - multi // in [-1, -10]
          if (neg > GpsTime.MultiMinus) {
            d = icGps.decompress(neg * lastDiff(last), 5)
          } else {
            d = icGps.decompress(GpsTime.MultiMinus * lastDiff(last), 6)
            extreme(last) += 1
            if (extreme(last) > 3) { lastDiff(last) = d; extreme(last) = 0 }
          }
        }
        lastGps(last) += d
      } else if (multi == GpsTime.MultiCodeFull) {
        next = (next + 1) & 3
        val high = icGps.decompress((lastGps(last) >>> 32).toInt, 8)
        lastGps(next) = ((high.toLong & 0xFFFFFFFFL) << 32) | dec.readInt()
        last = next
        lastDiff(last) = 0
        extreme(last) = 0
      } else if (multi > GpsTime.MultiCodeFull) {
        last = (last + multi - GpsTime.MultiCodeFull) & 3
        read(item, off)
        return
      }
      // multi == MultiUnchanged (511): gps time repeats exactly
    }
    putI64(item, off, lastGps(last))
  }
}

private[laz] final class GpsTime11Enc(enc: ArithmeticEncoder, first: Array[Byte], firstOff: Int)
  extends ItemEnc {
  import Items._

  private val mMulti = new SymbolModel(GpsTime.MultiTotal, withTable = false)
  private val mZeroDiff = new SymbolModel(6, withTable = false)
  private val icGps = new IntCompressor(enc, 32, 9)
  private[laz] val lastGps = new Array[Long](4)
  private val lastDiff = new Array[Int](4)
  private val extreme = new Array[Int](4)
  private[laz] var last = 0
  // Independent slot-allocation cursor — see GpsTime11Dec. Must mirror the
  // decoder exactly or files written here are mis-decoded by real laszip.
  private[laz] var next = 0

  lastGps(0) = getI64(first, firstOff)

  override def write(item: Array[Byte], off: Int): Unit = {
    val curr = getI64(item, off)
    if (lastDiff(last) == 0) {
      if (curr == lastGps(last)) {
        enc.encodeSymbol(mZeroDiff, 0)
      } else {
        val diff64 = curr - lastGps(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          enc.encodeSymbol(mZeroDiff, 1)
          icGps.compress(0, diff32, 0)
          lastDiff(last) = diff32
          extreme(last) = 0
          lastGps(last) = curr
        } else {
          // another open sequence may be within a 32-bit hop
          var i = 1
          while (i < 4) {
            val other = curr - lastGps((last + i) & 3)
            if (other == other.toInt.toLong) {
              enc.encodeSymbol(mZeroDiff, i + 2)
              last = (last + i) & 3
              write(item, off)
              return
            }
            i += 1
          }
          enc.encodeSymbol(mZeroDiff, 2)
          icGps.compress((lastGps(last) >>> 32).toInt, (curr >>> 32).toInt, 8)
          enc.writeInt(curr & 0xFFFFFFFFL)
          next = (next + 1) & 3
          lastGps(next) = curr
          last = next
          lastDiff(last) = 0
          extreme(last) = 0
        }
      }
    } else {
      if (curr == lastGps(last)) {
        enc.encodeSymbol(mMulti, GpsTime.MultiUnchanged)
      } else {
        val diff64 = curr - lastGps(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          val multi = GpsTime.quantize(diff32.toFloat / lastDiff(last).toFloat)
          if (multi == 1) {
            enc.encodeSymbol(mMulti, 1)
            icGps.compress(lastDiff(last), diff32, 1)
            extreme(last) = 0
          } else if (multi > 0) {
            if (multi < GpsTime.Multi) {
              enc.encodeSymbol(mMulti, multi)
              if (multi < 10) icGps.compress(multi * lastDiff(last), diff32, 2)
              else icGps.compress(multi * lastDiff(last), diff32, 3)
            } else {
              enc.encodeSymbol(mMulti, GpsTime.Multi)
              icGps.compress(GpsTime.Multi * lastDiff(last), diff32, 4)
              extreme(last) += 1
              if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
            }
          } else if (multi < 0) {
            if (multi > GpsTime.MultiMinus) {
              enc.encodeSymbol(mMulti, GpsTime.Multi - multi)
              icGps.compress(multi * lastDiff(last), diff32, 5)
            } else {
              enc.encodeSymbol(mMulti, GpsTime.Multi - GpsTime.MultiMinus)
              icGps.compress(GpsTime.MultiMinus * lastDiff(last), diff32, 6)
              extreme(last) += 1
              if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
            }
          } else {
            enc.encodeSymbol(mMulti, 0)
            icGps.compress(0, diff32, 7)
            extreme(last) += 1
            if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
          }
          lastGps(last) = curr
        } else {
          var i = 1
          while (i < 4) {
            val other = curr - lastGps((last + i) & 3)
            if (other == other.toInt.toLong) {
              enc.encodeSymbol(mMulti, GpsTime.MultiCodeFull + i)
              last = (last + i) & 3
              write(item, off)
              return
            }
            i += 1
          }
          enc.encodeSymbol(mMulti, GpsTime.MultiCodeFull)
          icGps.compress((lastGps(last) >>> 32).toInt, (curr >>> 32).toInt, 8)
          enc.writeInt(curr & 0xFFFFFFFFL)
          next = (next + 1) & 3
          lastGps(next) = curr
          last = next
          lastDiff(last) = 0
          extreme(last) = 0
        }
      }
    }
  }
}

// ----------------------------------------------------------------- RGB12

private[laz] final class Rgb12Dec(dec: ArithmeticDecoder, first: Array[Byte], firstOff: Int)
  extends ItemDec {
  import Items._

  private val mByteUsed = new SymbolModel(128, withTable = true)
  private val mDiff = Array.fill(6)(new SymbolModel(256, withTable = true))
  private val last = new Array[Int](3)
  last(0) = getU16(first, firstOff)
  last(1) = getU16(first, firstOff + 2)
  last(2) = getU16(first, firstOff + 4)

  override def read(item: Array[Byte], off: Int): Unit = {
    val sym = dec.decodeSymbol(mByteUsed)
    var r = 0; var g = 0; var b = 0
    r =
      if ((sym & 1) != 0) (dec.decodeSymbol(mDiff(0)) + (last(0) & 0xFF)) & 0xFF
      else last(0) & 0xFF
    r |=
      (if ((sym & 2) != 0) ((dec.decodeSymbol(mDiff(1)) + (last(0) >>> 8)) & 0xFF) << 8
       else last(0) & 0xFF00)
    if ((sym & 64) != 0) {
      var diff = (r & 0xFF) - (last(0) & 0xFF)
      g =
        if ((sym & 4) != 0) (dec.decodeSymbol(mDiff(2)) + u8Clamp(diff + (last(1) & 0xFF))) & 0xFF
        else last(1) & 0xFF
      if ((sym & 16) != 0) {
        diff = (diff + ((g & 0xFF) - (last(1) & 0xFF))) / 2
        b = (dec.decodeSymbol(mDiff(4)) + u8Clamp(diff + (last(2) & 0xFF))) & 0xFF
      } else b = last(2) & 0xFF
      diff = (r >>> 8) - (last(0) >>> 8)
      g |=
        (if ((sym & 8) != 0) ((dec.decodeSymbol(mDiff(3)) + u8Clamp(diff + (last(1) >>> 8))) & 0xFF) << 8
         else last(1) & 0xFF00)
      if ((sym & 32) != 0) {
        diff = (diff + ((g >>> 8) - (last(1) >>> 8))) / 2
        b |= ((dec.decodeSymbol(mDiff(5)) + u8Clamp(diff + (last(2) >>> 8))) & 0xFF) << 8
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

private[laz] final class Rgb12Enc(enc: ArithmeticEncoder, first: Array[Byte], firstOff: Int)
  extends ItemEnc {
  import Items._

  private val mByteUsed = new SymbolModel(128, withTable = false)
  private val mDiff = Array.fill(6)(new SymbolModel(256, withTable = false))
  private val last = new Array[Int](3)
  last(0) = getU16(first, firstOff)
  last(1) = getU16(first, firstOff + 2)
  last(2) = getU16(first, firstOff + 4)

  override def write(item: Array[Byte], off: Int): Unit = {
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
    enc.encodeSymbol(mByteUsed, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(mDiff(0), ((r & 0xFF) - (last(0) & 0xFF)) & 0xFF)
    if ((sym & 2) != 0) enc.encodeSymbol(mDiff(1), ((r >>> 8) - (last(0) >>> 8)) & 0xFF)
    if ((sym & 64) != 0) {
      var diff = (r & 0xFF) - (last(0) & 0xFF)
      if ((sym & 4) != 0)
        enc.encodeSymbol(mDiff(2), ((g & 0xFF) - u8Clamp(diff + (last(1) & 0xFF))) & 0xFF)
      if ((sym & 16) != 0) {
        diff = (diff + ((g & 0xFF) - (last(1) & 0xFF))) / 2
        enc.encodeSymbol(mDiff(4), ((b & 0xFF) - u8Clamp(diff + (last(2) & 0xFF))) & 0xFF)
      }
      diff = (r >>> 8) - (last(0) >>> 8)
      if ((sym & 8) != 0)
        enc.encodeSymbol(mDiff(3), ((g >>> 8) - u8Clamp(diff + (last(1) >>> 8))) & 0xFF)
      if ((sym & 32) != 0) {
        diff = (diff + ((g >>> 8) - (last(1) >>> 8))) / 2
        enc.encodeSymbol(mDiff(5), ((b >>> 8) - u8Clamp(diff + (last(2) >>> 8))) & 0xFF)
      }
    }
    last(0) = r; last(1) = g; last(2) = b
  }
}

// ------------------------------------------------------------------ BYTE

private[laz] final class ByteDec(dec: ArithmeticDecoder, size: Int, first: Array[Byte], firstOff: Int)
  extends ItemDec {
  private val models = Array.fill(size)(new SymbolModel(256, withTable = true))
  private val last = new Array[Byte](size)
  System.arraycopy(first, firstOff, last, 0, size)

  override def read(item: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < size) {
      last(i) = ((dec.decodeSymbol(models(i)) + (last(i) & 0xFF)) & 0xFF).toByte
      item(off + i) = last(i)
      i += 1
    }
  }
}

private[laz] final class ByteEnc(enc: ArithmeticEncoder, size: Int, first: Array[Byte], firstOff: Int)
  extends ItemEnc {
  private val models = Array.fill(size)(new SymbolModel(256, withTable = false))
  private val last = new Array[Byte](size)
  System.arraycopy(first, firstOff, last, 0, size)

  override def write(item: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < size) {
      enc.encodeSymbol(models(i), ((item(off + i) & 0xFF) - (last(i) & 0xFF)) & 0xFF)
      last(i) = item(off + i)
      i += 1
    }
  }
}
