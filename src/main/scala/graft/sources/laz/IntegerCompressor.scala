package graft.sources.laz

/** Predictive integer codec on top of the arithmetic coder — the LASzip
  * "integer compressor" scheme (public spec): a correction
  * `real - pred` is coded as (k, offset-within-interval) where k is the
  * bit width of the tightest interval [-(2^k - 1), 2^k] containing it;
  * k goes through a per-context adaptive model, the low bits of large
  * offsets go raw. `k` after each call feeds the caller's context
  * chaining (the POINT10 x->y->z cascade).
  */
object IntCodec {
  /** Correction range descriptor for a bit width (16-bit wrap for
    * intensity-style fields, full 32-bit otherwise).
    */
  final case class Range(corrBits: Int, corrRange: Long, corrMin: Int, corrMax: Int)

  def range(bits: Int): Range =
    if (bits > 0 && bits < 32) {
      val corrRange = 1L << bits
      val corrMin = -(corrRange / 2).toInt
      Range(bits, corrRange, corrMin, corrMin + corrRange.toInt - 1)
    } else Range(32, 0L, Int.MinValue, Int.MaxValue)

  val BitsHigh = 8
}

final class IntDecompressor(dec: ArithmeticDecoder, bits: Int, contexts: Int) {
  private val r = IntCodec.range(bits)
  private val mBits = Array.fill(contexts)(new SymbolModel(r.corrBits + 1, withTable = true))
  private val mCorrector0 = new BitModel
  private val mCorrector: Array[SymbolModel] = {
    val arr = new Array[SymbolModel](r.corrBits + 1)
    var i = 1
    while (i <= r.corrBits) {
      arr(i) = new SymbolModel(
        if (i <= IntCodec.BitsHigh) 1 << i else 1 << IntCodec.BitsHigh, withTable = true)
      i += 1
    }
    arr
  }
  /** Bit width of the last correction (context chaining). */
  var k = 0

  def decompress(pred: Int, context: Int): Int = {
    var real = pred + readCorrector(mBits(context))
    if (r.corrRange != 0) {
      if (real < 0) real += r.corrRange.toInt
      else if (real >= r.corrRange) real -= r.corrRange.toInt
    }
    real
  }

  private def readCorrector(mK: SymbolModel): Int = {
    k = dec.decodeSymbol(mK)
    if (k != 0) {
      if (k < 32) {
        var c =
          if (k <= IntCodec.BitsHigh) dec.decodeSymbol(mCorrector(k))
          else {
            val k1 = k - IntCodec.BitsHigh
            val high = dec.decodeSymbol(mCorrector(k))
            val low = dec.readBits(k1)
            ((high.toLong << k1) | low).toInt
          }
        // translate the k-bit offset back into the signed correction
        if (c >= (1 << (k - 1))) c += 1
        else c -= ((1 << k) - 1)
        c
      } else r.corrMin
    } else dec.decodeBit(mCorrector0)
  }
}

final class IntCompressor(enc: ArithmeticEncoder, bits: Int, contexts: Int) {
  private val r = IntCodec.range(bits)
  private val mBits = Array.fill(contexts)(new SymbolModel(r.corrBits + 1, withTable = false))
  private val mCorrector0 = new BitModel
  private val mCorrector: Array[SymbolModel] = {
    val arr = new Array[SymbolModel](r.corrBits + 1)
    var i = 1
    while (i <= r.corrBits) {
      arr(i) = new SymbolModel(
        if (i <= IntCodec.BitsHigh) 1 << i else 1 << IntCodec.BitsHigh, withTable = false)
      i += 1
    }
    arr
  }
  var k = 0

  def compress(pred: Int, real: Int, context: Int): Unit = {
    var corr = real - pred
    if (r.corrRange != 0) {
      if (corr < r.corrMin) corr += r.corrRange.toInt
      else if (corr > r.corrMax) corr -= r.corrRange.toInt
    }
    writeCorrector(corr, mBits(context))
  }

  private def writeCorrector(corr: Int, mK: SymbolModel): Unit = {
    var c = corr
    // tightest interval [-(2^k - 1), 2^k] containing c (c == 2^k maps to
    // width k, hence the c-1 on the positive side)
    k = 0
    var c1 = if (c <= 0) -c.toLong else c.toLong - 1
    while (c1 != 0) { c1 >>= 1; k += 1 }
    enc.encodeSymbol(mK, k)
    if (k != 0) {
      if (k < 32) {
        // translate into the k-bit offset [0, 2^k - 1]
        if (c >= 0) c -= 1
        else c += (1 << k) - 1
        if (k <= IntCodec.BitsHigh) enc.encodeSymbol(mCorrector(k), c)
        else {
          val k1 = k - IntCodec.BitsHigh
          val low = c & ((1 << k1) - 1)
          val high = c >>> k1
          enc.encodeSymbol(mCorrector(k), high)
          enc.writeBits(k1, low.toLong)
        }
      }
      // k == 32: the correction is corr_min; the width alone encodes it
    } else {
      enc.encodeBit(mCorrector0, c)
    }
  }
}
