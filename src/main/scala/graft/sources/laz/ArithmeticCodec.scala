package graft.sources.laz

/** Adaptive arithmetic coder — the entropy layer of the LASzip format
  * (public spec; the coder is Amir Said's FastAC scheme, documented in
  * "Introducing the FastAC Arithmetic Coding Library" and used verbatim
  * by the open LASzip reference implementation). Implemented here from
  * the published algorithm: 32-bit range coder state, adaptive
  * frequency models with periodic halving, and a decoder lookup table
  * for models above 16 symbols.
  *
  * All 32-bit unsigned state lives in `Long`s masked to 32 bits —
  * products like `distribution * length` stay below 2^47, so plain Long
  * arithmetic is exact and the carry is detected as bit 32 instead of
  * C's wraparound compare.
  *
  * Reference behavior (not code): /root/reference uses PDAL's laszip to
  * read EPT payloads (scripts/usgs_lidar.py:118-124); this codec is what
  * lets [[graft.sources.EptSource]] do the same without a native lib.
  */
object Ac {
  val MinLength = 0x01000000L
  val MaxLength = 0xFFFFFFFFL
  val DmLengthShift = 15
  val DmMaxCount: Int = 1 << DmLengthShift
  val BmLengthShift = 13
  val BmMaxCount: Int = 1 << BmLengthShift
}

/** Adaptive binary (bit) model. */
final class BitModel {
  var bit0Prob: Long = 0L
  var bit0Count = 0
  var bitCount = 0
  var updateCycle = 0
  var bitsUntilUpdate = 0
  init()

  def init(): Unit = {
    bit0Count = 1
    bitCount = 2
    bit0Prob = 1L << (Ac.BmLengthShift - 1)
    updateCycle = 4
    bitsUntilUpdate = 4
  }

  def update(): Unit = {
    bitCount += updateCycle
    if (bitCount > Ac.BmMaxCount) {
      bitCount = (bitCount + 1) >> 1
      bit0Count = (bit0Count + 1) >> 1
      if (bit0Count == bitCount) bitCount += 1
    }
    val scale = 0x80000000L / bitCount
    bit0Prob = (bit0Count * scale) >> (31 - Ac.BmLengthShift)
    updateCycle = (5 * updateCycle) >> 2
    if (updateCycle > 64) updateCycle = 64
    bitsUntilUpdate = updateCycle
  }
}

/** Adaptive n-symbol frequency model. `withTable` builds the decoder
  * acceleration table (decode side only, models above 16 symbols).
  */
final class SymbolModel(val symbols: Int, withTable: Boolean) {
  val lastSymbol: Int = symbols - 1
  private val useTable = withTable && symbols > 16
  val (tableSize, tableShift): (Int, Int) =
    if (useTable) {
      var tableBits = 3
      while (symbols > (1 << (tableBits + 2))) tableBits += 1
      (1 << tableBits, Ac.DmLengthShift - tableBits)
    } else (0, 0)
  val distribution = new Array[Long](symbols)
  val symbolCount = new Array[Int](symbols)
  val decoderTable: Array[Int] = if (useTable) new Array[Int](tableSize + 2) else null
  var totalCount = 0
  var updateCycle = 0
  var symbolsUntilUpdate = 0
  init()

  def init(): Unit = {
    totalCount = 0
    updateCycle = symbols
    java.util.Arrays.fill(symbolCount, 1)
    update()
    updateCycle = (symbols + 6) >> 1
    symbolsUntilUpdate = updateCycle
  }

  def update(): Unit = {
    totalCount += updateCycle
    if (totalCount > Ac.DmMaxCount) {
      totalCount = 0
      var k = 0
      while (k < symbols) {
        symbolCount(k) = (symbolCount(k) + 1) >> 1
        totalCount += symbolCount(k)
        k += 1
      }
    }
    val scale = 0x80000000L / totalCount
    var sum = 0L
    var s = 0
    var k = 0
    if (decoderTable == null) {
      while (k < symbols) {
        distribution(k) = (scale * sum) >> (31 - Ac.DmLengthShift)
        sum += symbolCount(k)
        k += 1
      }
    } else {
      while (k < symbols) {
        distribution(k) = (scale * sum) >> (31 - Ac.DmLengthShift)
        sum += symbolCount(k)
        val w = (distribution(k) >> tableShift).toInt
        while (s < w) { s += 1; decoderTable(s) = k - 1 }
        k += 1
      }
      decoderTable(0) = 0
      while (s <= tableSize) { s += 1; decoderTable(s) = symbols - 1 }
    }
    updateCycle = (5 * updateCycle) >> 2
    val maxCycle = (symbols + 6) << 3
    if (updateCycle > maxCycle) updateCycle = maxCycle
    symbolsUntilUpdate = updateCycle
  }
}

/** Range decoder over a byte array slice. Reads past the end yield zero
  * bytes (the final interval-selection bytes of a stream need up to 4
  * bytes of lookahead that the encoder pads).
  */
final class ArithmeticDecoder(buf: Array[Byte], start: Int, end: Int) {
  private var pos = start
  private var value = 0L
  private var length = Ac.MaxLength

  value = (nextByte() << 24) | (nextByte() << 16) | (nextByte() << 8) | nextByte()

  private def nextByte(): Long =
    if (pos < end) { val b = buf(pos) & 0xFFL; pos += 1; b }
    else { pos += 1; 0L }

  /** Bytes consumed so far (including lookahead). */
  def consumed: Int = pos - start

  private def renorm(): Unit = {
    var go = true
    while (go) {
      value = ((value << 8) | nextByte()) & Ac.MaxLength
      length = (length << 8) & Ac.MaxLength
      go = length < Ac.MinLength
    }
  }

  def decodeBit(m: BitModel): Int = {
    val x = m.bit0Prob * (length >>> Ac.BmLengthShift)
    val sym = if (value >= x) 1 else 0
    if (sym == 0) {
      length = x
      m.bit0Count += 1
    } else {
      value -= x
      length -= x
    }
    if (length < Ac.MinLength) renorm()
    m.bitsUntilUpdate -= 1
    if (m.bitsUntilUpdate == 0) m.update()
    sym
  }

  def decodeSymbol(m: SymbolModel): Int = {
    var sym = 0
    var x = 0L
    var y = length
    length >>>= Ac.DmLengthShift
    if (m.decoderTable != null) {
      val dv = value / length
      val t = (dv >> m.tableShift).toInt
      sym = m.decoderTable(t)
      var n = m.decoderTable(t + 1) + 1
      while (n > sym + 1) {
        val k = (sym + n) >>> 1
        if (m.distribution(k) > dv) n = k else sym = k
      }
      x = m.distribution(sym) * length
      if (sym != m.lastSymbol) y = m.distribution(sym + 1) * length
    } else {
      // bisection over the cumulative distribution
      var n = m.symbols
      var k = n >>> 1
      var go = true
      while (go) {
        val z = length * m.distribution(k)
        if (z > value) { n = k; y = z }
        else { sym = k; x = z }
        k = (sym + n) >>> 1
        go = k != sym
      }
    }
    value -= x
    length = y - x
    if (length < Ac.MinLength) renorm()
    m.symbolCount(sym) += 1
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
    sym
  }

  def readBits(bits: Int): Long =
    if (bits > 19) {
      val lower = readShort()
      val upper = readBits(bits - 16)
      (upper << 16) | lower
    } else {
      length >>>= bits
      val sym = value / length
      value -= sym * length
      if (length < Ac.MinLength) renorm()
      sym
    }

  def readShort(): Long = {
    length >>>= 16
    val sym = value / length
    value -= sym * length
    if (length < Ac.MinLength) renorm()
    sym
  }

  def readInt(): Long = {
    val lower = readShort()
    val upper = readShort()
    (upper << 16) | lower
  }
}

/** Range encoder into a growable buffer (carry propagation rewrites
  * already-emitted bytes, so the buffer stays in memory until `done`).
  */
final class ArithmeticEncoder {
  private val buf = new scala.collection.mutable.ArrayBuffer[Byte](1 << 12)
  private var base = 0L
  private var length = Ac.MaxLength

  private def propagateCarry(): Unit = {
    var p = buf.length - 1
    while (p >= 0 && buf(p) == -1) { buf(p) = 0; p -= 1 }
    require(p >= 0, "arithmetic coder carry before first output byte")
    buf(p) = (buf(p) + 1).toByte
  }

  private def addToBase(x: Long): Unit = {
    base += x
    if (base > Ac.MaxLength) {
      base &= Ac.MaxLength
      propagateCarry()
    }
  }

  private def renorm(): Unit = {
    var go = true
    while (go) {
      buf += ((base >>> 24) & 0xFF).toByte
      base = (base << 8) & Ac.MaxLength
      length = (length << 8) & Ac.MaxLength
      go = length < Ac.MinLength
    }
  }

  def encodeBit(m: BitModel, bit: Int): Unit = {
    val x = m.bit0Prob * (length >>> Ac.BmLengthShift)
    if (bit == 0) {
      length = x
      m.bit0Count += 1
    } else {
      addToBase(x)
      length -= x
    }
    if (length < Ac.MinLength) renorm()
    m.bitsUntilUpdate -= 1
    if (m.bitsUntilUpdate == 0) m.update()
  }

  def encodeSymbol(m: SymbolModel, sym: Int): Unit = {
    if (sym == m.lastSymbol) {
      val x = m.distribution(sym) * (length >>> Ac.DmLengthShift)
      addToBase(x)
      length -= x
    } else {
      length >>>= Ac.DmLengthShift
      val x = m.distribution(sym) * length
      addToBase(x)
      length = m.distribution(sym + 1) * length - x
    }
    if (length < Ac.MinLength) renorm()
    m.symbolCount(sym) += 1
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
  }

  def writeBits(bits: Int, v: Long): Unit =
    if (bits > 19) {
      writeShort(v & 0xFFFF)
      writeBits(bits - 16, v >>> 16)
    } else {
      length >>>= bits
      addToBase(v * length)
      if (length < Ac.MinLength) renorm()
    }

  def writeShort(v: Long): Unit = {
    length >>>= 16
    addToBase(v * length)
    if (length < Ac.MinLength) renorm()
  }

  def writeInt(v: Long): Unit = {
    writeShort(v & 0xFFFF)
    writeShort((v >>> 16) & 0xFFFF)
  }

  /** Flush the final interval selection plus the decoder's 4-byte
    * lookahead pad, and return the coded bytes.
    */
  def done(): Array[Byte] = {
    if (length > 2 * Ac.MinLength) {
      addToBase(Ac.MinLength)
      length = Ac.MinLength >>> 1
    } else {
      addToBase(Ac.MinLength >>> 1)
      length = Ac.MinLength >>> 9
    }
    renorm()
    buf += 0; buf += 0; buf += 0
    buf.toArray
  }
}
