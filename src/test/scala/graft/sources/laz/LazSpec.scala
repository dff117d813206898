package graft.sources.laz

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** LASzip codec contract: compress -> decompress is byte-identical to
  * the uncompressed record stream, across point formats 0-3, extra
  * bytes, chunk boundaries, and adversarial value patterns (huge
  * coordinate jumps, gps-time sequence interleaving, constant runs,
  * gray RGB, u16 wraps). Also pins the entropy-layer primitives the
  * item codecs build on.
  */
class LazSpec extends AnyFunSuite with Matchers {

  // -------------------------------------------------------- entropy layer

  test("arithmetic coder round-trips adaptive symbols, bits, raw bits across models") {
    val rnd = new scala.util.Random(42)
    val symCounts = Seq(2, 6, 16, 33, 64, 256, 516)
    val syms = symCounts.map(n => Array.fill(2000)(rnd.nextInt(n)))
    val bits = Array.fill(3000)(rnd.nextInt(2))
    val raws = Array.fill(500)((rnd.nextInt(31) + 1, rnd.nextLong()))

    val enc = new ArithmeticEncoder
    val encModels = symCounts.map(n => new SymbolModel(n, withTable = false))
    val encBit = new BitModel
    for (i <- 0 until 2000; j <- symCounts.indices) enc.encodeSymbol(encModels(j), syms(j)(i))
    bits.foreach(b => enc.encodeBit(encBit, b))
    raws.foreach { case (w, v) => enc.writeBits(w, v & ((1L << w) - 1)) }
    enc.writeInt(0xDEADBEEFL)
    enc.writeShort(0xCAFEL)
    val coded = enc.done()

    val dec = new ArithmeticDecoder(coded, 0, coded.length)
    val decModels = symCounts.map(n => new SymbolModel(n, withTable = true))
    val decBit = new BitModel
    for (i <- 0 until 2000; j <- symCounts.indices)
      dec.decodeSymbol(decModels(j)) shouldBe syms(j)(i)
    bits.foreach(b => dec.decodeBit(decBit) shouldBe b)
    raws.foreach { case (w, v) => dec.readBits(w) shouldBe (v & ((1L << w) - 1)) }
    dec.readInt() shouldBe 0xDEADBEEFL
    dec.readShort() shouldBe 0xCAFEL
  }

  test("integer compressor round-trips corrections of every bit width and both wrap modes") {
    val rnd = new scala.util.Random(7)
    // 32-bit: values spanning the full int range incl. extremes
    val vals32 = Array.fill(3000)(rnd.nextInt()) ++
      Array(Int.MaxValue, Int.MinValue, 0, 1, -1, Int.MinValue + 1)
    val preds32 = vals32.map(_ => rnd.nextInt())
    // 16-bit wrap mode (intensity-style): values in [0, 65535]
    val vals16 = Array.fill(3000)(rnd.nextInt(65536)) ++ Array(0, 65535, 1, 65534)
    val preds16 = vals16.map(_ => rnd.nextInt(65536))

    val enc = new ArithmeticEncoder
    val c32 = new IntCompressor(enc, 32, 4)
    val c16 = new IntCompressor(enc, 16, 2)
    vals32.indices.foreach(i => c32.compress(preds32(i), vals32(i), i % 4))
    vals16.indices.foreach(i => c16.compress(preds16(i), vals16(i), i % 2))
    val coded = enc.done()

    val dec = new ArithmeticDecoder(coded, 0, coded.length)
    val d32 = new IntDecompressor(dec, 32, 4)
    val d16 = new IntDecompressor(dec, 16, 2)
    vals32.indices.foreach(i => d32.decompress(preds32(i), i % 4) shouldBe vals32(i))
    vals16.indices.foreach(i => d16.decompress(preds16(i), i % 2) shouldBe vals16(i))
  }

  test("streaming median5 returns the median of alternating-inserted values") {
    val m = new Items.StreamingMedian5
    m.get shouldBe 0
    Seq(5, 1, 9, 3, 7).foreach(m.add)
    m.get shouldBe 5
    Seq(100, 100, 100, 100, 100).foreach(m.add)
    m.get shouldBe 100
  }

  // ----------------------------------------------------------- point data

  /** Deterministic synthetic flight line: mostly-smooth deltas with
    * planted discontinuities, return-config changes, classification
    * flips, gps-time jumps and sequence interleaves, gray and colored
    * RGB, and extra bytes.
    */
  private def syntheticRecords(n: Int, pointFormat: Int, extraBytes: Int, seed: Int): Array[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    val stride = LazFile.itemsFor(pointFormat, extraBytes).map(_.size).sum
    var x = 431000; var y = 4580000; var z = 120
    var gpsBits = java.lang.Double.doubleToLongBits(211000.25)
    (0 until n).map { i =>
      val rec = new Array[Byte](stride)
      // coordinates: smooth scan with occasional line jumps
      x += (if (i % 97 == 0) rnd.nextInt(2000000) - 1000000 else rnd.nextInt(30) - 5)
      y += (if (i % 131 == 0) rnd.nextInt(400000) - 200000 else rnd.nextInt(7) - 3)
      z += (if (i % 53 == 0) rnd.nextInt(3000) - 1500 else rnd.nextInt(5) - 2)
      Items.putI32(rec, 0, x)
      Items.putI32(rec, 4, y)
      Items.putI32(rec, 8, z)
      // intensity: runs of equal values with bursts
      Items.putU16(rec, 12, if (i % 7 < 5) 180 else rnd.nextInt(65536))
      // return config: mostly (1,1), sometimes multi-return; flags bits
      val r = if (i % 11 == 0) 1 + rnd.nextInt(5) else 1
      val nr = math.max(r, if (i % 11 == 0) 1 + rnd.nextInt(5) else 1)
      val flags = (r & 7) | ((nr & 7) << 3) | ((i % 3) & 1) << 6 | (if (i % 19 == 0) 0x80 else 0)
      rec(14) = flags.toByte
      rec(15) = (if (i % 5 == 0) 2 else if (i % 23 == 0) rnd.nextInt(256) else 1).toByte
      rec(16) = ((i % 60) - 30).toByte // scan angle sweeps
      rec(17) = (i % 4).toByte // user data
      Items.putU16(rec, 18, 4096 + (i % 2)) // point source id
      var off = 20
      if (pointFormat == 1 || pointFormat == 3) {
        // gps time: regular pulse spacing, occasional huge jump, a few
        // exact repeats (the 0diff/multi/full paths)
        if (i % 41 == 0) gpsBits = java.lang.Double.doubleToLongBits(rnd.nextDouble() * 1e6)
        else if (i % 13 != 0) {
          val t = java.lang.Double.longBitsToDouble(gpsBits)
          gpsBits = java.lang.Double.doubleToLongBits(t + 1e-5 * (1 + (i % 3)))
        } // else: repeat the exact previous time
        Items.putI64(rec, off, gpsBits)
        off += 8
      }
      if (pointFormat == 2 || pointFormat == 3) {
        if (i % 6 == 0) {
          val gray = rnd.nextInt(65536)
          Items.putU16(rec, off, gray); Items.putU16(rec, off + 2, gray); Items.putU16(rec, off + 4, gray)
        } else {
          Items.putU16(rec, off, (i * 37) % 65536)
          Items.putU16(rec, off + 2, (i * 53) % 65536)
          Items.putU16(rec, off + 4, (i * 71) % 65536)
        }
        off += 6
      }
      (0 until extraBytes).foreach { e => rec(off + e) = ((i * (e + 3)) % 256).toByte }
      rec
    }.toArray
  }

  private def roundTrip(pointFormat: Int, n: Int, chunkSize: Int, extraBytes: Int = 0, seed: Int = 1): Unit = {
    val recs = syntheticRecords(n, pointFormat, extraBytes, seed)
    val scale = Array(0.01, 0.01, 0.01)
    val offset = Array(0.0, 0.0, 0.0)
    val laz = LazFile.compress(pointFormat, recs, scale, offset, chunkSize, extraBytes)
    val (h, decoded) = LazFile.decompress(laz)
    h.pointFormat shouldBe pointFormat
    h.npoints shouldBe n
    h.compressed shouldBe true
    decoded.length shouldBe n
    var i = 0
    while (i < n) {
      assert(java.util.Arrays.equals(decoded(i), recs(i)),
        s"record $i differs (format $pointFormat, chunkSize $chunkSize)")
      i += 1
    }
    // the uncompressed twin carries the identical record stream
    val las = LazFile.writeUncompressed(pointFormat, recs, scale, offset)
    val (hu, raw) = LazFile.readUncompressed(las)
    hu.recordLength shouldBe h.recordLength
    raw.indices.foreach(i => assert(java.util.Arrays.equals(raw(i), decoded(i))))
    // and the LAZ stream is actually compressed for the smooth fixture
    // (tiny files are all container overhead — only meaningful at size)
    if (n >= 500) assert(laz.length < las.length, s"laz ${laz.length} >= las ${las.length}")
  }

  test("format 0 (POINT10) round-trips bit-identically") { roundTrip(0, 4000, 1000) }
  test("format 1 (POINT10+GPSTIME11) round-trips bit-identically") { roundTrip(1, 4000, 1000) }
  test("format 2 (POINT10+RGB12) round-trips bit-identically") { roundTrip(2, 4000, 1000) }
  test("format 3 (all items) round-trips bit-identically") { roundTrip(3, 4000, 1000) }
  test("extra bytes item round-trips bit-identically") { roundTrip(3, 2000, 700, extraBytes = 5) }

  test("chunk boundaries: counts not divisible by the chunk size, chunk of one, single chunk") {
    roundTrip(3, 2501, 500)
    roundTrip(1, 1001, 1000) // final chunk holds exactly one (raw) point
    roundTrip(0, 999, 50000) // everything in one chunk
    roundTrip(2, 1, 50000) // a single point: raw only, no coded stream
    roundTrip(0, 2, 50000)
  }

  test("adversarial streams: full-range random records survive (no smoothness assumed)") {
    val rnd = new scala.util.Random(99)
    val recs = Array.fill(3000) {
      val rec = new Array[Byte](34)
      rnd.nextBytes(rec)
      // keep return bits parseable (r, n in 0..7 is always true of 3 bits)
      rec
    }
    val laz = LazFile.compress(3, recs, Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0), 1000, 0)
    val (_, decoded) = LazFile.decompress(laz)
    decoded.indices.foreach(i => assert(java.util.Arrays.equals(decoded(i), recs(i)), s"record $i"))
  }

  test("committed fixture: the pinned .laz decodes bit-identically to its uncompressed twin") {
    def resource(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/laz/$name")
      require(in != null, s"missing committed fixture /laz/$name")
      try in.readAllBytes() finally in.close()
    }
    val (hLaz, decoded) = LazFile.decompress(resource("fixture.laz"))
    val (hLas, raw) = LazFile.readUncompressed(resource("fixture.las"))
    hLaz.pointFormat shouldBe 3
    hLaz.npoints shouldBe hLas.npoints
    decoded.length shouldBe raw.length
    decoded.indices.foreach { i =>
      assert(java.util.Arrays.equals(decoded(i), raw(i)), s"fixture record $i differs")
    }
    // and today's encoder still produces the committed byte stream
    // (codec drift detection: models, coder, chunk table, container)
    val reEncoded = LazFile.compress(
      3, MakeLazFixture.records(), Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0),
      chunkSize = 1000, extraBytes = 4)
    assert(java.util.Arrays.equals(reEncoded, resource("fixture.laz")),
      "encoder output drifted from the committed fixture")
  }

  // ------------------------------------------------- LAS 1.4 / layered

  /** Deterministic LAS 1.4 stream: up to `nChannels` interleaved
    * scanner channels (each its own flight line with its own GPS pulse
    * train and coordinate track), multi-returns, classification-flag /
    * scan-direction / edge churn, 2-byte scan angles, point-source
    * changes, RGB (fmt 7/8), NIR (fmt 8), and extra bytes.
    */
  private def syntheticRecords14(
      n: Int, pointFormat: Int, extraBytes: Int, seed: Int, nChannels: Int = 3): Array[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    val stride = LazFile.itemsFor14(pointFormat, extraBytes).map(_.size).sum
    val xs = Array.fill(4)(431000); val ys = Array.fill(4)(4580000); val zs = Array.fill(4)(120)
    val gps = Array.tabulate(4)(c => java.lang.Double.doubleToLongBits(211000.25 + c * 90000))
    (0 until n).map { i =>
      val rec = new Array[Byte](stride)
      // channel switches every few points (interleaved flight lines)
      val ch = (i / (3 + i % 5)) % nChannels
      xs(ch) += (if (i % 97 == 0) rnd.nextInt(2000000) - 1000000 else rnd.nextInt(30) - 5)
      ys(ch) += (if (i % 131 == 0) rnd.nextInt(400000) - 200000 else rnd.nextInt(7) - 3)
      zs(ch) += (if (i % 53 == 0) rnd.nextInt(3000) - 1500 else rnd.nextInt(5) - 2)
      Items.putI32(rec, 0, xs(ch))
      Items.putI32(rec, 4, ys(ch))
      Items.putI32(rec, 8, zs(ch))
      Items.putU16(rec, 12, if (i % 7 < 5) 180 else rnd.nextInt(65536))
      val r = if (i % 11 == 0) 1 + rnd.nextInt(15) else 1
      val nr = math.max(r, if (i % 11 == 0) 1 + rnd.nextInt(15) else 1)
      rec(14) = ((r & 0xF) | ((nr & 0xF) << 4)).toByte
      val cf = if (i % 19 == 0) rnd.nextInt(16) else 0
      val sd = (i % 3) & 1
      val eo = if (i % 23 == 0) 1 else 0
      rec(15) = ((cf & 0xF) | (ch << 4) | (sd << 6) | (eo << 7)).toByte
      rec(16) = (if (i % 5 == 0) 2 else if (i % 29 == 0) rnd.nextInt(256) else 1).toByte
      rec(17) = (i % 4).toByte
      Items.putU16(rec, 18, ((i % 120) - 60) & 0xFFFF) // i16 scan angle sweeps
      Items.putU16(rec, 20, 4096 + (if (i % 41 == 0) i % 3 else 0))
      if (i % 37 != 0) {
        val t = java.lang.Double.longBitsToDouble(gps(ch))
        gps(ch) = java.lang.Double.doubleToLongBits(t + 1e-5 * (1 + (i % 3)))
      } // else exact gps repeat within the channel
      Items.putI64(rec, 22, gps(ch))
      var off = 30
      if (pointFormat == 7 || pointFormat == 8) {
        if (i % 6 == 0) {
          val gray = rnd.nextInt(65536)
          Items.putU16(rec, off, gray); Items.putU16(rec, off + 2, gray); Items.putU16(rec, off + 4, gray)
        } else {
          Items.putU16(rec, off, (i * 37) % 65536)
          Items.putU16(rec, off + 2, (i * 53) % 65536)
          Items.putU16(rec, off + 4, (i * 71) % 65536)
        }
        off += 6
      }
      if (pointFormat == 8) {
        Items.putU16(rec, off, (i * 91) % 65536)
        off += 2
      }
      (0 until extraBytes).foreach { e => rec(off + e) = ((i * (e + 3)) % 256).toByte }
      rec
    }.toArray
  }

  private def roundTrip14(
      pointFormat: Int, n: Int, chunkSize: Int, extraBytes: Int = 0, seed: Int = 1,
      nChannels: Int = 3): Unit = {
    val recs = syntheticRecords14(n, pointFormat, extraBytes, seed, nChannels)
    val scale = Array(0.01, 0.01, 0.01)
    val offset = Array(0.0, 0.0, 0.0)
    val laz = LazFile.compress14(pointFormat, recs, scale, offset, chunkSize, extraBytes)
    val (h, decoded) = LazFile.decompress(laz)
    h.pointFormat shouldBe pointFormat
    h.npoints shouldBe n
    h.compressed shouldBe true
    h.compressor shouldBe LazFile.CompressorLayeredChunked
    decoded.length shouldBe n
    var i = 0
    while (i < n) {
      assert(java.util.Arrays.equals(decoded(i), recs(i)),
        s"record $i differs (format $pointFormat, chunkSize $chunkSize)")
      i += 1
    }
    val las = LazFile.writeUncompressed(pointFormat, recs, scale, offset)
    val (hu, raw) = LazFile.readUncompressed(las)
    hu.recordLength shouldBe h.recordLength
    hu.npoints shouldBe n
    raw.indices.foreach(i => assert(java.util.Arrays.equals(raw(i), decoded(i))))
    if (n >= 500) assert(laz.length < las.length, s"laz ${laz.length} >= las ${las.length}")
  }

  test("format 6 (POINT14, layered) round-trips bit-identically across interleaved channels") {
    roundTrip14(6, 4000, 1000)
  }
  test("format 7 (POINT14+RGB14) round-trips bit-identically") { roundTrip14(7, 4000, 1000) }
  test("format 8 (POINT14+RGBNIR14) round-trips bit-identically") { roundTrip14(8, 4000, 1000) }
  test("LAS 1.4 extra bytes (BYTE14 per-byte layers) round-trip bit-identically") {
    roundTrip14(7, 2000, 700, extraBytes = 5)
  }
  test("LAS 1.4 single channel (no context switches) round-trips") {
    roundTrip14(6, 2000, 800, nChannels = 1)
  }
  test("LAS 1.4 all four channels round-trip") { roundTrip14(8, 3000, 900, nChannels = 4) }

  test("LAS 1.4 chunk edges: odd counts, chunk of one, single chunk, one- and two-point files") {
    roundTrip14(6, 2501, 500)
    roundTrip14(7, 1001, 1000)
    roundTrip14(6, 999, 50000)
    roundTrip14(8, 1, 50000)
    roundTrip14(6, 2, 50000)
  }

  test("LAS 1.4 all-constant tail fields produce zero-byte layers and still round-trip") {
    // constant scan angle / point source / gps -> their layers are empty
    val stride = 30
    val recs = (0 until 1500).map { i =>
      val rec = new Array[Byte](stride)
      Items.putI32(rec, 0, 431000 + i * 3)
      Items.putI32(rec, 4, 4580000 + (i % 7))
      Items.putI32(rec, 8, 120)
      Items.putU16(rec, 12, 200)
      rec(14) = 0x11
      rec(15) = 0
      rec(16) = 2
      rec(17) = 0
      Items.putU16(rec, 18, 100)
      Items.putU16(rec, 20, 4096)
      Items.putI64(rec, 22, java.lang.Double.doubleToLongBits(211000.25))
      rec
    }.toArray
    val laz = LazFile.compress14(6, recs, Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0), 1000, 0)
    val (_, decoded) = LazFile.decompress(laz)
    decoded.indices.foreach(i => assert(java.util.Arrays.equals(decoded(i), recs(i)), s"record $i"))
  }

  test("LAS 1.4 adversarial streams: full-range random records survive") {
    val rnd = new scala.util.Random(177)
    val recs = Array.fill(3000) {
      val rec = new Array[Byte](38)
      rnd.nextBytes(rec)
      rec
    }
    val laz = LazFile.compress14(8, recs, Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0), 1000, 0)
    val (_, decoded) = LazFile.decompress(laz)
    decoded.indices.foreach(i => assert(java.util.Arrays.equals(decoded(i), recs(i)), s"record $i"))
  }

  test("GPSTIME11 slot machine follows the published independent-next-cursor algorithm") {
    // Round-trips cannot distinguish a symmetric deviation from the real
    // LASzip v2 slot allocation (encoder and decoder would err together),
    // so this pins the (last, next, slots) state trace against a
    // hand-derived trace of the published algorithm: `next` advances only
    // when a huge (>32-bit) jump allocates a fresh sequence slot, and does
    // NOT follow sequence switches. The vB1 step is the regression probe —
    // it is only reachable as a 32-bit hop if the vC0 allocation went to
    // slot 2 (independent cursor) instead of clobbering slot 1 ((last+1)&3).
    import Items._
    def rec(v: Long): Array[Byte] = { val a = new Array[Byte](8); putI64(a, 0, v); a }
    val v0 = 1L << 40
    val vA1 = v0 + 5 // small diff on slot 0
    val vB0 = 2L << 40 // huge -> allocates slot 1 (next 0->1)
    val vA2 = v0 + 10 // 32-bit hop back to slot 0 (sequence switch, next stays 1)
    val vC0 = 3L << 40 // huge -> allocates slot 2 (next 1->2); slot 1 must survive
    val vB1 = vB0 + 7 // 32-bit hop back to slot 1
    val seq = Seq(vA1, vB0, vA2, vC0, vB1)
    val expected = Seq((0, 0), (1, 1), (0, 1), (2, 2), (1, 2))

    val enc = new ArithmeticEncoder
    val ge = new GpsTime11Enc(enc, rec(v0), 0)
    seq.zip(expected).foreach { case (v, (l, n)) =>
      ge.write(rec(v), 0)
      (ge.last, ge.next) shouldBe ((l, n))
    }
    ge.lastGps.toSeq shouldBe Seq(vA2, vB1, vC0, 0L)

    val coded = enc.done()
    val dec = new ArithmeticDecoder(coded, 0, coded.length)
    val gd = new GpsTime11Dec(dec, rec(v0), 0)
    seq.zip(expected).foreach { case (v, (l, n)) =>
      val out = new Array[Byte](8)
      gd.read(out, 0)
      getI64(out, 0) shouldBe v
      (gd.last, gd.next) shouldBe ((l, n))
    }
    gd.lastGps.toSeq shouldBe Seq(vA2, vB1, vC0, 0L)
  }

  test("committed 1.4 fixture: the pinned layered .laz decodes bit-identically to its twin") {
    def resource(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/laz/$name")
      require(in != null, s"missing committed fixture /laz/$name")
      try in.readAllBytes() finally in.close()
    }
    val (hLaz, decoded) = LazFile.decompress(resource("fixture14.laz"))
    val (hLas, raw) = LazFile.readUncompressed(resource("fixture14.las"))
    hLaz.pointFormat shouldBe 8
    hLaz.compressor shouldBe LazFile.CompressorLayeredChunked
    hLaz.npoints shouldBe hLas.npoints
    decoded.length shouldBe raw.length
    decoded.indices.foreach { i =>
      assert(java.util.Arrays.equals(decoded(i), raw(i)), s"fixture14 record $i differs")
    }
    // and today's encoder still produces the committed byte stream
    val reEncoded = LazFile.compress14(
      8, MakeLazFixture.records14(), Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0),
      chunkSize = 1000, extraBytes = 3)
    assert(java.util.Arrays.equals(reEncoded, resource("fixture14.laz")),
      "layered encoder output drifted from the committed fixture")
  }

  test("unsupported inputs are refused with actionable messages") {
    val recs = syntheticRecords(10, 0, 0, 3)
    // waveform-packet formats stay out of scope, loudly
    intercept[IllegalArgumentException](
      LazFile.itemsFor(4, 0)).getMessage should include("format")
    intercept[IllegalArgumentException](
      LazFile.itemsFor(5, 0)).getMessage should include("format")
    intercept[IllegalArgumentException](
      LazFile.itemsFor14(9, 0)).getMessage should include("format")
    intercept[IllegalArgumentException](
      LazFile.itemsFor14(10, 0)).getMessage should include("format")
    // a corrupted signature
    val laz = LazFile.compress(0, recs, Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0))
    laz(0) = 'X'
    intercept[IllegalArgumentException](LazFile.parseHeader(laz)).getMessage should include("LASF")
  }
}
