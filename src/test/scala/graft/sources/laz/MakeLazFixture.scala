package graft.sources.laz

/** One-shot generator for the committed LAZ drift fixture
  * (src/test/resources/laz/fixture.{laz,las}): a deterministic format-3
  * + extra-bytes record stream compressed once and pinned. LazSpec's
  * fixture test decodes the committed .laz and requires bit-identity
  * with the committed .las — so any future change to the codec's coded
  * byte stream or decode behavior fails loudly instead of silently
  * producing different files.
  *
  * Run from sbt: `Test/runMain graft.sources.laz.MakeLazFixture <dir>`.
  */
object MakeLazFixture {

  def records(): Array[Array[Byte]] = {
    val rnd = new scala.util.Random(20260813)
    var x = 431000; var y = 4580000; var z = 120
    // Two interleaved flight lines: GPS time alternates between two live
    // sequences every 100 points (plus occasional exact repeats), so the
    // pinned byte stream exercises the GPSTIME11 multi-sequence slot
    // machine (huge-jump slot allocation AND sequence switch-back) — the
    // part of the codec where a deviation from the published algorithm
    // round-trips cleanly but desynchronizes against real laszip.
    val gps = Array(211000.25, 503200.75)
    (0 until 2500).map { i =>
      val rec = new Array[Byte](38)
      x += (if (i % 89 == 0) rnd.nextInt(400000) - 200000 else rnd.nextInt(25) - 5)
      y += (if (i % 127 == 0) rnd.nextInt(200000) - 100000 else rnd.nextInt(9) - 4)
      z += rnd.nextInt(7) - 3
      Items.putI32(rec, 0, x)
      Items.putI32(rec, 4, y)
      Items.putI32(rec, 8, z)
      Items.putU16(rec, 12, if (i % 5 < 3) 210 else rnd.nextInt(65536))
      val r = if (i % 13 == 0) 1 + rnd.nextInt(4) else 1
      val n = math.max(r, if (i % 13 == 0) 1 + rnd.nextInt(4) else 1)
      rec(14) = ((r & 7) | ((n & 7) << 3) | (((i / 40) % 2) << 6)).toByte
      rec(15) = (if (i % 4 == 0) 2 else 1).toByte
      rec(16) = ((i % 50) - 25).toByte
      rec(17) = 0
      Items.putU16(rec, 18, 4096)
      val line = (i / 100) % 2
      if (i % 37 != 0) gps(line) += 1e-5
      Items.putI64(rec, 20, java.lang.Double.doubleToLongBits(gps(line)))
      Items.putU16(rec, 28, (i * 31) % 65536)
      Items.putU16(rec, 30, (i * 47) % 65536)
      Items.putU16(rec, 32, (i * 59) % 65536)
      Items.putI32(rec, 34, 7 + (i % 3))
      rec
    }.toArray
  }

  /** LAS 1.4 format-8 drift fixture: three interleaved scanner channels
    * (each with its own coordinate track and GPS pulse train),
    * multi-returns, flag churn, RGB+NIR, and extra bytes — the layered
    * codec's full surface, including context switching and lazy context
    * seeding, pinned as a committed byte stream.
    */
  def records14(): Array[Array[Byte]] = {
    val rnd = new scala.util.Random(20260814)
    val stride = 38 + 3
    val xs = Array.fill(3)(431000); val ys = Array.fill(3)(4580000); val zs = Array.fill(3)(120)
    val gps = Array.tabulate(3)(c => 211000.25 + c * 90000)
    (0 until 2500).map { i =>
      val rec = new Array[Byte](stride)
      val ch = (i / (3 + i % 5)) % 3
      xs(ch) += (if (i % 89 == 0) rnd.nextInt(400000) - 200000 else rnd.nextInt(25) - 5)
      ys(ch) += (if (i % 127 == 0) rnd.nextInt(200000) - 100000 else rnd.nextInt(9) - 4)
      zs(ch) += rnd.nextInt(7) - 3
      Items.putI32(rec, 0, xs(ch))
      Items.putI32(rec, 4, ys(ch))
      Items.putI32(rec, 8, zs(ch))
      Items.putU16(rec, 12, if (i % 5 < 3) 210 else rnd.nextInt(65536))
      val r = if (i % 13 == 0) 1 + rnd.nextInt(15) else 1
      val n = math.max(r, if (i % 13 == 0) 1 + rnd.nextInt(15) else 1)
      rec(14) = ((r & 0xF) | ((n & 0xF) << 4)).toByte
      rec(15) = (((if (i % 17 == 0) rnd.nextInt(16) else 0) & 0xF) | (ch << 4) |
        (((i / 40) % 2) << 6) | ((if (i % 31 == 0) 1 else 0) << 7)).toByte
      rec(16) = (if (i % 4 == 0) 2 else 1).toByte
      rec(17) = (i % 3).toByte
      Items.putU16(rec, 18, ((i % 100) - 50) & 0xFFFF)
      Items.putU16(rec, 20, 4096 + (if (i % 43 == 0) 1 else 0))
      if (i % 37 != 0) gps(ch) += 1e-5
      Items.putI64(rec, 22, java.lang.Double.doubleToLongBits(gps(ch)))
      Items.putU16(rec, 30, (i * 31) % 65536)
      Items.putU16(rec, 32, (i * 47) % 65536)
      Items.putU16(rec, 34, (i * 59) % 65536)
      Items.putU16(rec, 36, (i * 67) % 65536)
      rec(38) = (7 + (i % 3)).toByte
      rec(39) = ((i * 5) % 256).toByte
      rec(40) = 1
      rec
    }.toArray
  }

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    dir.mkdirs()
    val recs = records()
    val scale = Array(0.01, 0.01, 0.01)
    val off = Array(0.0, 0.0, 0.0)
    // chunk size 1000 -> three chunks, exercising chunk-table seeks
    val laz = LazFile.compress(3, recs, scale, off, chunkSize = 1000, extraBytes = 4)
    val las = LazFile.writeUncompressed(3, recs, scale, off)
    java.nio.file.Files.write(new java.io.File(dir, "fixture.laz").toPath, laz)
    java.nio.file.Files.write(new java.io.File(dir, "fixture.las").toPath, las)
    val recs14 = records14()
    val laz14 = LazFile.compress14(8, recs14, scale, off, chunkSize = 1000, extraBytes = 3)
    val las14 = LazFile.writeUncompressed(8, recs14, scale, off)
    java.nio.file.Files.write(new java.io.File(dir, "fixture14.laz").toPath, laz14)
    java.nio.file.Files.write(new java.io.File(dir, "fixture14.las").toPath, las14)
    println(s"wrote ${laz.length} byte laz + ${las.length} byte las, " +
      s"${laz14.length} byte laz14 + ${las14.length} byte las14 to $dir")
  }
}
