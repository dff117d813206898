package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** EPT connector against an offline fixture: a small Entwine tree
  * (ept.json + sharded ept-hierarchy + binary node payloads) written by
  * the spec, exercising schema mapping, scale/offset decode, sharded
  * hierarchy walk, octree-cube pruning, residual row filtering, and
  * column pruning.
  */
class EptSourceSpec extends AnyFunSuite with Matchers with SparkTest {

  // (x, y, z, intensity, classification) per node; coordinates are
  // centi-scaled int32 on disk (scale 0.01).
  private val rootPts = Seq((0.5, 0.5, 0.5, 1, 0), (12.0, 4.0, 9.0, 2, 7))
  private val lowPts = Seq((1.0, 2.0, 3.0, 100, 2), (4.5, 5.25, 6.75, 200, 7))
  private val highPts = Seq((9.0, 10.0, 11.0, 300, 1), (15.99, 8.0, 12.0, 65535, 255))

  /** The 15-byte stride struct of the fixture schema — ONE packing shared
    * by the binary nodes and the zstandard twins, so the encodings can
    * never silently drift onto different trees.
    */
  private def packPoints(pts: Seq[(Double, Double, Double, Int, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(pts.size * 15).order(ByteOrder.LITTLE_ENDIAN)
    pts.foreach { case (x, y, z, inten, cls) =>
      bb.putInt(math.round(x * 100).toInt)
      bb.putInt(math.round(y * 100).toInt)
      bb.putInt(math.round(z * 100).toInt)
      bb.putShort((inten & 0xffff).toShort)
      bb.put((cls & 0xff).toByte)
    }
    bb.array()
  }

  /** The fixture dimension list, shared by every ept.json this spec writes. */
  private val SchemaJson =
    """ "schema": [
      |  {"name": "X", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
      |  {"name": "Y", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
      |  {"name": "Z", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
      |  {"name": "Intensity", "type": "unsigned", "size": 2},
      |  {"name": "Classification", "type": "unsigned", "size": 1}]""".stripMargin

  private def writeNode(dir: java.io.File, key: String, pts: Seq[(Double, Double, Double, Int, Int)]): Unit =
    java.nio.file.Files.write(
      new java.io.File(dir, s"ept-data/$key.bin").toPath, packPoints(pts))

  private lazy val eptDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ept-fixture").toFile
    new java.io.File(dir, "ept-data").mkdirs()
    new java.io.File(dir, "ept-hierarchy").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "ept.json").toPath,
      s"""{"bounds": [0, 0, 0, 16, 16, 16], "boundsConforming": [0, 0, 0, 16, 16, 16],
         | "dataType": "binary", "hierarchyType": "json", "points": 6, "span": 4,
         |$SchemaJson,
         | "srs": {"authority": "EPSG", "horizontal": "3857"}, "version": "1.0.0"}""".stripMargin)
    // Sharded hierarchy: the 1-1-1-1 subtree lives in its own page (-1
    // marker), as EPT does for large trees.
    java.nio.file.Files.writeString(new java.io.File(dir, "ept-hierarchy/0-0-0-0.json").toPath,
      """{"0-0-0-0": 2, "1-0-0-0": 2, "1-1-1-1": -1}""")
    java.nio.file.Files.writeString(new java.io.File(dir, "ept-hierarchy/1-1-1-1.json").toPath,
      """{"1-1-1-1": 2}""")
    writeNode(dir, "0-0-0-0", rootPts)
    writeNode(dir, "1-0-0-0", lowPts)
    writeNode(dir, "1-1-1-1", highPts)
    dir.getPath
  }

  private def load() =
    spark.read.format("graft.sources.EptSource").option("path", eptDir).load()

  test("full scan decodes every node: scale/offset coordinates, unsigned widths, schema mapping") {
    val df = load()
    df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq shouldBe Seq(
      ("x", "double"), ("y", "double"), ("z", "double"),
      ("intensity", "int"), ("classification", "int"))
    val rows = df.orderBy(col("x")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    rows.toSeq shouldBe (rootPts ++ lowPts ++ highPts).sortBy(_._1)
    // unsigned byte 255 and unsigned short 65535 survive un-sign-extended
    rows.last shouldBe (15.99, 8.0, 12.0, 65535, 255)
  }

  test("octree-cube pruning skips non-intersecting nodes; residual filter keeps rows exact") {
    // Plan directly to observe pruning: x <= 7.9 excludes the [8,16)^3
    // child cube but keeps root (whole-bounds cube) and the low child.
    val scan = new EptScan(
      eptDir,
      load().schema,
      Array(org.apache.spark.sql.sources.LessThanOrEqual("x", 7.9)))
    val parts = scan.planInputPartitions().map(_.asInstanceOf[EptInputPartition].file)
    parts.length shouldBe 2
    parts.exists(_.contains("1-1-1-1")) shouldBe false
    // End-to-end the same predicate returns exactly the matching rows —
    // including dropping root's x=12 point via Spark's residual evaluation
    // (pruning is performance, never correctness).
    val xs = load().filter(col("x") <= 7.9).select(col("x")).collect().map(_.getDouble(0)).sorted
    xs.toSeq shouldBe Seq(0.5, 1.0, 4.5)
  }

  test("sharded hierarchy pages are walked (the -1 subtree contributes its nodes)") {
    val h = EptSource.hierarchy(eptDir, new org.apache.hadoop.conf.Configuration())
    h.keySet.map(_.toString) shouldBe Set("0-0-0-0", "1-0-0-0", "1-1-1-1")
    h.values.sum shouldBe 6L
  }

  test("column pruning decodes only projected dimensions") {
    val cls = load().select(col("classification")).collect().map(_.getInt(0)).sorted
    cls.toSeq shouldBe Seq(0, 1, 2, 7, 7, 255)
    // count(*) plans an empty projection and still counts every point
    load().count() shouldBe 6L
  }

  test("bounds query composes with the engine's noise filter (reference pipeline shape)") {
    // pipeline.json: readers.ept bounds -> filters.range Classification![7:7]
    val out = load()
      .filter(col("x") >= 0.0 && col("x") <= 7.9 && col("classification") =!= 7)
      .select(col("x"), col("classification")).orderBy(col("x")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    out.toSeq shouldBe Seq((0.5, 0), (1.0, 2))
  }

  // ------------------------------------------------------- laszip payloads

  /** A LAS 1.2 format-3 record (+4 extra bytes for Entwine's OriginId):
    * the realistic `usgs-lidar-public` node shape.
    */
  private def lasRec(
      x: Int, y: Int, z: Int, inten: Int, retNum: Int, numRet: Int, scanDir: Int, edge: Int,
      cls: Int, ang: Int, user: Int, psid: Int, gps: Double, r: Int, g: Int, b: Int,
      origin: Long): Array[Byte] = {
    val rec = new Array[Byte](38)
    val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(x).putInt(y).putInt(z)
    bb.putShort((inten & 0xffff).toShort)
    bb.put((((retNum & 7) | ((numRet & 7) << 3) | ((scanDir & 1) << 6) | ((edge & 1) << 7)) & 0xff).toByte)
    bb.put((cls & 0xff).toByte)
    bb.put((ang & 0xff).toByte)
    bb.put((user & 0xff).toByte)
    bb.putShort((psid & 0xffff).toShort)
    bb.putDouble(gps)
    bb.putShort((r & 0xffff).toShort).putShort((g & 0xffff).toShort).putShort((b & 0xffff).toShort)
    bb.putInt((origin & 0xffffffffL).toInt)
    rec
  }

  private val lazRootRecs = Array(
    lasRec(50, 50, 50, 1, 1, 1, 0, 0, 0, -3, 2, 4096, 211000.25, 100, 200, 300, 7L),
    lasRec(1200, 400, 900, 2, 2, 3, 1, 0, 7, 5, 2, 4096, 211000.50, 65535, 0, 12, 7L))
  private val lazChildRecs = Array(
    lasRec(900, 1000, 1100, 300, 1, 1, 0, 1, 1, -30, 0, 4097, 211001.00, 5, 5, 5, 8L),
    lasRec(1599, 800, 1200, 65535, 1, 1, 1, 0, 255, 127, 255, 65535, 211002.00, 1, 2, 3, 4294967295L))

  private lazy val lazEptDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ept-laz-fixture").toFile
    new java.io.File(dir, "ept-data").mkdirs()
    new java.io.File(dir, "ept-hierarchy").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "ept.json").toPath,
      """{"bounds": [0, 0, 0, 16, 16, 16], "boundsConforming": [0, 0, 0, 16, 16, 16],
        | "dataType": "laszip", "hierarchyType": "json", "points": 4, "span": 4,
        | "schema": [
        |  {"name": "X", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
        |  {"name": "Y", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
        |  {"name": "Z", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
        |  {"name": "Intensity", "type": "unsigned", "size": 2},
        |  {"name": "ReturnNumber", "type": "unsigned", "size": 1},
        |  {"name": "NumberOfReturns", "type": "unsigned", "size": 1},
        |  {"name": "ScanDirectionFlag", "type": "unsigned", "size": 1},
        |  {"name": "EdgeOfFlightLine", "type": "unsigned", "size": 1},
        |  {"name": "Classification", "type": "unsigned", "size": 1},
        |  {"name": "ScanAngleRank", "type": "signed", "size": 1},
        |  {"name": "UserData", "type": "unsigned", "size": 1},
        |  {"name": "PointSourceId", "type": "unsigned", "size": 2},
        |  {"name": "GpsTime", "type": "float", "size": 8},
        |  {"name": "Red", "type": "unsigned", "size": 2},
        |  {"name": "Green", "type": "unsigned", "size": 2},
        |  {"name": "Blue", "type": "unsigned", "size": 2},
        |  {"name": "OriginId", "type": "unsigned", "size": 4}],
        | "srs": {"authority": "EPSG", "horizontal": "3857"}, "version": "1.0.0"}""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "ept-hierarchy/0-0-0-0.json").toPath,
      """{"0-0-0-0": 2, "1-0-0-0": 2}""")
    val scale = Array(0.01, 0.01, 0.01)
    val off = Array(0.0, 0.0, 0.0)
    java.nio.file.Files.write(new java.io.File(dir, "ept-data/0-0-0-0.laz").toPath,
      graft.sources.laz.LazFile.compress(3, lazRootRecs, scale, off, 50000, extraBytes = 4))
    java.nio.file.Files.write(new java.io.File(dir, "ept-data/1-0-0-0.laz").toPath,
      graft.sources.laz.LazFile.compress(3, lazChildRecs, scale, off, 50000, extraBytes = 4))
    dir.getPath
  }

  private def loadLaz() =
    spark.read.format("graft.sources.EptSource").option("path", lazEptDir).load()

  test("laszip tree: full scan decodes every LAS attribute through the EPT schema") {
    val df = loadLaz()
    df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq shouldBe Seq(
      ("x", "double"), ("y", "double"), ("z", "double"), ("intensity", "int"),
      ("returnnumber", "int"), ("numberofreturns", "int"), ("scandirectionflag", "int"),
      ("edgeofflightline", "int"), ("classification", "int"), ("scananglerank", "int"),
      ("userdata", "int"), ("pointsourceid", "int"), ("gpstime", "double"),
      ("red", "int"), ("green", "int"), ("blue", "int"), ("originid", "bigint"))
    val rows = df.orderBy(col("x")).collect()
    rows.length shouldBe 4
    // first root point, fully decoded
    val p0 = rows.head
    (p0.getDouble(0), p0.getDouble(1), p0.getDouble(2)) shouldBe ((0.5, 0.5, 0.5))
    p0.getInt(3) shouldBe 1
    (p0.getInt(4), p0.getInt(5), p0.getInt(6), p0.getInt(7)) shouldBe ((1, 1, 0, 0))
    p0.getInt(8) shouldBe 0
    p0.getInt(9) shouldBe -3 // signed scan angle survives
    p0.getInt(10) shouldBe 2
    p0.getInt(11) shouldBe 4096
    p0.getDouble(12) shouldBe 211000.25
    (p0.getInt(13), p0.getInt(14), p0.getInt(15)) shouldBe ((100, 200, 300))
    p0.getLong(16) shouldBe 7L
    // extreme point: unsigned widths and the u32 extra-bytes OriginId
    val pMax = rows.last
    (pMax.getDouble(0), pMax.getInt(3), pMax.getInt(8)) shouldBe ((15.99, 65535, 255))
    pMax.getInt(9) shouldBe 127
    pMax.getInt(11) shouldBe 65535
    pMax.getLong(16) shouldBe 4294967295L
    // multi-return flags of the second root point
    val p1 = rows(2)
    (p1.getInt(4), p1.getInt(5), p1.getInt(6)) shouldBe ((2, 3, 1))
  }

  test("laszip tree: pruning, projection, and the reference pipeline filter work unchanged") {
    // node pruning is payload-independent: x <= 7.9 drops nothing here
    // (both cubes intersect) but the residual filter is exact
    val out = loadLaz()
      .filter(col("x") <= 9.5 && col("classification") =!= 7)
      .select(col("x"), col("gpstime"), col("originid"))
      .orderBy(col("x")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    out.toSeq shouldBe Seq((0.5, 211000.25, 7L), (9.0, 211001.0, 8L))
    loadLaz().count() shouldBe 4L
  }

  test("laszip tree feeds the reference pipeline end to end (bounds -> noise filter -> voxel)") {
    // the r06-class shape: readers.ept bounds, filters.range
    // Classification![7:7], then the A1 voxel barycenter downsample —
    // all over laszip payloads, plans identical to the binary path
    val pts = loadLaz()
      .filter(col("x") >= 0.0 && col("x") <= 16.0 && col("classification") =!= 7)
      .select(col("x"), col("y"), col("z"))
    val vox = graft.ops.PointCloudOps.voxelSubsample(pts, 8.0)
      .orderBy(col("vx"), col("vy"), col("vz"))
      .collect()
    vox.length should be >= 1
    // every surviving decoded point is accounted for in the voxel counts
    val survivors = Seq((0.5, 0.5, 0.5), (9.0, 10.0, 11.0), (15.99, 8.0, 12.0))
    vox.map(_.getLong(6)).sum shouldBe survivors.length
  }

  test("laszip and binary payloads are interchangeable: same tree content, same rows") {
    // re-encode the binary fixture's points as a laszip tree (format 0 is
    // enough: x/y/z/intensity/classification) and compare the shared
    // columns end to end
    val dir = java.nio.file.Files.createTempDirectory("ept-laz-twin").toFile
    new java.io.File(dir, "ept-data").mkdirs()
    new java.io.File(dir, "ept-hierarchy").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "ept.json").toPath,
      s"""{"bounds": [0, 0, 0, 16, 16, 16],
         | "dataType": "laszip", "hierarchyType": "json", "points": 6, "span": 4,
         |$SchemaJson,
         | "version": "1.0.0"}""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "ept-hierarchy/0-0-0-0.json").toPath,
      """{"0-0-0-0": 2, "1-0-0-0": 2, "1-1-1-1": 2}""")
    def rec20(p: (Double, Double, Double, Int, Int)): Array[Byte] = {
      val rec = new Array[Byte](20)
      val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(math.round(p._1 * 100).toInt)
      bb.putInt(math.round(p._2 * 100).toInt)
      bb.putInt(math.round(p._3 * 100).toInt)
      bb.putShort((p._4 & 0xffff).toShort)
      rec(14) = ((1 & 7) | ((1 & 7) << 3)).toByte
      rec(15) = (p._5 & 0xff).toByte
      rec
    }
    Seq(("0-0-0-0", rootPts), ("1-0-0-0", lowPts), ("1-1-1-1", highPts)).foreach { case (key, pts) =>
      java.nio.file.Files.write(new java.io.File(dir, s"ept-data/$key.laz").toPath,
        graft.sources.laz.LazFile.compress(
          0, pts.map(rec20).toArray, Array(0.01, 0.01, 0.01), Array(0.0, 0.0, 0.0)))
    }
    val lazDf = spark.read.format("graft.sources.EptSource").option("path", dir.getPath).load()
      .select(col("x"), col("y"), col("z"), col("intensity"), col("classification"))
    val binDf = load()
      .select(col("x"), col("y"), col("z"), col("intensity"), col("classification"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getInt(3), r.getInt(4))
    lazDf.collect().map(key).sortBy(_._1).toSeq shouldBe binDf.collect().map(key).sortBy(_._1).toSeq
  }

  // ---------------------------------------------------- zstandard payloads

  test("zstandard payloads decode identically to binary: same tree, same rows, pruning intact") {
    // The EPT spec's third dataType: each node is the binary struct payload
    // inside a zstd frame (ept-data/<key>.zst). Encode the binary fixture's
    // exact node bytes through the real codec (zstd-jni's stream encoder —
    // decoding then exercises the full frame path: magic, window, blocks,
    // checksum) and require row-for-row equality with the binary tree.
    val dir = java.nio.file.Files.createTempDirectory("ept-zst-twin").toFile
    new java.io.File(dir, "ept-data").mkdirs()
    new java.io.File(dir, "ept-hierarchy").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "ept.json").toPath,
      s"""{"bounds": [0, 0, 0, 16, 16, 16],
         | "dataType": "zstandard", "hierarchyType": "json", "points": 6, "span": 4,
         |$SchemaJson,
         | "version": "1.0.0"}""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "ept-hierarchy/0-0-0-0.json").toPath,
      """{"0-0-0-0": 2, "1-0-0-0": 2, "1-1-1-1": 2}""")
    Seq(("0-0-0-0", rootPts), ("1-0-0-0", lowPts), ("1-1-1-1", highPts)).foreach { case (key, pts) =>
      val baos = new java.io.ByteArrayOutputStream()
      val zout = new com.github.luben.zstd.ZstdOutputStream(baos)
      zout.write(packPoints(pts)); zout.close()
      java.nio.file.Files.write(
        new java.io.File(dir, s"ept-data/$key.zst").toPath, baos.toByteArray)
    }
    def zload() = spark.read.format("graft.sources.EptSource").option("path", dir.getPath).load()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getInt(3), r.getInt(4))
    zload().collect().map(key).sortBy(_._1).toSeq shouldBe
      load().collect().map(key).sortBy(_._1).toSeq
    // octree pruning plans .zst files and skips the non-intersecting child
    val scan = new EptScan(dir.getPath, zload().schema,
      Array(org.apache.spark.sql.sources.LessThanOrEqual("x", 7.9)))
    val parts = scan.planInputPartitions().map(_.asInstanceOf[EptInputPartition].file)
    parts.length shouldBe 2
    parts.foreach(f => f should endWith(".zst"))
    // end-to-end predicate + column pruning over the zstd stream decode
    zload().filter(col("x") <= 7.9).select(col("x")).collect()
      .map(_.getDouble(0)).sorted.toSeq shouldBe Seq(0.5, 1.0, 4.5)
  }
}
