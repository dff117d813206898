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

  private def writeNode(dir: java.io.File, key: String, pts: Seq[(Double, Double, Double, Int, Int)]): Unit = {
    val bb = ByteBuffer.allocate(pts.size * 15).order(ByteOrder.LITTLE_ENDIAN)
    pts.foreach { case (x, y, z, inten, cls) =>
      bb.putInt(math.round(x * 100).toInt)
      bb.putInt(math.round(y * 100).toInt)
      bb.putInt(math.round(z * 100).toInt)
      bb.putShort((inten & 0xffff).toShort)
      bb.put((cls & 0xff).toByte)
    }
    java.nio.file.Files.write(new java.io.File(dir, s"ept-data/$key.bin").toPath, bb.array())
  }

  private lazy val eptDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ept-fixture").toFile
    new java.io.File(dir, "ept-data").mkdirs()
    new java.io.File(dir, "ept-hierarchy").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(dir, "ept.json").toPath,
      """{"bounds": [0, 0, 0, 16, 16, 16], "boundsConforming": [0, 0, 0, 16, 16, 16],
        | "dataType": "binary", "hierarchyType": "json", "points": 6, "span": 4,
        | "schema": [
        |  {"name": "X", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
        |  {"name": "Y", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
        |  {"name": "Z", "type": "signed", "size": 4, "scale": 0.01, "offset": 0.0},
        |  {"name": "Intensity", "type": "unsigned", "size": 2},
        |  {"name": "Classification", "type": "unsigned", "size": 1}],
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
}
