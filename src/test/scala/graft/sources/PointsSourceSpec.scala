package graft.sources

import java.nio.file.Files

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, IsNotNull, LessThanOrEqual, StringContains}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DSv2 connector behavior: read-back fidelity, tile pruning from footer
  * stats, column pruning into the parquet projection, filter bookkeeping.
  */
class PointsSourceSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  /** 4 x-range tiles over x in [0, 4000): tile k holds x in [k*1000, (k+1)*1000). */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dsv2").toString + "/tiles"
    (0 until 4000).map(i => (i.toLong, i.toDouble, (i % 100).toDouble, i / 40.0))
      .toDF("pid", "x", "y", "z")
      .repartitionByRange(4, col("x"))
      .sortWithinPartitions(col("x"))
      .write.parquet(d)
    d
  }

  private def read() =
    spark.read.format("graft.sources.PointsSource").option("path", dir).load()

  test("schema inference and full read-back match the written data") {
    val df = read()
    df.schema.fieldNames.toSeq shouldBe Seq("pid", "x", "y", "z")
    df.count() shouldBe 4000L
    df.agg(sum(col("pid"))).head().getLong(0) shouldBe (0L until 4000L).sum
  }

  test("bbox filter reaches the scan's pushed list and rows are exact") {
    val q = read().filter(col("x") >= 1500.0 && col("x") <= 1600.0)
    val plan = q.queryExecution.executedPlan.toString
    plan should include("graft-points")
    plan should include("GreaterThanOrEqual(x,1500.0)")
    plan should include("LessThanOrEqual(x,1600.0)")
    q.count() shouldBe 101L
    q.agg(min(col("pid")), max(col("pid"))).head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe ((1500L, 1600L))
    }
  }

  test("tile pruning: a narrow x range plans only the intersecting tile(s)") {
    val schema = read().schema
    val all = new PointsScan(dir, schema, Array.empty).planInputPartitions()
    all.length shouldBe 4
    val pruned = new PointsScan(dir, schema,
      Array(GreaterThanOrEqual("x", 1500.0), LessThanOrEqual("x", 1600.0)))
      .planInputPartitions()
    pruned.length shouldBe 1
    // A range outside the data prunes everything.
    new PointsScan(dir, schema,
      Array(GreaterThanOrEqual("x", 99999.0))).planInputPartitions().length shouldBe 0
  }

  test("column pruning: projected read returns only requested columns, values intact") {
    val q = read().select(col("pid"), col("z")).filter(col("pid") < 10)
    q.schema.fieldNames.toSeq shouldBe Seq("pid", "z")
    val rows = q.orderBy(col("pid")).collect()
    rows.length shouldBe 10
    rows(4).getLong(0) shouldBe 4L
    rows(4).getDouble(1) shouldBe 0.1 +- 1e-12
    // count(*) works with an empty required schema
    read().count() shouldBe 4000L
  }

  test("unsupported filters are not recorded as pushed") {
    val b = new PointsScanBuilder(dir, read().schema)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("x", 1.0), StringContains("pid", "9"), IsNotNull("x")))
    // everything comes back as residual (Spark re-evaluates row-level)...
    residual.length shouldBe 3
    // ...but only the understood filters count as pushed.
    b.pushedFilters().map(_.toString).toSet shouldBe
      Set("GreaterThanOrEqual(x,1.0)", "IsNotNull(x)")
  }

  test("full pipeline shape: bounds pushed to the connector + polygon crop on top") {
    // The reference's readers.ept bounds + filters.crop polygon, end to end:
    // bbox conjuncts prune tiles inside the connector, the even-odd ray cast
    // filters the survivors. L-shaped ring inside x [1000, 3000], y [0, 100].
    val ring = Seq((1000.0, 0.0), (3000.0, 0.0), (3000.0, 50.0), (2000.0, 50.0), (2000.0, 100.0), (1000.0, 100.0))
    import graft.geo.Polygon
    val viaConnector = read()
      .filter(Polygon.bbox(col("x"), col("y"), ring))
      .filter(Polygon.contains(col("x"), col("y"), ring))
    val plan = viaConnector.queryExecution.executedPlan.toString
    plan should include("graft-points")
    plan should include("GreaterThanOrEqual(x,1000.0)") // bounds reached the scan
    val viaParquet = spark.read.parquet(dir)
      .filter(Polygon.bbox(col("x"), col("y"), ring))
      .filter(Polygon.contains(col("x"), col("y"), ring))
    viaConnector.count() shouldBe viaParquet.count()
    viaConnector.agg(sum(col("pid"))).head().getLong(0) shouldBe
      viaParquet.agg(sum(col("pid"))).head().getLong(0)
    // The notch (x in (2000,3000], y in (50,100]) is inside the bbox but
    // outside the polygon — prove the crop actually cut it.
    viaConnector.filter(col("x") > 2000.0 && col("y") > 50.0).count() shouldBe 0L
  }

  test("manifest: identical pruning decisions to the footer path, zero footer reads at plan time") {
    import org.apache.spark.sql.sources.Filter
    val schema = read().schema
    def planFiles(pushed: Array[Filter]): Seq[String] =
      new PointsScan(dir, schema, pushed).planInputPartitions()
        .map(_.asInstanceOf[PointsInputPartition].file.split('/').last).toSeq.sorted
    val cases: Seq[Array[Filter]] = Seq(
      Array.empty[Filter],
      Array(GreaterThanOrEqual("x", 1500.0), LessThanOrEqual("x", 1600.0)),
      Array(GreaterThanOrEqual("x", 99999.0)),
      Array(LessThanOrEqual("y", 10.0))) // y spans every tile -> prunes none
    val footerDecisions = cases.map(planFiles)
    // Write the manifest (one-time layout cost), re-plan every case: the
    // decisions must match the footer path exactly and plan WITHOUT any
    // footer read — the O(tiles)-metadata-ops-per-query fix.
    PointsManifest.write(dir, spark.sparkContext.hadoopConfiguration)
    PointsSource.footerReads.set(0)
    cases.map(planFiles) shouldBe footerDecisions
    PointsSource.footerReads.get() shouldBe 0L
    // data results unchanged through the manifest plan path
    read().count() shouldBe 4000L
    read().filter(col("x") >= 1500.0 && col("x") <= 1600.0).count() shouldBe 101L
  }

  test("manifest round-trips schema and stats through the text format") {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = PointsManifest.read(dir, conf).get
    m.tiles.length shouldBe 4
    // schema string parses back to the exact written message type
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(m.schemaStr)
      .toString shouldBe m.schemaStr
    // x tiles are disjoint ranges covering [0, 3999]
    val xr = m.tiles.map(_.cols("x")).sortBy(_._1)
    xr.head._1 shouldBe 0.0
    xr.last._2 shouldBe 3999.0
    xr.sliding(2).foreach { case Seq((_, hi), (lo, _)) => hi should be < lo; case _ => () }
  }

  test("manifest COL records parse column names containing spaces") {
    // Parquet legally allows spaces in column names; COL records must split
    // from the right (last two tokens = min/max) or the stats shift and the
    // read throws NumberFormatException.
    val conf = spark.sparkContext.hadoopConfiguration
    val d = Files.createTempDirectory("graft-manifest-space").toString
    val text =
      """graft-points-manifest v1
        |SCHEMA message spark_schema {\n}
        |TILE part-0.parquet
        |COL plain 1.0 2.0
        |COL name with spaces -3.5 7.25
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, PointsManifest.FileName), text)
    val m = PointsManifest.read(d, conf).get
    m.tiles.head.cols("plain") shouldBe ((1.0, 2.0))
    m.tiles.head.cols("name with spaces") shouldBe ((-3.5, 7.25))
  }

  test("stale manifest (tile-set drift) falls back to footer planning — no silent row loss") {
    val d = Files.createTempDirectory("graft-stale").toString + "/tiles"
    (0 until 2000).map(i => (i.toLong, i.toDouble, 0.0, 0.0)).toDF("pid", "x", "y", "z")
      .repartitionByRange(2, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(d)
    val conf = spark.sparkContext.hadoopConfiguration
    PointsManifest.write(d, conf)
    def readD() = spark.read.format("graft.sources.PointsSource").option("path", d).load()
    readD().count() shouldBe 2000L
    // a tile arrives AFTER the manifest was written: trusting the manifest
    // would silently drop its rows; the listing guard must catch the drift
    val tiles = PointsSource.listFiles(d, conf)
    val headRows = spark.read.parquet(tiles.head.toString).count()
    val extra = new org.apache.hadoop.fs.Path(d, "zz-extra.parquet")
    org.apache.hadoop.fs.FileUtil.copy(
      extra.getFileSystem(conf), tiles.head, extra.getFileSystem(conf), extra, false, conf)
    readD().count() shouldBe 2000L + headRows
  }

  test("PointsLayout.ensure is idempotent and the r06 path stays green") {
    val p1 = PointsLayout.ensure(spark, "/root/testdata/sf0.001")
    val p2 = PointsLayout.ensure(spark, "/root/testdata/sf0.001")
    p1 shouldBe p2
    val df = graft.SparkEntry.queries("r06_ept_scan")(spark, "/root/testdata/sf0.001")
    df.count() should be > 0L
  }
}
