package graft

import graft.geo.WebMercator
import graft.model.Bbox
import graft.ops.CatalogOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity against the reference's REAL committed catalog: the 1,597-prefix
  * file list and the 1,594-row metadata.csv it derived with
  * `fetch_name_and_year` (`scripts/usgs_lidar.py:224-242`). Our regex
  * pipeline must reproduce the reference's own (filename, region, year)
  * for every row — the strongest available ground truth for F6/F7.
  */
class RealCatalogSpec extends AnyFunSuite with Matchers with SparkTest {

  private val refData = "/root/reference/data"

  private lazy val metadata = spark.read
    .option("header", "true")
    .csv(s"$refData/metadata.csv")
    .select(
      col("filename"),
      col("region").as("ref_region"),
      col("year").cast("int").as("ref_year"),
      col("xmin").cast("double"), col("xmax").cast("double"),
      col("ymin").cast("double"), col("ymax").cast("double"),
      col("points").cast("long").as("points"))

  test("withNameAndYear reproduces the reference's region/year for all 1,594 real resources") {
    val prefixes = io.Readers.textLines(spark, s"$refData/filenames.txt").toDF("prefix")
    val ours = CatalogOps.withNameAndYear(prefixes, "prefix")
      .select(col("filename"), col("region"), col("year"))
    val joined = ours.join(metadata, "filename")
    joined.count() shouldBe 1594L // all catalog rows matched by name
    val mismatches = joined.filter(
      col("region") =!= col("ref_region") ||
        !(col("year") <=> col("ref_year")))
    withClue(mismatches.limit(5).collect().mkString("\n")) {
      mismatches.count() shouldBe 0L
    }
  }

  test("fetchRegions on the real catalog matches the demo polygon to Iowa coverage") {
    // Demo polygon (scripts/usgs_lidar.py:467) -> 3857 bbox (hardcoded CRS
    // prep, quirk 3).
    val poly = Seq(
      (-93.759055, 41.925015), (-93.766155, 41.925015),
      (-93.766155, 41.921818), (-93.759055, 41.921818))
    val v = poly.map { case (lon, lat) => (WebMercator.lonToX(lon), WebMercator.latToY(lat)) }
    val bbox = Bbox.ofVertices(v)
    val catalog = metadata.select(
      col("filename"), col("ref_region").as("region"), col("ref_year").as("year"),
      col("xmin"), col("xmax"), col("ymin"), col("ymax"), col("points"))
    val matched = CatalogOps.fetchRegions(catalog, bbox).collect()
    matched.length should be > 0
    // IA_FullState (the reference's default region, year missing) must
    // contain the demo area and sort LAST (nulls-last year ordering).
    matched.map(_.getString(0)) should contain("IA_FullState")
    matched.last.getString(0) shouldBe "IA_FullState"
    // Years (excluding nulls) are non-decreasing.
    val years = matched.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Int]))
    years.toSeq shouldBe years.toSeq.sorted
  }
}
