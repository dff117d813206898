package graft

import graft.geo.{Polygon, WebMercator}
import graft.io.Readers
import graft.model.Bbox
import graft.ops.{CatalogOps, PointCloudOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's public API (`UsgsLidar`, `scripts/usgs_lidar.py`),
  * re-expressed Spark-first — a user of the reference can run every query
  * they run today through this facade.
  *
  * Differences from the reference, all documented in SURVEY.md §7.5:
  *  - the selected region is actually plumbed through to the point scan
  *    (the reference drops it and always reads the default region,
  *    `scripts/usgs_lidar.py:129,334`);
  *  - the catalog is written once, not once per row;
  *  - `subsample` carries the CRS forward.
  * Replicated quirks: containment (not intersection) region matching,
  * hardcoded 4326->3857 query prep, barycenter math, year rendering
  * ("2009.0" / "Year: not_specified").
  *
  * Scale model: `points` is a table with a `region` column — on a real
  * deployment a Parquet dataset partitioned by region and sorted/bucketed by
  * (x, y), so `fetchData`'s region filter is partition pruning and the bbox
  * crop rides Parquet min/max statistics, the same pruning the EPT octree
  * gives the reference (`pipeline.json:4-6`).
  */
final class LidarEngine(
    spark: SparkSession,
    catalog: DataFrame,
    points: DataFrame) {

  /** `fetch_polygon_boundaries` (`scripts/usgs_lidar.py:57-82`): input
    * vertices are EPSG:4326 (hardcoded, quirk 3), output WKT + bounds in
    * EPSG:3857. Driver-side query prep, not a data-path operation.
    */
  def fetchPolygonBoundaries(verticesLonLat: Seq[(Double, Double)]): (String, Bbox) = {
    val v3857 = verticesLonLat.map { case (lon, lat) =>
      (WebMercator.lonToX(lon), WebMercator.latToY(lat))
    }
    (LidarEngine.wktPolygon(v3857), Bbox.ofVertices(v3857))
  }

  /** `fetch_regions` (`scripts/usgs_lidar.py:279-310`). */
  def fetchRegions(verticesLonLat: Seq[(Double, Double)]): DataFrame =
    CatalogOps.fetchRegions(catalog, fetchPolygonBoundaries(verticesLonLat)._2)

  /** `fetch_data` (`scripts/usgs_lidar.py:312-340`) — the flagship query:
    * polygon -> matching regions -> per-region point fetch (bbox crop +
    * noise filter + reprojection to 4326) -> year-string-keyed results.
    *
    * Returns a single DataFrame with `year_key` and `region` columns rather
    * than a driver-side dict — per-year access is a filter; `toYearMap`
    * reproduces the reference's dict-of-DataFrames shape when wanted.
    */
  def fetchData(verticesLonLat: Seq[(Double, Double)], region: Option[String] = None): DataFrame = {
    val v3857 = verticesLonLat.map { case (lon, lat) =>
      (WebMercator.lonToX(lon), WebMercator.latToY(lat))
    }
    val bbox = Bbox.ofVertices(v3857)
    val matched = CatalogOps.fetchRegions(catalog, bbox)
    val wanted = region.fold(matched)(r => matched.filter(col("filename") === r))
      .select("filename", "year")
    // Catalog side is tiny -> broadcast equi-join against the partitioned
    // point table; region filter prunes partitions, bbox filter prunes
    // row groups; the exact polygon crop (the reference's `filters.crop`
    // stage, `pipeline.json:6`) then cuts bbox survivors outside the ring —
    // pruning first, per-edge arithmetic only on candidates.
    val cropped = PointCloudOps.cropBbox(points, bbox)
    val exact =
      if (v3857.size >= 3) cropped.filter(Polygon.contains(col("x"), col("y"), v3857))
      else cropped
    val filtered = PointCloudOps.noiseFilter(exact)
    filtered
      .join(broadcast(wanted), filtered("region") === wanted("filename"))
      .select(
        WebMercator.xToLon(col("x")).as("lon"),
        WebMercator.yToLat(col("y")).as("lat"),
        col("z").as("elevation"),
        col("filename").as("matched_region"),
        CatalogOps.yearSentinel(col("year")).as("year_key"))
  }

  /** The reference's dict[yearString -> frame] shape
    * (`scripts/usgs_lidar.py:337-340`). Driver-side map of lazy filters —
    * no data movement until a per-year frame is acted on.
    */
  def toYearMap(fetched: DataFrame): Map[String, DataFrame] = {
    val keys = fetched.select("year_key").distinct().collect().map(_.getString(0))
    keys.map(k => k -> fetched.filter(col("year_key") === k)).toMap
  }

  /** `subsample` (`scripts/usgs_lidar.py:400-439`). */
  def subsample(df: DataFrame, res: Double, x: String = "x", y: String = "y", z: String = "z"): DataFrame =
    PointCloudOps.voxelSubsample(df, res, x, y, z)

  /** `convert_epsg` (`scripts/usgs_lidar.py:441-463`). Both output axes are
    * computed against the ORIGINAL columns in one `withColumns` (for UTM
    * pairs each output depends on both inputs, so sequential withColumn
    * would feed a transformed x into the y formula).
    */
  def convertEpsg(df: DataFrame, xCol: String, yCol: String, fromSrid: Int, toSrid: Int): DataFrame = {
    val (nx, ny) = WebMercator.transformXY(col(xCol), col(yCol), fromSrid, toSrid)
    df.withColumns(Map(xCol -> nx, yCol -> ny, "srid" -> lit(toSrid)))
  }

  /** `fetch_metadata` (`scripts/usgs_lidar.py:245-276`) — catalog build from
    * an ept-meta table (prefix, body-JSON).
    */
  def fetchMetadata(eptMeta: DataFrame): DataFrame = CatalogOps.buildCatalog(eptMeta)

  /** `save_heatmap` (`scripts/usgs_lidar.py:361-381`): grid the points
    * (distributed, A4) and render the bounded grid frame to a PNG
    * ([[graft.io.Raster]] — JDK PNG encoder, terrain colormap). Returns
    * (widthPx, heightPx).
    */
  def saveHeatmap(
      points: DataFrame, pngPath: String, cellX: Double, cellY: Double,
      x: String = "x", y: String = "y", v: String = "z"): (Int, Int) =
    graft.io.Raster.saveHeatmapPng(
      PointCloudOps.grid2d(points, cellX, cellY, x, y, v), pngPath)

  /** `plot_terrain` (`scripts/usgs_lidar.py:342-359`): deterministic
    * bounded sample (distributed top-n by hash) rendered as a scatter
    * PNG colored by elevation.
    */
  def plotTerrain(
      points: DataFrame, pngPath: String, sampleN: Int = 100000,
      width: Int = 800, height: Int = 600): (Int, Int) =
    graft.io.Raster.saveScatterPng(
      PointCloudOps.renderSample(points, sampleN), pngPath, width, height)
}

object LidarEngine {

  /** F4 — WKT polygon serialization (`scripts/usgs_lidar.py:73-78`). */
  def wktPolygon(vertices: Seq[(Double, Double)]): String = {
    val closed = if (vertices.nonEmpty && vertices.head != vertices.last) vertices :+ vertices.head else vertices
    closed.map { case (x, y) => s"$x $y" }.mkString("POLYGON((", ", ", "))")
  }

  /** F5 — PDAL bounds-string literal (`scripts/usgs_lidar.py:82`). */
  def boundsString(b: Bbox): String = s"([${b.minx}, ${b.maxx}], [${b.miny}, ${b.maxy}])"

  /** Build from a catalog CSV written with string columns (the reference's
    * metadata.csv shape), casting to the catalog schema.
    */
  def loadCatalogCsv(spark: SparkSession, path: String): DataFrame =
    Readers.csvWithNulls(spark, path)
      .select(
        col("filename"), col("region"),
        col("year").cast("int").as("year"),
        col("xmin").cast("double"), col("xmax").cast("double"),
        col("ymin").cast("double"), col("ymax").cast("double"),
        col("points").cast("long").as("points"))
}
