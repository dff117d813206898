package graft.model

import org.apache.spark.sql.types._

/** Core data model (SURVEY.md §1).
  *
  * Geometry is flat `x: Double, y: Double` columns plus an `srid` convention
  * documented per table (SURVEY.md §7.4) — keeps every operator a Spark
  * built-in and Parquet min/max-statistics friendly, which is what makes bbox
  * pushdown work at 100 TB.
  */
final case class Bbox(minx: Double, miny: Double, maxx: Double, maxy: Double) {
  require(minx <= maxx && miny <= maxy, s"degenerate bbox $this")
  /** Containment (not intersection): this box fully contains `other` —
    * the reference's deliberate semantics (`scripts/usgs_lidar.py:297-303`).
    */
  def contains(other: Bbox): Boolean =
    minx <= other.minx && maxx >= other.maxx && miny <= other.miny && maxy >= other.maxy
}

object Bbox {
  /** Bounding box of a polygon given as (lon, lat)/(x, y) vertices —
    * the reference's `fetch_polygon_boundaries` bounds extraction
    * (`scripts/usgs_lidar.py:57-82`).
    */
  def ofVertices(vs: Seq[(Double, Double)]): Bbox = {
    require(vs.nonEmpty, "empty polygon")
    Bbox(vs.map(_._1).min, vs.map(_._2).min, vs.map(_._1).max, vs.map(_._2).max)
  }
}

/** One row of the resource catalog (`data/metadata.csv` mirror). `year` is
  * nullable — 4 of 1,594 real rows have none (`data/metadata.csv:229`).
  * `points` must be Long (real catalog max 448,685,375,365).
  */
final case class CatalogEntry(
    filename: String,
    region: String,
    year: Option[Int],
    xmin: Double,
    xmax: Double,
    ymin: Double,
    ymax: Double,
    points: Long)

object Schemas {
  /** Point-cloud table (EPT-scan surrogate, FIXTURES.md A1). */
  val points: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("classification", IntegerType, nullable = true),
    StructField("region", StringType, nullable = true)))

  /** Resource catalog (FIXTURES.md A2). */
  val catalog: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = false),
    StructField("region", StringType, nullable = true),
    StructField("year", IntegerType, nullable = true),
    StructField("xmin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false),
    StructField("points", LongType, nullable = false)))

  /** EPT metadata JSON body: bounds = [xmin,ymin,zmin,xmax,ymax,zmax]
    * (`scripts/usgs_lidar.py:267-271`).
    */
  val eptMeta: StructType = StructType(Seq(
    StructField("bounds", ArrayType(DoubleType), nullable = true),
    StructField("points", LongType, nullable = true)))
}
