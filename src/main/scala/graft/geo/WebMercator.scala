package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Closed-form spherical Web-Mercator transform, EPSG:4326 <-> EPSG:3857.
  *
  * The reference performs this with pyproj inside geopandas
  * (`scripts/usgs_lidar.py:69-70,293-294` — query-polygon prep 4326->3857) and
  * with PDAL `filters.reprojection` per point (`pipeline.json:15-20`,
  * 3857->4326). Only this one CRS pair is ever exercised, so we implement the
  * published spherical-Mercator formulas directly as Catalyst Column
  * expressions — no UDF, no native library: the whole transform stays inside
  * whole-stage codegen and Parquet pushdown-compatible expression trees.
  *
  * Formulas (R = 6378137 m, the WGS84 semi-major axis):
  *   x = R * lon * pi/180
  *   y = R * ln(tan(pi/4 + lat*pi/360))
  * and inverses. Latitudes are clamped to +/-85.05112878 deg (the square
  * Mercator world) to keep y finite at the poles.
  */
object WebMercator {
  val R: Double = 6378137.0
  val MaxLat: Double = 85.05112878
  private val D2R = math.Pi / 180.0

  /** Clamp latitude into the Web-Mercator valid band. */
  def clampLat(lat: Column): Column = least(greatest(lat, lit(-MaxLat)), lit(MaxLat))

  /** EPSG:4326 lon (deg) -> EPSG:3857 x (m). */
  def lonToX(lon: Column): Column = lon * lit(D2R) * lit(R)

  /** EPSG:4326 lat (deg) -> EPSG:3857 y (m). */
  def latToY(lat: Column): Column =
    log(tan(lit(math.Pi / 4.0) + clampLat(lat) * lit(D2R) / lit(2.0))) * lit(R)

  /** EPSG:3857 x (m) -> EPSG:4326 lon (deg). */
  def xToLon(x: Column): Column = x / lit(R) / lit(D2R)

  /** EPSG:3857 y (m) -> EPSG:4326 lat (deg). */
  def yToLat(y: Column): Column =
    (atan(exp(y / lit(R))) * lit(2.0) - lit(math.Pi / 2.0)) / lit(D2R)

  /** Generic column transform between the per-axis SRIDs — the engine
    * analog of `convert_epsg` (`scripts/usgs_lidar.py:441-463`). Axis is "x"
    * (longitude-like) or "y" (latitude-like). Only 4326<->3857 is
    * expressible per-axis; UTM (both outputs depend on both inputs) goes
    * through [[transformXY]].
    */
  def transform(c: Column, axis: String, fromSrid: Int, toSrid: Int): Column =
    (fromSrid, toSrid, axis) match {
      case (4326, 3857, "x") => lonToX(c)
      case (4326, 3857, "y") => latToY(c)
      case (3857, 4326, "x") => xToLon(c)
      case (3857, 4326, "y") => yToLat(c)
      case (f, t, _) if f == t => c
      case (f, t, _) =>
        throw new IllegalArgumentException(
          s"unsupported per-axis CRS pair $f->$t (use transformXY for UTM pairs)")
    }

  /** Full 2-D CRS transform: (x, y) in `fromSrid` -> (x, y) in `toSrid`.
    * Supports 4326 (x = lon deg, y = lat deg), 3857 (Web-Mercator
    * meters), and every UTM zone (EPSG:32601-60 north / 32701-60 south,
    * x = easting, y = northing — [[TransverseMercator]], order-n^6 Krüger
    * series). UTM<->3857 and UTM<->UTM compose through 4326 — closed-form
    * all the way, still one codegen'd expression tree per output column.
    */
  def transformXY(x: Column, y: Column, fromSrid: Int, toSrid: Int): (Column, Column) = {
    def isUtm(s: Int) = TransverseMercator.zoneOf(s).isDefined
    (fromSrid, toSrid) match {
      case (f, t) if f == t => (x, y)
      case (4326, 3857) => (lonToX(x), latToY(y))
      case (3857, 4326) => (xToLon(x), yToLat(y))
      case (4326, t) if isUtm(t) =>
        val (e, n) = TransverseMercator.utmForward(lat = y, lon = x, epsg = t)
        (e, n)
      case (f, 4326) if isUtm(f) =>
        val (lat, lon) = TransverseMercator.utmInverse(x, y, epsg = f)
        (lon, lat)
      case (f, t) if isUtm(f) || isUtm(t) =>
        val (lon, lat) = transformXY(x, y, f, 4326)
        transformXY(lon, lat, 4326, t)
      case (f, t) =>
        throw new IllegalArgumentException(
          s"unsupported CRS pair $f->$t (4326, 3857, and UTM 326xx/327xx zones)")
    }
  }

  /** Driver-side scalar versions (query-prep path: polygon corners, bbox). */
  def lonToX(lon: Double): Double = lon * D2R * R
  def latToY(lat: Double): Double = {
    val l = math.max(-MaxLat, math.min(MaxLat, lat))
    math.log(math.tan(math.Pi / 4.0 + l * D2R / 2.0)) * R
  }
  def xToLon(x: Double): Double = x / R / D2R
  def yToLat(y: Double): Double = (math.atan(math.exp(y / R)) * 2.0 - math.Pi / 2.0) / D2R
}
