package graft.io

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Row}

/** Raster rendering sinks — the presentation half of K3/K4
  * (`save_heatmap` / `plot_terrain`, `scripts/usgs_lidar.py:342-398`),
  * previously left out-of-engine by design. The JDK ships a PNG encoder
  * (`javax.imageio`), so the engine can render its own rasters with no
  * native/plotting dependency:
  *
  *  - [[saveHeatmapPng]] renders [[graft.ops.PointCloudOps.grid2d]]
  *    output (one pixel block per grid cell, matplotlib-"terrain"-like
  *    colormap, north up, absent cells transparent);
  *  - [[saveScatterPng]] renders a bounded point sample
  *    ([[graft.ops.PointCloudOps.renderSample]]) as colored pixels.
  *
  * Scale posture: both inputs are BOUNDED BY CONSTRUCTION before any
  * driver transfer — a grid frame has one row per cell (resolution
  * choice, independent of point count) and renderSample caps row count —
  * so the collect here moves the same data the reference ships to
  * matplotlib, not the point cloud. The distributed work (binning,
  * averaging, sampling) already happened in the cluster.
  */
object Raster {

  /** matplotlib's published "terrain" colormap control points
    * (position -> RGB in [0,1]); linear interpolation between stops.
    */
  private val TerrainStops: Seq[(Double, (Double, Double, Double))] = Seq(
    0.00 -> (0.2, 0.2, 0.6),
    0.15 -> (0.0, 0.6, 1.0),
    0.25 -> (0.0, 0.8, 0.4),
    0.50 -> (1.0, 1.0, 0.6),
    0.75 -> (0.5, 0.36, 0.33),
    1.00 -> (1.0, 1.0, 1.0))

  /** Terrain colormap: t in [0, 1] -> opaque ARGB. */
  def terrainArgb(t: Double): Int = {
    val x = math.max(0.0, math.min(1.0, t))
    val i = TerrainStops.lastIndexWhere(_._1 <= x)
    val (p0, c0) = TerrainStops(i)
    val (p1, c1) = TerrainStops(math.min(i + 1, TerrainStops.size - 1))
    val f = if (p1 == p0) 0.0 else (x - p0) / (p1 - p0)
    def ch(a: Double, b: Double): Int = math.round((a + (b - a) * f) * 255.0).toInt
    0xff000000 | (ch(c0._1, c1._1) << 16) | (ch(c0._2, c1._2) << 8) | ch(c0._3, c1._3)
  }

  private def checkedDim(n: Long, what: String, maxPx: Int): Int = {
    require(n >= 1 && n <= maxPx,
      s"$what = $n pixels (max $maxPx) — coarsen the grid/sample before rendering")
    n.toInt
  }

  /** K3 — render a gridded heatmap frame (columns gx, gy, value) to PNG.
    * One `cellPx` x `cellPx` block per cell, value-normalized over the
    * frame's [min, max] (matplotlib autoscale), gy increasing upward
    * (north up), absent cells transparent. Returns (widthPx, heightPx).
    */
  def saveHeatmapPng(
      grid: DataFrame,
      path: String,
      gxCol: String = "gx",
      gyCol: String = "gy",
      vCol: String = "avg_elevation",
      cellPx: Int = 4,
      maxPx: Int = 8192): (Int, Int) = {
    require(cellPx >= 1, "cellPx must be >= 1")
    val rows: Array[Row] = grid.select(gxCol, gyCol, vCol).collect()
    require(rows.nonEmpty, "cannot render an empty grid")
    def gx(r: Row) = r.getLong(0)
    def gy(r: Row) = r.getLong(1)
    def v(r: Row) = r.getDouble(2)
    val (minGx, maxGx) = (rows.map(gx).min, rows.map(gx).max)
    val (minGy, maxGy) = (rows.map(gy).min, rows.map(gy).max)
    val (minV, maxV) = (rows.map(v).min, rows.map(v).max)
    val w = checkedDim((maxGx - minGx + 1) * cellPx, "heatmap width", maxPx)
    val h = checkedDim((maxGy - minGy + 1) * cellPx, "heatmap height", maxPx)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val span = if (maxV > minV) maxV - minV else 1.0
    rows.foreach { r =>
      val argb = terrainArgb((v(r) - minV) / span)
      val px = ((gx(r) - minGx) * cellPx).toInt
      // north up: the largest gy is the TOP pixel row
      val py = ((maxGy - gy(r)) * cellPx).toInt
      var dy = 0
      while (dy < cellPx) {
        var dx = 0
        while (dx < cellPx) { img.setRGB(px + dx, py + dy, argb); dx += 1 }
        dy += 1
      }
    }
    write(img, path)
    (w, h)
  }

  /** K4 — render a bounded point sample (x, y, value) as a scatter PNG:
    * each point is one pixel (plus `dotPx`-1 neighbors right/down),
    * colored by value, coordinates scaled into width x height, y up.
    */
  def saveScatterPng(
      points: DataFrame,
      path: String,
      width: Int = 800,
      height: Int = 600,
      xCol: String = "x",
      yCol: String = "y",
      vCol: String = "z",
      dotPx: Int = 2,
      maxRows: Int = 2000000): (Int, Int) = {
    val rows = points.select(xCol, yCol, vCol).collect()
    require(rows.nonEmpty, "cannot render an empty sample")
    require(rows.length <= maxRows,
      s"${rows.length} points exceed maxRows=$maxRows — sample before rendering (renderSample)")
    def d(r: Row, i: Int) = r.get(i) match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric render column: $other")
    }
    val (minX, maxX) = (rows.map(d(_, 0)).min, rows.map(d(_, 0)).max)
    val (minY, maxY) = (rows.map(d(_, 1)).min, rows.map(d(_, 1)).max)
    val (minV, maxV) = (rows.map(d(_, 2)).min, rows.map(d(_, 2)).max)
    val spanX = if (maxX > minX) maxX - minX else 1.0
    val spanY = if (maxY > minY) maxY - minY else 1.0
    val spanV = if (maxV > minV) maxV - minV else 1.0
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    rows.foreach { r =>
      val px = math.min(width - 1, ((d(r, 0) - minX) / spanX * (width - 1)).toInt)
      val py = math.min(height - 1, (height - 1 - (d(r, 1) - minY) / spanY * (height - 1)).toInt)
      val argb = terrainArgb((d(r, 2) - minV) / spanV)
      var dy = 0
      while (dy < dotPx) {
        var dx = 0
        while (dx < dotPx) {
          val (qx, qy) = (px + dx, py + dy)
          if (qx < width && qy < height) img.setRGB(qx, qy, argb)
          dx += 1
        }
        dy += 1
      }
    }
    write(img, path)
    (width, height)
  }

  /** K6 — write a [[graft.ops.PointCloudOps.demRaster]] frame as a GeoTIFF
    * with the reference artifact's exact band set (`data/dem.tif`: six
    * float64 bands min/max/mean/idw/count/stdev, GDAL band descriptions,
    * NODATA=-9999): cells become north-up pixels, absent cells NODATA.
    * Same bounded-collect posture as the PNG sinks — one row per cell.
    * Returns the written raster (also the read-back expectation).
    */
  def saveDemGeoTiff(
      grid: DataFrame,
      path: String,
      cellX: Double,
      cellY: Double,
      originX: Double = 0.0,
      originY: Double = 0.0,
      epsg: Int = 4326,
      nodata: Double = -9999.0,
      maxPx: Int = 8192): GeoTiff.Raster = {
    val cols = Seq("gx", "gy", "zmin", "zmax", "zmean", "zidw", "n", "zstdev")
    val rows: Array[Row] = grid.select(cols.head, cols.tail: _*).collect()
    require(rows.nonEmpty, "cannot write an empty DEM")
    val (minGx, maxGx) = (rows.map(_.getLong(0)).min, rows.map(_.getLong(0)).max)
    val (minGy, maxGy) = (rows.map(_.getLong(1)).min, rows.map(_.getLong(1)).max)
    val w = checkedDim(maxGx - minGx + 1, "DEM width", maxPx)
    val h = checkedDim(maxGy - minGy + 1, "DEM height", maxPx)
    val bandNames = Seq("min", "max", "mean", "idw", "count", "stdev")
    val bands = bandNames.map(n => GeoTiff.Band(n, Array.fill(w * h)(nodata)))
    rows.foreach { r =>
      val px = (r.getLong(0) - minGx).toInt
      val py = (maxGy - r.getLong(1)).toInt // north up: largest gy = top row
      val at = py * w + px
      bands(0).values(at) = r.getDouble(2)
      bands(1).values(at) = r.getDouble(3)
      bands(2).values(at) = r.getDouble(4)
      bands(3).values(at) = r.getDouble(5)
      bands(4).values(at) = r.getLong(6).toDouble
      bands(5).values(at) = r.getDouble(7)
    }
    val raster = GeoTiff.Raster(
      width = w, height = h,
      originX = originX + minGx * cellX,
      originY = originY + (maxGy + 1) * cellY,
      scaleX = cellX, scaleY = cellY,
      epsg = epsg, nodata = Some(nodata), bands = bands)
    GeoTiff.write(raster, path)
    raster
  }

  private def write(img: BufferedImage, path: String): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    require(javax.imageio.ImageIO.write(img, "png", f), "no PNG writer available")
  }
}
