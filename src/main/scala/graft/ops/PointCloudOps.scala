package graft.ops

import graft.model.Bbox
import graft.util.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-cloud operators (SURVEY.md §2.3 P1/P2, §2.5 A1-A4).
  *
  * Scale posture: every operator here is a single scan + (at most) one hash
  * aggregate. Filters are plain comparisons on flat double columns, so they
  * push into the Parquet scan (row-group min/max skipping stands in for the
  * reference's EPT octree pruning, `pipeline.json:4-6`). The voxel aggregate
  * is a built-in partial+final hash agg — map-side combine shrinks the
  * shuffle to ~#distinct-voxels, independent of input size.
  */
object PointCloudOps {

  /** P1 — load + project a point table to (x, y, elevation[, classification]).
    * The reference does this as a ~46 s/query Python row loop
    * (`scripts/usgs_lidar.py:169-179`); here it is a pruned columnar scan.
    */
  def loadPoints(df: DataFrame): DataFrame =
    df.select(col("x"), col("y"), col("z").as("elevation"), col("classification"))

  /** P2 — ASPRS class-7 (low noise) exclusion, PDAL `Classification![7:7]`
    * (`pipeline.json:11-14`). Null-safe: unclassified points are kept.
    */
  def noiseFilter(df: DataFrame, cls: String = "classification"): DataFrame =
    df.filter(coalesce(col(cls), lit(0)) =!= 7)

  /** Bbox crop — the scan-level pushdown analog of the EPT `bounds` box. */
  def cropBbox(df: DataFrame, b: Bbox, x: String = "x", y: String = "y"): DataFrame =
    df.filter(col(x) >= b.minx && col(x) <= b.maxx && col(y) >= b.miny && col(y) <= b.maxy)

  /** A1 — voxel-grid barycenter downsample, the flagship aggregation
    * (`subsample`, `scripts/usgs_lidar.py:400-439`):
    * voxel key = floor((p - min(p)) / res) per axis; output = per-voxel mean
    * of the raw points (barycenter, not voxel center) + point count.
    *
    * Two jobs: (1) global per-axis min — a 1-row aggregate, broadcast back
    * into the plan via a broadcast cross join so the data path never touches
    * the driver; (2) groupBy(voxel key).agg(mean) — built-in hash aggregate,
    * no UDAF. The min-shift keeps (p - min) >= 0 so floor() matches numpy
    * floor-division semantics exactly (SURVEY.md §7.6).
    */
  def voxelSubsample(
      points: DataFrame,
      res: Double,
      x: String = "x",
      y: String = "y",
      z: String = "z"): DataFrame =
    voxelSubsample3(points, res, res, res, x, y, z)

  /** Per-axis-resolution generalization of A1 (the reference uses a single
    * res for all three axes; mapped fixture axes have different scales).
    */
  def voxelSubsample3(
      points: DataFrame,
      resX: Double,
      resY: Double,
      resZ: Double,
      x: String = "x",
      y: String = "y",
      z: String = "z"): DataFrame = {
    val mins = points.agg(
      min(col(x)).as("mx"), min(col(y)).as("my"), min(col(z)).as("mz"))
    points
      .crossJoin(broadcast(mins))
      .groupBy(
        floor((col(x) - col("mx")) / resX).as("vx"),
        floor((col(y) - col("my")) / resY).as("vy"),
        floor((col(z) - col("mz")) / resZ).as("vz"))
      .agg(
        Exact.davg(col(x)).as("avg_x"),
        Exact.davg(col(y)).as("avg_y"),
        Exact.davg(col(z)).as("avg_z"),
        count(lit(1)).as("n"))
  }

  /** A4 — 2-D heatmap gridding: bin (x, y) to cells, average elevation.
    * The engine emits the gridded data; raster rendering is presentation
    * (`save_heatmap`, `scripts/usgs_lidar.py:361-381`, SURVEY.md §7.4).
    */
  def grid2d(
      points: DataFrame,
      cellX: Double,
      cellY: Double,
      x: String = "x",
      y: String = "y",
      v: String = "z"): DataFrame =
    points
      .groupBy(
        floor(col(x) / cellX).as("gx"),
        floor(col(y) / cellY).as("gy"))
      .agg(Exact.davg(col(v)).as("avg_elevation"), count(lit(1)).as("n"))

  /** A5 — DEM statistics raster: the per-cell band set of the reference's
    * committed GDAL artifact `data/dem.tif` (six float64 bands named
    * min/max/mean/idw/count/stdev — PDAL `writers.gdal` output; only the
    * artifact survives in the repo, no producing pipeline). Cells are
    * `floor((x-ox)/cellX), floor((y-oy)/cellY)`; per cell:
    *
    *  - `zmin`/`zmax`/`n` — exact min/max/count;
    *  - `zmean` — order-independent decimal mean ([[Exact.davg]]);
    *  - `zidw` — inverse-distance-weighted mean to the CELL CENTER:
    *    `sum(z/d) / sum(1/d)` with `d = max(dist(point, center), minDist)`
    *    (the clamp bounds the weight of a point sitting exactly on the
    *    center; PDAL's radius variant needs a neighborhood search — the
    *    cell-center form is the aggregation-expressible analog);
    *  - `zstdev` — population stdev from decimal sums:
    *    `sqrt(max(0, E[z²] - E[z]²))` (the max guards IEEE cancellation
    *    for near-constant cells).
    *
    * All sums are per-row decimal-quantized ([[Exact.dsum]]) so partial
    * aggregation order cannot change the result — the same plan shape as
    * A1: one scan, one partial+final hash aggregate, shuffle ~#cells.
    */
  def demRaster(
      points: DataFrame,
      cellX: Double,
      cellY: Double,
      originX: Double = 0.0,
      originY: Double = 0.0,
      minDist: Double = 0.001,
      x: String = "x",
      y: String = "y",
      z: String = "z"): DataFrame = {
    val gx = floor((col(x) - originX) / cellX)
    val gy = floor((col(y) - originY) / cellY)
    val cx = lit(originX) + (gx + 0.5) * cellX
    val cy = lit(originY) + (gy + 0.5) * cellY
    val dist = greatest(
      sqrt((col(x) - cx) * (col(x) - cx) + (col(y) - cy) * (col(y) - cy)),
      lit(minDist))
    // dist projected ONCE per row (round-20): inlined in both IDW sums it
    // was evaluated twice per point — each evaluation re-deriving the
    // cell floors and the sqrt — because aggregate-expression CSE does
    // not span separate aggregate functions. Same expression, same IEEE
    // doubles; the aggregate now reads the precomputed column.
    val zc = col("__z")
    points
      .select(col(z).as("__z"), gx.as("gx"), gy.as("gy"), dist.as("__d"))
      .groupBy(col("gx"), col("gy"))
      .agg(
        min(zc).as("zmin"),
        max(zc).as("zmax"),
        Exact.davg(zc, 6).as("zmean"),
        (Exact.dsum(zc / col("__d"), 9) / Exact.dsum(lit(1.0) / col("__d"), 9)).as("zidw"),
        count(lit(1)).as("n"),
        sqrt(greatest(
          Exact.davg(zc * zc, 6) - Exact.davg(zc, 6) * Exact.davg(zc, 6),
          lit(0.0))).as("zstdev"))
  }

  /** K4 — deterministic point sample for rendering (`plot_terrain`,
    * `scripts/usgs_lidar.py:342-359` plots raw points; the engine supplies
    * a bounded, reproducible subset instead). Hash-ordered limit plans as
    * TakeOrderedAndProject: each partition keeps its top-n by hash, no
    * full sort shuffle — scale-safe unlike orderBy().limit on raw columns
    * with skew.
    */
  def renderSample(points: DataFrame, n: Int): DataFrame =
    points.orderBy(xxhash64(struct(points.columns.map(col): _*))).limit(n)
}
