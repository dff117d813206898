package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tiled point-cloud layout builder for the [[PointsSource]] connector: the
  * lineitem-derived point table (the same x/y/z mapping every r-query uses)
  * written as x-range-partitioned parquet tiles, so tile footer min/max
  * statistics carry tight, near-disjoint x ranges — the property the
  * reference's EPT octree gives its tiles spatially
  * (`/root/reference/scripts/usgs_lidar.py:245-276` builds the analogous
  * bounds index from ept.json metadata).
  *
  * Layout choice is WORKLOAD-dependent: r06's query box is x-narrow (~9%
  * of the domain) but y-wide (~61%), so the x-sort prunes best for it; a
  * workload of 2-D-selective or y-selective boxes should write
  * [[graft.geo.ZOrder]]-sorted tiles instead (ZOrderSpec measures that
  * trade: a y-band query keeps ALL x-sorted tiles but few z-sorted ones).
  *
  * Derivation is deterministic from the fixture, so the DuckDB oracle can
  * reproduce the dataset straight from lineitem: pid = l_orderkey * 8 +
  * l_linenumber, x = extendedprice, y = quantity, z = discount*100,
  * classification = linenumber. NOTE pid is NOT unique in the synthetic
  * fixture (duplicate (orderkey, linenumber) pairs exist) — consumers must
  * not key joins or dedup on it; r06 orders by the full row for exactly
  * this reason.
  */
object PointsLayout {

  /** Floor on tile count (small fixtures) and target rows per tile.
    * Tile count SCALES WITH DATA: a fixed count made each tile 100x
    * bigger at the 100x probe, so a pruned scan decoded millions of rows
    * in ONE single-threaded partition reader (measured: r06 was the
    * worst 100x scaler at 21x before this). O(100 MB) tiles keep
    * partition count — and therefore scan parallelism — proportional to
    * the dataset, which is the EPT octree's own property (more nodes,
    * not bigger nodes, as data grows).
    */
  val MinTiles = 8
  val TargetRowsPerTile = 1000000L

  def tileCount(rows: Long): Int =
    math.max(MinTiles.toLong, (rows + TargetRowsPerTile - 1) / TargetRowsPerTile)
      .min(4096L).toInt

  /** Build the tile directory for `sfDir` if absent; returns its path.
    * Idempotent and session-safe: keyed by the sf directory, guarded by the
    * parquet writer's _SUCCESS marker.
    */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = s"/tmp/graft_points_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    // Check the marker through the same Hadoop filesystem the writer uses —
    // a java.io.File probe only works when the default FS is the driver's
    // local disk and would re-run the write every session on HDFS/object
    // stores.
    val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = marker.getFileSystem(conf)
    if (!fs.exists(marker)) {
      val src = Tables(spark, sfDir, "lineitem")
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("pid"),
          col("l_extendedprice").as("x"),
          col("l_quantity").as("y"),
          (col("l_discount") * 100.0).as("z"),
          col("l_linenumber").as("classification"))
      src
        .repartitionByRange(tileCount(src.count()), col("x"))
        .sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(dir)
      // Layout owns the manifest: write it with the tiles so planning is
      // one metadata read instead of one footer per tile per query.
      PointsManifest.write(dir, conf)
    } else if (!PointsManifest.exists(dir, conf)) {
      // Backfill for tile dirs written before manifests existed.
      PointsManifest.write(dir, conf)
    }
    dir
  }
}
