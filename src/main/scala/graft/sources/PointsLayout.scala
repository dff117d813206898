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

  val Tiles = 8

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
      Tables(spark, sfDir, "lineitem")
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("pid"),
          col("l_extendedprice").as("x"),
          col("l_quantity").as("y"),
          (col("l_discount") * 100.0).as("z"),
          col("l_linenumber").as("classification"))
        .repartitionByRange(Tiles, col("x"))
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
