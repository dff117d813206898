package graft.io

import org.apache.spark.sql.DataFrame

/** Sink operators (SURVEY.md §2.2).
  *
  * K2 note: the reference rewrites the whole catalog CSV once per appended
  * row inside its fetch loop (O(n^2), `scripts/usgs_lidar.py:273`); here the
  * catalog is written exactly once at the end (SURVEY.md §7.5 "fix").
  */
object Writers {

  /** K1 — CSV sink (`writers.text`, `pipeline.json:22-26`). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** K2 — one-shot catalog write (fixes the per-row rewrite). */
  def catalogCsv(catalog: DataFrame, path: String): Unit =
    csv(catalog.coalesce(1), path)

  /** Gridded heatmap data as Parquet (K3's data side; rendering is
    * out-of-engine, SURVEY.md §7.4).
    */
  def gridParquet(grid: DataFrame, path: String): Unit =
    grid.write.mode("overwrite").parquet(path)
}
