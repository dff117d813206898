package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Source operators (SURVEY.md §2.1).
  *
  * S1 (EPT octree scan) is represented by spatially-partitioned Parquet +
  * pushdown filters — see PointCloudOps/LidarEngine. The readers here cover
  * the catalog-side sources: CSV with the reference's custom null tokens and
  * newline-delimited text.
  */
object Readers {

  /** S2 — CSV scan with multi-token null normalization
    * (`read_csv(csv_path, missing_values)`, `scripts/usgs_lidar.py:84-104`;
    * tokens `n/a`, `na`, `undefined`). Spark's `nullValue` option accepts a
    * single token, so remaining tokens are normalized post-read — still a
    * single pass, still codegen'd, schema-inference optional.
    */
  def csvWithNulls(
      spark: SparkSession,
      path: String,
      nullTokens: Seq[String] = Seq("n/a", "na", "undefined")): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", nullTokens.headOption.orNull)
      .csv(path)
    val rest = nullTokens.drop(1)
    if (rest.isEmpty) raw
    else raw.columns.foldLeft(raw) { (df, c) =>
      df.withColumn(c, when(col(c).isin(rest.map(_.asInstanceOf[Any]): _*), lit(null)).otherwise(col(c)))
    }
    // Columns stay StringType here; typed casts are the caller's concern
    // (catalog columns are cast in LidarEngine.loadCatalogCsv).
  }

  /** S3 — newline-delimited file list (`read_txt`,
    * `scripts/usgs_lidar.py:204-222`).
    */
  def textLines(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path)
  }

  /** S6 — binary artifact load (`load_heatmap`,
    * `scripts/usgs_lidar.py:383-398`): files as (path, modificationTime,
    * length, content) rows; content feeds the Multimodal decode plumbing.
    * `pathGlobFilter` narrows to one artifact type (e.g. *.png).
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
}
