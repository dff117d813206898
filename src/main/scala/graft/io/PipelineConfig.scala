package graft.io

import graft.geo.WebMercator
import graft.model.Bbox
import graft.ops.PointCloudOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — declarative pipeline config, the parity analog of the reference's
  * PDAL pipeline JSON (`pipeline.json:2-27`, loaded by `read_json`,
  * `scripts/usgs_lidar.py:40-55`, parameterized at `:118-124`).
  *
  * The reference's 4-stage template:
  * ```
  * [ {"type": "readers.ept", "filename": ..., "bounds": ..., "polygon": ...},
  *   {"type": "filters.range", "limits": "Classification![7:7]"},
  *   {"type": "filters.reprojection", "in_srs": "EPSG:3857", "out_srs": "EPSG:4326"},
  *   {"type": "writers.text", "filename": ...} ]
  * ```
  * Here each stage maps onto the DataFrame operator it declares; the
  * "pipeline" IS the logical plan, so Catalyst still sees through it
  * (pushdown, pruning, codegen are unaffected by the config indirection).
  * Supported stage types: `readers.parquet` (the EPT surrogate: path +
  * optional bounds crop), `filters.range` (classification exclusion),
  * `filters.reprojection` (4326<->3857), `writers.csv` / `writers.parquet`.
  */
object PipelineConfig {

  sealed trait Stage
  final case class ReaderParquet(path: String, bounds: Option[Bbox]) extends Stage
  final case class FilterRange(excludeClassification: Int) extends Stage
  final case class FilterReprojection(inSrid: Int, outSrid: Int) extends Stage
  final case class WriterCsv(path: String) extends Stage
  final case class WriterParquet(path: String) extends Stage

  /** Parse the JSON stage list (driver-side config, not a data path). */
  def parse(json: String): Seq[Stage] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val stages = if (root.isArray) root else root.get("pipeline")
    require(stages != null && stages.isArray, "pipeline config must be a JSON array (or {pipeline: [...]})")
    (0 until stages.size()).map { i =>
      val s = stages.get(i)
      s.get("type").asText() match {
        case "readers.parquet" | "readers.ept" =>
          val b = Option(s.get("bounds")).map { bn =>
            Bbox(bn.get(0).asDouble(), bn.get(1).asDouble(), bn.get(2).asDouble(), bn.get(3).asDouble())
          }
          ReaderParquet(s.get("filename").asText(), b)
        case "filters.range" =>
          // PDAL exclusion syntax "Classification![7:7]" (pipeline.json:13)
          val limits = s.get("limits").asText()
          val m = "Classification!\\[(\\d+):\\d+\\]".r.findFirstMatchIn(limits)
          require(m.isDefined, s"unsupported filters.range limits: $limits")
          FilterRange(m.get.group(1).toInt)
        case "filters.reprojection" =>
          def srid(field: String) = s.get(field).asText().stripPrefix("EPSG:").toInt
          FilterReprojection(srid("in_srs"), srid("out_srs"))
        case "writers.text" | "writers.csv" => WriterCsv(s.get("filename").asText())
        case "writers.parquet" => WriterParquet(s.get("filename").asText())
        case other => throw new IllegalArgumentException(s"unsupported stage type: $other")
      }
    }
  }

  /** Build + run the declared pipeline. Returns the final frame (writers
    * execute as side effects, like the reference's unconditional
    * `writers.text`, SURVEY.md §2.2 K1).
    */
  def run(spark: SparkSession, stages: Seq[Stage]): DataFrame = {
    require(stages.headOption.exists(_.isInstanceOf[ReaderParquet]), "pipeline must start with a reader")
    stages.foldLeft(Option.empty[DataFrame]) { (acc, stage) =>
      (acc, stage) match {
        case (None, ReaderParquet(path, bounds)) =>
          val df = spark.read.parquet(path)
          Some(bounds.fold(df)(b => PointCloudOps.cropBbox(df, b)))
        case (Some(df), FilterRange(cls)) =>
          Some(df.filter(coalesce(col("classification"), lit(0)) =!= cls))
        case (Some(df), FilterReprojection(in, out)) =>
          // transformXY against the ORIGINAL columns in one withColumns:
          // reaches every supported pair incl. UTM (where each output
          // depends on both inputs — sequential withColumn would feed a
          // transformed x into the y formula)
          val (nx, ny) = WebMercator.transformXY(col("x"), col("y"), in, out)
          Some(df.withColumns(Map("x" -> nx, "y" -> ny)))
        case (Some(df), WriterCsv(path)) => Writers.csv(df, path); Some(df)
        case (Some(df), WriterParquet(path)) => df.write.mode("overwrite").parquet(path); Some(df)
        case (st, s0) => throw new IllegalArgumentException(s"invalid pipeline: $s0 at state $st")
      }
    }.get
  }

  def run(spark: SparkSession, json: String): DataFrame = run(spark, parse(json))

  /** F11 — EPT metadata URL building (`scripts/usgs_lidar.py:118,258`). */
  def eptMetaUrl(base: org.apache.spark.sql.Column, prefix: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(base, prefix, lit("ept.json"))
}
