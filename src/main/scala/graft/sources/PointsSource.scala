package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a tiled point-cloud dataset — the full-
  * fidelity analog of the reference's `readers.ept` scan (SURVEY.md §2.2 S1
  * / §4 custom-work item 2): the reference pushes a bounds box into the EPT
  * reader so only intersecting octree tiles are fetched
  * (`/root/reference/pipeline.json:4-6`, injected at
  * `scripts/usgs_lidar.py:121-123`). Here the dataset is a directory of
  * parquet tiles; the connector implements
  *  - [[SupportsPushDownFilters]]: range/equality predicates on numeric
  *    columns are accepted and used to SKIP WHOLE TILES from their parquet
  *    footer min/max statistics — the octree-pruning move, expressed as
  *    metadata pruning. Pushed filters are also returned as residuals, so
  *    Spark re-evaluates them row-level (same contract as the built-in
  *    parquet source — pruning is a performance fact, never a correctness
  *    dependency);
  *  - [[SupportsPushDownRequiredColumns]]: the reader materializes only the
  *    projected columns (parquet projection schema), so a 2-column query
  *    over a 5-column tile set reads 2 column chunks.
  *
  * Split granularity is one tile (file) per [[InputPartition]] — tiles are
  * written bounded (the layout writer range-partitions on x), mirroring EPT
  * tile sizing; a 100 TB deployment keeps tiles at O(100 MB) so partition
  * count scales with data. Footer reads are driver-side metadata ops, the
  * exact counterpart of the reference fetching `ept.json` before points.
  *
  * Usage: `spark.read.format("graft.sources.PointsSource").option("path", dir).load()`.
  */
class PointsSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = PointsSource.pathOf(options.get("path"))
    PointsSource.sparkSchema(PointsSource.datasetSchema(dir, PointsSource.sessionHadoopConf()))
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new PointsTable(PointsSource.pathOf(properties.get("path")), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object PointsSource {

  private[sources] def pathOf(p: String): String = {
    require(p != null && p.nonEmpty, "graft.sources.PointsSource requires option(\"path\", dir)")
    p
  }

  /** Driver-side Hadoop configuration: the ACTIVE session's, so
    * fs.defaultFS / object-store credentials / io settings all apply to
    * listing, footer reads and manifest reads — a bare `new Configuration()`
    * would silently pin the connector to the driver's local filesystem.
    * Executors get the same conf serialized through the reader factory.
    */
  private[sources] def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Count of parquet footer reads — test instrumentation for the
    * "manifest planning reads no footers" property.
    */
  private[sources] val footerReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Data files under the dataset directory, name-sorted for determinism. */
  private[sources] def listFiles(dir: String, conf: Configuration): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
      .sortBy(_.getName)
  }

  private[sources] def footerOf(file: Path, conf: Configuration): org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    footerReads.incrementAndGet()
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try r.getFooter finally r.close()
  }

  /** Dataset schema: from the manifest when one exists (zero footer reads),
    * else from the first tile's footer.
    */
  private[sources] def datasetSchema(dir: String, conf: Configuration): MessageType =
    PointsManifest.read(dir, conf) match {
      case Some(m) => org.apache.parquet.schema.MessageTypeParser.parseMessageType(m.schemaStr)
      case None =>
        val files = listFiles(dir, conf)
        require(files.nonEmpty, s"no parquet files under $dir")
        footerOf(files.head, conf).getFileMetaData.getSchema
    }

  /** Parquet primitive schema -> Spark schema (flat point-cloud columns:
    * ints, longs, floats, doubles, strings).
    */
  private[sources] def sparkSchema(mt: MessageType): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(mt.getFields.asScala.toSeq.map { f =>
      val p = f.asPrimitiveType()
      // Logical-type-annotated physicals (DECIMAL-as-INT64, TIMESTAMP,
      // non-UTF8 BINARY, ...) would decode to wrong values if mapped by
      // physical type alone — reject them loudly instead of corrupting.
      val ann = p.getLogicalTypeAnnotation
      val annOk = ann == null ||
        ann.isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      if (!annOk) throw new IllegalArgumentException(
        s"graft-points supports plain primitive columns only; ${f.getName} carries logical type $ann")
      val dt: DataType = p.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT64 => LongType
        case PrimitiveTypeName.INT32 => IntegerType
        case PrimitiveTypeName.DOUBLE => DoubleType
        case PrimitiveTypeName.FLOAT => FloatType
        case PrimitiveTypeName.BOOLEAN => BooleanType
        case PrimitiveTypeName.BINARY => StringType
        case other => throw new IllegalArgumentException(
          s"graft-points supports flat primitive columns only; ${f.getName} is $other")
      }
      StructField(f.getName, dt, nullable = !f.isRepetition(org.apache.parquet.schema.Type.Repetition.REQUIRED))
    })
  }

  /** Which filters the scan understands: single-column numeric range /
    * equality (+ the IsNotNull guards Spark adds alongside them).
    */
  private[sources] def supported(schema: StructType)(f: Filter): Boolean = {
    def numericCol(name: String): Boolean =
      schema.fields.exists(sf => sf.name == name &&
        (sf.dataType == DoubleType || sf.dataType == FloatType ||
          sf.dataType == LongType || sf.dataType == IntegerType))
    f match {
      case GreaterThan(a, v: Number @unchecked) => numericCol(a) && v != null
      case GreaterThanOrEqual(a, v: Number @unchecked) => numericCol(a) && v != null
      case LessThan(a, v: Number @unchecked) => numericCol(a) && v != null
      case LessThanOrEqual(a, v: Number @unchecked) => numericCol(a) && v != null
      case EqualTo(a, v: Number @unchecked) => numericCol(a) && v != null
      case IsNotNull(a) => schema.fieldNames.contains(a)
      case _ => false
    }
  }

  /** Conjunctive per-column bounds implied by the pushed filters:
    * col -> (lower, upper). Non-strict on both ends — a superset of the
    * exact predicate, which is the safe direction for pruning.
    */
  private[sources] def rangeBounds(pushed: Array[Filter]): Map[String, (Double, Double)] = {
    val m = scala.collection.mutable.Map.empty[String, (Double, Double)]
    def tighten(c: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = m.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
      m(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    pushed.foreach {
      case GreaterThan(a, v: Number @unchecked) => tighten(a, v.doubleValue(), Double.PositiveInfinity)
      case GreaterThanOrEqual(a, v: Number @unchecked) => tighten(a, v.doubleValue(), Double.PositiveInfinity)
      case LessThan(a, v: Number @unchecked) => tighten(a, Double.NegativeInfinity, v.doubleValue())
      case LessThanOrEqual(a, v: Number @unchecked) => tighten(a, Double.NegativeInfinity, v.doubleValue())
      case EqualTo(a, v: Number @unchecked) => tighten(a, v.doubleValue(), v.doubleValue())
      case _ => ()
    }
    m.toMap
  }

  /** Per-column [min, max] from a tile footer, unioned across row groups —
    * only columns with complete numeric statistics in EVERY block appear
    * (absence = "unknown, cannot prune on it"). Shared by live footer
    * pruning and the manifest writer, so both prune identically.
    */
  private[sources] def footerStats(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata): Map[String, (Double, Double)] = {
    import scala.jdk.CollectionConverters._
    val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val unknown = scala.collection.mutable.Set.empty[String]
    val blockHits = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val nBlocks = footer.getBlocks.size()
    footer.getBlocks.asScala.foreach { block =>
      block.getColumns.asScala.foreach { cc =>
        val name = cc.getPath.toDotString
        blockHits(name) += 1
        if (!unknown(name)) {
          val st = cc.getStatistics
          val pair =
            if (st == null || !st.hasNonNullValue) None
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: Number, mx: Number) => Some((mn.doubleValue(), mx.doubleValue()))
              case _ => None // non-numeric (e.g. binary) stats — not prunable here
            }
          pair match {
            case Some((mn, mx)) =>
              val (m0, x0) = acc.getOrElse(name, (Double.PositiveInfinity, Double.NegativeInfinity))
              acc(name) = (math.min(m0, mn), math.max(x0, mx))
            case None =>
              unknown += name
              acc.remove(name)
          }
        }
      }
    }
    // a column absent from some block has incomplete coverage -> unknown
    acc.filter { case (name, _) => blockHits(name) == nBlocks }.toMap
  }

  /** Does a tile with these known column ranges possibly intersect the
    * pushed bounds? Columns with unknown statistics cannot prune.
    */
  private[sources] def statsSurvive(
      stats: Map[String, (Double, Double)],
      bounds: Map[String, (Double, Double)]): Boolean =
    bounds.forall { case (colName, (lo, hi)) =>
      stats.get(colName).forall { case (minV, maxV) => maxV >= lo && minV <= hi }
    }

  private[sources] def tileSurvives(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      bounds: Map[String, (Double, Double)]): Boolean =
    statsSurvive(footerStats(footer), bounds)
}

class PointsTable(path: String, tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_points($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PointsScanBuilder(path, tableSchema)
}

class PointsScanBuilder(path: String, dataSchema: StructType)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  /** Accept range/equality filters for tile pruning; return EVERYTHING as
    * residual so Spark re-evaluates row-level (pruning is best-effort, like
    * the built-in parquet source's double-check contract).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(PointsSource.supported(dataSchema))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new PointsScan(path, required, pushed)
}

class PointsScan(path: String, required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  /** Captured on the driver at scan build; serialized to executors through
    * the reader factory so data reads see the same fs settings/credentials.
    */
  private val driverConf: Configuration = PointsSource.sessionHadoopConf()

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-points path=$path, PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"

  /** One partition per surviving tile; pruning happens here, driver-side,
    * from metadata only (no data reads). With a [[PointsManifest]] present
    * (any layout-writer dataset) planning is ONE small sequential file
    * read — file list, schema and per-column min/max all come from it, so
    * per-query cost is independent of tile count. Without one, the footer
    * path remains: parallel per-tile footer fetches, schema from the first
    * tile (uniform across tiles — one writer).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val bounds = PointsSource.rangeBounds(pushed)
    PointsManifest.read(path, driverConf) match {
      // STALENESS GUARD: the manifest is only trusted when its tile set
      // matches the directory's actual listing. A stale manifest is a
      // CORRECTNESS bug, not a perf bug — tiles added after the manifest
      // was written would silently vanish from every query (removed tiles
      // at least fail loudly). The check costs one directory listing
      // (paginated LIST RPCs), which stays far below the O(tiles) footer
      // GETs it protects, and the listing is reused for the fallback plan.
      case Some(m) =>
        val listed = PointsSource.listFiles(path, driverConf)
        if (listed.map(_.getName).toSet == m.tiles.map(_.file).toSet)
          m.tiles
            .filter(t => bounds.isEmpty || PointsSource.statsSurvive(t.cols, bounds))
            .map(t => PointsInputPartition(new Path(path, t.file).toString, m.schemaStr): InputPartition)
            .toArray
        else {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"stale manifest under $path (tile set differs from listing); " +
              "planning from footers — rewrite the layout to restore manifest planning")
          footerPlan(listed, bounds)
        }
      case None =>
        footerPlan(PointsSource.listFiles(path, driverConf), bounds)
    }
  }

  private def footerPlan(
      files: Seq[Path],
      bounds: Map[String, (Double, Double)]): Array[InputPartition] = {
    if (files.isEmpty) return Array.empty
    val schemaStr = PointsSource.footerOf(files.head, driverConf).getFileMetaData.getSchema.toString
    val survivors =
      if (bounds.isEmpty) files
      else {
        import scala.jdk.CollectionConverters._
        files.asJava.parallelStream()
          .filter(f => PointsSource.tileSurvives(PointsSource.footerOf(f, driverConf), bounds))
          .collect(java.util.stream.Collectors.toList[Path]).asScala.toSeq
      }
    survivors.map(f => PointsInputPartition(f.toString, schemaStr): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PointsReaderFactory(required, new org.apache.spark.util.SerializableConfiguration(driverConf))
}

case class PointsInputPartition(file: String, schemaStr: String) extends InputPartition

class PointsReaderFactory(
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PointsInputPartition]
    new PointsPartitionReader(p.file, p.schemaStr, required, conf.value)
  }
}

/** Executor-side tile reader: parquet Group API with a projection schema
  * limited to the required columns (column pruning reaches the actual I/O,
  * not just the row conversion). An empty projection (count(*) plans) reads
  * the narrowest available column and emits empty rows.
  */
class PointsPartitionReader(file: String, schemaStr: String, required: StructType, baseConf: Configuration)
  extends PartitionReader[InternalRow] {

  // Private copy: ReadSupport.PARQUET_READ_SCHEMA is a per-reader setting
  // and the shared executor conf must not be mutated concurrently.
  private val conf = new Configuration(baseConf)
  private val fileSchema: MessageType =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(schemaStr)
  private val readNames: Array[String] =
    if (required.isEmpty) Array(fileSchema.getFields.get(0).getName) else required.fieldNames
  private val projection: MessageType = new MessageType(
    fileSchema.getName,
    readNames.map(n => fileSchema.getFields.get(fileSchema.getFieldIndex(n))): _*)
  conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file)).withConf(conf).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    if (required.isEmpty) return InternalRow.empty
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      // Projection schema was built in `required` order, so group field i
      // IS required field i.
      vals(i) =
        if (current.getFieldRepetitionCount(i) == 0) null
        else required(i).dataType match {
          case LongType => current.getLong(i, 0)
          case IntegerType => current.getInteger(i, 0)
          case DoubleType => current.getDouble(i, 0)
          case FloatType => current.getFloat(i, 0)
          case BooleanType => current.getBoolean(i, 0)
          case StringType => UTF8String.fromBytes(current.getBinary(i, 0).getBytes)
          case other => throw new IllegalArgumentException(s"unsupported read type $other")
        }
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
