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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PointsSource.sparkSchema(PointsSource.firstFileSchema(PointsSource.pathOf(options.get("path"))))

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

  private[sources] def hadoopConf(): Configuration = new Configuration()

  /** Data files under the dataset directory, name-sorted for determinism. */
  private[sources] def listFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
      .sortBy(_.getName)
  }

  private[sources] def footerOf(file: Path): org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, hadoopConf()))
    try r.getFooter finally r.close()
  }

  private[sources] def firstFileSchema(dir: String): MessageType = {
    val files = listFiles(dir)
    require(files.nonEmpty, s"no parquet files under $dir")
    footerOf(files.head).getFileMetaData.getSchema
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

  /** Does the tile possibly intersect the pushed bounds? Decided from the
    * footer's per-column min/max statistics, unioned across row groups.
    * Missing/empty statistics mean "cannot prune" — keep the tile.
    */
  private[sources] def tileSurvives(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      bounds: Map[String, (Double, Double)]): Boolean = {
    import scala.jdk.CollectionConverters._
    bounds.forall { case (colName, (lo, hi)) =>
      var minV = Double.PositiveInfinity
      var maxV = Double.NegativeInfinity
      var known = true
      footer.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.find(_.getPath.toDotString == colName) match {
          case Some(cc) =>
            val st = cc.getStatistics
            if (st == null || !st.hasNonNullValue) known = false
            else {
              minV = math.min(minV, st.genericGetMin.asInstanceOf[Number].doubleValue())
              maxV = math.max(maxV, st.genericGetMax.asInstanceOf[Number].doubleValue())
            }
          case None => known = false
        }
      }
      !known || (maxV >= lo && minV <= hi)
    }
  }
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

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-points path=$path, PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"

  /** One partition per surviving tile; pruning happens here, driver-side,
    * from footer statistics only (no data reads). Footer fetches are
    * independent remote metadata ops, so they run in parallel; the dataset
    * schema (uniform across tiles — one writer) is read once and shipped in
    * each InputPartition, so executors never re-fetch a footer just for the
    * projection schema.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val bounds = PointsSource.rangeBounds(pushed)
    val files = PointsSource.listFiles(path)
    if (files.isEmpty) return Array.empty
    val schemaStr = PointsSource.footerOf(files.head).getFileMetaData.getSchema.toString
    val survivors =
      if (bounds.isEmpty) files
      else {
        import scala.jdk.CollectionConverters._
        files.asJava.parallelStream()
          .filter(f => PointsSource.tileSurvives(PointsSource.footerOf(f), bounds))
          .collect(java.util.stream.Collectors.toList[Path]).asScala.toSeq
      }
    survivors.map(f => PointsInputPartition(f.toString, schemaStr): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PointsReaderFactory(required)
}

case class PointsInputPartition(file: String, schemaStr: String) extends InputPartition

class PointsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PointsInputPartition]
    new PointsPartitionReader(p.file, p.schemaStr, required)
  }
}

/** Executor-side tile reader: parquet Group API with a projection schema
  * limited to the required columns (column pruning reaches the actual I/O,
  * not just the row conversion). An empty projection (count(*) plans) reads
  * the narrowest available column and emits empty rows.
  */
class PointsPartitionReader(file: String, schemaStr: String, required: StructType)
  extends PartitionReader[InternalRow] {

  private val conf = PointsSource.hadoopConf()
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
