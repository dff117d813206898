package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the Entwine Point Tile (EPT) format — the
  * actual on-disk/object-store layout the reference scans with
  * `readers.ept` (`/root/reference/pipeline.json:3-9`, URL built at
  * `scripts/usgs_lidar.py:118-124`). This closes the S1 fidelity gap: the
  * parquet-tile [[PointsSource]] reproduces EPT's PRUNING SEMANTICS;
  * this source reads the EPT layout itself (public spec:
  * entwine.io — `ept.json` metadata, `ept-hierarchy/<key>.json` octree
  * node counts, `ept-data/<D-X-Y-Z>` point payloads).
  *
  * Scope: all three EPT payload encodings. `dataType: "binary"` (raw
  * little-endian structs per the `schema` dimension list),
  * `dataType: "zstandard"` (the same structs, zstd-framed — streamed
  * through zstd-jni, the codec Spark ships for shuffle compression),
  * AND `dataType: "laszip"` payloads —
  * each `ept-data/<key>.laz` node is a complete little LAZ file decoded
  * by the pure-JVM [[graft.sources.laz.LazFile]] codec (LAS 1.2 point
  * formats 0-3 + extra bytes, the formats `usgs-lidar-public`-style
  * Entwine trees serve). Decoded LAS records are re-projected onto the
  * `ept.json` schema by dimension NAME ([[EptSource.LasField]]), so the
  * row-building path is shared with the binary payloads. Planning
  * (node walk, pruning, scale/offset) is payload-independent.
  *
  * Spark-first posture (mirrors [[PointsSource]]):
  *  - one octree NODE per [[InputPartition]];
  *  - [[SupportsPushDownFilters]]: x/y/z range predicates prune whole
  *    nodes by their octree cube bounds (depth-d cube of the root bounds
  *    halved d times — the exact pruning `readers.ept` applies to a
  *    `bounds` option). Filters are also returned as residuals so Spark
  *    re-evaluates rows: pruning is perf, never correctness;
  *  - [[SupportsPushDownRequiredColumns]]: the reader decodes only
  *    projected dimensions (each point is a fixed-stride struct, so a
  *    column subset is offset arithmetic, not full decode).
  *
  * At 100 TB: hierarchy pages are driver-side metadata (EPT shards them
  * into sub-files, loaded lazily below); nodes are O(span^3) points each,
  * so partition count scales with data; executors fetch only surviving
  * node payloads.
  */
class EptSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EptSource.meta(EptSource.pathOf(options.get("path")), PointsSource.sessionHadoopConf()).sparkSchema

  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new EptTable(EptSource.pathOf(properties.get("path")), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object EptSource {

  private[sources] def pathOf(p: String): String = {
    require(p != null && p.nonEmpty, "graft.sources.EptSource requires option(\"path\", dir)")
    p
  }

  /** One EPT dimension: name, signedness/float kind, byte width, and the
    * scale/offset that turn stored integers into coordinate doubles.
    */
  final case class Dim(name: String, kind: String, size: Int, scale: Double, offset: Double) {
    def scaled: Boolean = scale != 1.0 || offset != 0.0
    def sparkType: DataType =
      if (kind == "float" || scaled) DoubleType
      else if (kind == "signed") { if (size == 8) LongType else IntegerType }
      else { // unsigned: widen so the value always fits
        if (size <= 2) IntegerType
        else if (size == 4) LongType
        else throw new IllegalArgumentException(s"unsigned 8-byte dimension $name not supported")
      }
  }

  /** Parsed `ept.json` + derived Spark schema. Bounds are the cubic root
    * bounds `[xmin, ymin, zmin, xmax, ymax, zmax]`.
    */
  final case class EptMeta(
      bounds: Array[Double], span: Long, points: Long, dataType: String,
      hierarchyType: String, dims: Seq[Dim]) {
    val stride: Int = dims.map(_.size).sum
    def sparkSchema: StructType =
      StructType(dims.map(d => StructField(d.name.toLowerCase, d.sparkType, nullable = false)))
  }

  private def readUtf8(path: Path, conf: Configuration): String = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private[sources] def meta(dir: String, conf: Configuration): EptMeta = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(readUtf8(new Path(dir, "ept.json"), conf))
    val b = root.get("bounds")
    require(b != null && b.size() == 6, s"ept.json under $dir lacks a 6-element bounds array")
    import scala.jdk.CollectionConverters._
    val dims = root.get("schema").elements().asScala.map { d =>
      Dim(
        name = d.get("name").asText(),
        kind = d.get("type").asText(),
        size = d.get("size").asInt(),
        scale = if (d.has("scale")) d.get("scale").asDouble() else 1.0,
        offset = if (d.has("offset")) d.get("offset").asDouble() else 0.0)
    }.toSeq
    val dataType = root.get("dataType").asText()
    require(dataType == "binary" || dataType == "laszip" || dataType == "zstandard",
      s"EptSource reads dataType 'binary', 'laszip' and 'zstandard'; got '$dataType'")
    val hierarchyType = if (root.has("hierarchyType")) root.get("hierarchyType").asText() else "json"
    require(hierarchyType == "json", s"unsupported hierarchyType $hierarchyType")
    EptMeta(
      bounds = (0 until 6).map(i => b.get(i).asDouble()).toArray,
      span = root.get("span").asLong(),
      points = if (root.has("points")) root.get("points").asLong() else -1L,
      dataType = dataType, hierarchyType = hierarchyType, dims = dims)
  }

  /** Octree node key "D-X-Y-Z". */
  final case class NodeKey(d: Int, x: Long, y: Long, z: Long) {
    override def toString: String = s"$d-$x-$y-$z"
    /** Node cube: the root bounds halved `d` times, offset by the grid
      * coords (EPT positions children on the regular 2^d grid).
      */
    def cube(rootBounds: Array[Double]): Array[Double] = {
      val sx = (rootBounds(3) - rootBounds(0)) / (1L << d)
      val sy = (rootBounds(4) - rootBounds(1)) / (1L << d)
      val sz = (rootBounds(5) - rootBounds(2)) / (1L << d)
      Array(
        rootBounds(0) + sx * x, rootBounds(1) + sy * y, rootBounds(2) + sz * z,
        rootBounds(0) + sx * (x + 1), rootBounds(1) + sy * (y + 1), rootBounds(2) + sz * (z + 1))
    }
  }

  private[sources] def parseKey(s: String): NodeKey = {
    val p = s.split("-")
    require(p.length == 4, s"bad EPT node key $s")
    NodeKey(p(0).toInt, p(1).toLong, p(2).toLong, p(3).toLong)
  }

  /** Walk the (possibly sharded) hierarchy: a count of -1 marks a subtree
    * continued in `ept-hierarchy/<key>.json` (the EPT paging mechanism for
    * very large trees — each page is a small driver-side metadata read).
    * Returns node -> point count for every data-bearing node.
    */
  private[sources] def hierarchy(dir: String, conf: Configuration): Map[NodeKey, Long] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val acc = scala.collection.mutable.Map.empty[NodeKey, Long]
    def page(key: String): Unit = {
      val root = mapper.readTree(readUtf8(new Path(dir, s"ept-hierarchy/$key.json"), conf))
      val it = root.fields()
      while (it.hasNext) {
        val e = it.next()
        val n = e.getValue.asLong()
        if (n == -1L) page(e.getKey) // continued subtree page
        else if (n > 0L) acc(parseKey(e.getKey)) = n
      }
    }
    page("0-0-0-0")
    acc.toMap
  }

  /** Where a named EPT dimension lives inside a decoded LAS 1.2 point
    * record: a plain little-endian byte range, or a packed bit field of
    * the flags byte (byte 14). Extra-bytes dimensions (anything beyond
    * the standard LAS attributes, e.g. Entwine's OriginId) consume the
    * record tail in schema order.
    */
  private[sources] sealed trait LasField
  private[sources] final case class LasPlain(off: Int, size: Int) extends LasField
  private[sources] final case class LasFlag(shift: Int, width: Int) extends LasField

  private[sources] def lasStandardSize(fmt: Int): Int =
    20 + (if (fmt == 1 || fmt == 3) 8 else 0) + (if (fmt == 2 || fmt == 3) 6 else 0)

  private[sources] def lasFieldFor(name: String, fmt: Int): Option[LasField] = {
    val gpsOff = if (fmt == 1 || fmt == 3) 20 else -1
    val rgbOff = if (fmt == 2) 20 else if (fmt == 3) 28 else -1
    name.toLowerCase match {
      case "x" => Some(LasPlain(0, 4))
      case "y" => Some(LasPlain(4, 4))
      case "z" => Some(LasPlain(8, 4))
      case "intensity" => Some(LasPlain(12, 2))
      case "returnnumber" => Some(LasFlag(0, 3))
      case "numberofreturns" => Some(LasFlag(3, 3))
      case "scandirectionflag" => Some(LasFlag(6, 1))
      case "edgeofflightline" => Some(LasFlag(7, 1))
      case "classification" => Some(LasPlain(15, 1))
      case "scananglerank" | "scanangle" => Some(LasPlain(16, 1))
      case "userdata" => Some(LasPlain(17, 1))
      case "pointsourceid" => Some(LasPlain(18, 2))
      case "gpstime" if gpsOff >= 0 => Some(LasPlain(gpsOff, 8))
      case "red" if rgbOff >= 0 => Some(LasPlain(rgbOff, 2))
      case "green" if rgbOff >= 0 => Some(LasPlain(rgbOff + 2, 2))
      case "blue" if rgbOff >= 0 => Some(LasPlain(rgbOff + 4, 2))
      case _ => None
    }
  }

  /** Re-project decoded LAS records onto the EPT schema layout (dims in
    * `ept.json` order, little-endian, dim-sized) so the row-building
    * path is identical for binary and laszip payloads. Fails loudly on
    * a schema dim whose declared size disagrees with its LAS source
    * width — silent truncation would corrupt values.
    */
  private[sources] def lasToEptRecord(
      las: Array[Byte], plan: Array[(LasField, Int)], out: Array[Byte]): Unit = {
    var o = 0
    var j = 0
    while (j < plan.length) {
      val (field, size) = plan(j)
      field match {
        case LasPlain(off, _) =>
          var i = 0
          while (i < size) { out(o + i) = las(off + i); i += 1 }
        case LasFlag(shift, width) =>
          val v = ((las(14) & 0xFF) >>> shift) & ((1 << width) - 1)
          out(o) = v.toByte
          var i = 1
          while (i < size) { out(o + i) = 0; i += 1 }
      }
      o += size
      j += 1
    }
  }

  /** Per-dim extraction plan for a laszip node: standard LAS attributes
    * by name, remaining dims from the extra-bytes tail in order.
    */
  private[sources] def lasPlan(
      dims: Array[(String, String, Int, Double, Double)], fmt: Int, recordLength: Int)
    : Array[(LasField, Int)] = {
    var extraOff = lasStandardSize(fmt)
    dims.map { case (name, _, size, _, _) =>
      lasFieldFor(name, fmt) match {
        case Some(p: LasPlain) =>
          require(p.size == size,
            s"EPT dim $name declares size $size but its LAS field is ${p.size} bytes")
          (p: LasField, size)
        case Some(f: LasFlag) => (f: LasField, size)
        case None =>
          val p = LasPlain(extraOff, size)
          extraOff += size
          require(extraOff <= recordLength,
            s"EPT dim $name overruns the LAS record (extra bytes end at $extraOff > $recordLength)")
          (p: LasField, size)
      }
    }
  }

  /** Does the node cube intersect the pushed x/y/z bounds? Column names
    * follow the lower-cased Spark schema ("x"/"y"/"z").
    */
  private[sources] def cubeSurvives(
      cube: Array[Double], bounds: Map[String, (Double, Double)]): Boolean = {
    def axis(name: String, lo: Double, hi: Double): Boolean =
      bounds.get(name).forall { case (blo, bhi) => hi >= blo && lo <= bhi }
    axis("x", cube(0), cube(3)) && axis("y", cube(1), cube(4)) && axis("z", cube(2), cube(5))
  }
}

class EptTable(path: String, tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_ept($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EptScanBuilder(path, tableSchema)
}

class EptScanBuilder(path: String, dataSchema: StructType)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(PointsSource.supported(dataSchema))
    filters // everything residual: node pruning is best-effort
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new EptScan(path, required, pushed)
}

class EptScan(path: String, required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  private val driverConf: Configuration = PointsSource.sessionHadoopConf()

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ept path=$path, PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"

  /** Driver-side planning: metadata + hierarchy pages only, then cube-
    * vs-bounds pruning — no point payload is touched for skipped nodes.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val m = EptSource.meta(path, driverConf)
    val bounds = PointsSource.rangeBounds(pushed)
    val ext = m.dataType match {
      case "laszip" => "laz"
      case "zstandard" => "zst"
      case _ => "bin"
    }
    EptSource.hierarchy(path, driverConf).toSeq
      .filter { case (key, _) => bounds.isEmpty || EptSource.cubeSurvives(key.cube(m.bounds), bounds) }
      .sortBy(_._1.toString)
      .map { case (key, n) =>
        EptInputPartition(
          new Path(path, s"ept-data/$key.$ext").toString, n,
          m.dims.map(d => (d.name, d.kind, d.size, d.scale, d.offset)).toArray): InputPartition
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EptReaderFactory(required, new org.apache.spark.util.SerializableConfiguration(driverConf))
}

case class EptInputPartition(
    file: String, points: Long,
    dims: Array[(String, String, Int, Double, Double)]) extends InputPartition

class EptReaderFactory(
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EptPartitionReader(partition.asInstanceOf[EptInputPartition], required, conf.value)
}

/** Executor-side node reader: each point is a fixed-stride little-endian
  * struct in `dims` order; only projected dimensions are decoded (the
  * rest are skipped by offset arithmetic).
  */
class EptPartitionReader(
    partition: EptInputPartition, required: StructType, conf: Configuration)
  extends PartitionReader[InternalRow] {

  private val dims = partition.dims
  private val stride = dims.map(_._3).sum
  // (dim index -> byte offset) for the required columns, in output order
  private val plan: Array[(Int, Int)] = {
    val offsets = dims.scanLeft(0)(_ + _._3)
    required.fieldNames.map { rn =>
      val i = dims.indexWhere(_._1.toLowerCase == rn)
      require(i >= 0, s"column $rn not in EPT schema")
      (i, offsets(i))
    }
  }
  private val isLaz = partition.file.endsWith(".laz")
  private var lazPlanCache: Array[(EptSource.LasField, Int)] = _

  // laszip nodes: whole-file decode up front (nodes are node-sized), then
  // each LAS record is re-projected onto the EPT dim layout by name, so
  // everything below the `buf` line is payload-format-independent.
  private val lazRecords: Array[Array[Byte]] =
    if (!isLaz) null
    else {
      val p = new Path(partition.file)
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen.toInt
      val fileBuf = new Array[Byte](len)
      val s = fs.open(p)
      try s.readFully(0, fileBuf) finally s.close()
      val (h, recs) = graft.sources.laz.LazFile.decompress(fileBuf)
      lazPlanCache = EptSource.lasPlan(dims, h.pointFormat, h.recordLength)
      recs
    }

  // Binary payloads stream directly; zstandard payloads stream through a
  // zstd frame decoder (zstd-jni — the same codec Spark itself uses for
  // shuffle/event-log compression, so it is always on the classpath).
  // Streaming decode keeps memory at O(window), not O(node), and the
  // stride-struct record path below is shared verbatim with binary.
  private val in: java.io.InputStream =
    if (isLaz) null
    else {
      val p = new Path(partition.file)
      val raw = p.getFileSystem(conf).open(p)
      if (partition.file.endsWith(".zst"))
        new java.io.BufferedInputStream(
          new com.github.luben.zstd.ZstdInputStream(raw), 64 * 1024)
      else raw
    }
  private val buf = new Array[Byte](stride)
  private var rows = 0L

  override def next(): Boolean = {
    if (rows >= partition.points) return false
    if (isLaz) {
      if (rows >= lazRecords.length) return false // short payload wins, as below
      EptSource.lasToEptRecord(lazRecords(rows.toInt), lazPlanCache, buf)
      rows += 1
      return true
    }
    var got = 0
    while (got < stride) {
      val n = in.read(buf, got, stride - got)
      if (n < 0) return false // short file: trust the payload over the count
      got += n
    }
    rows += 1
    true
  }

  private def readRaw(kind: String, size: Int, off: Int): Long = {
    // little-endian assembly; sign-extend only signed dims
    var v = 0L
    var i = size - 1
    while (i >= 0) { v = (v << 8) | (buf(off + i) & 0xffL); i -= 1 }
    if (kind == "signed" && size < 8) {
      val shift = 64 - 8 * size
      (v << shift) >> shift
    } else v
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](plan.length)
    var j = 0
    while (j < plan.length) {
      val (i, off) = plan(j)
      val (_, kind, size, scale, offset) = dims(i)
      vals(j) =
        if (kind == "float") {
          val raw =
            if (size == 4) java.lang.Float.intBitsToFloat(readRaw("unsigned", 4, off).toInt).toDouble
            else java.lang.Double.longBitsToDouble(readRaw("unsigned", 8, off))
          raw * scale + offset
        } else {
          val raw = readRaw(kind, size, off)
          if (scale != 1.0 || offset != 0.0) raw * scale + offset
          else dims(i) match {
            case (_, "signed", 8, _, _) => raw
            case (_, "signed", _, _, _) => raw.toInt
            case (_, _, s, _, _) if s <= 2 => raw.toInt // unsigned narrow
            case _ => raw // unsigned 4 -> long
          }
        }
      j += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = if (in != null) in.close()
}
