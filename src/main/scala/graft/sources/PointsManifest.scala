package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Persisted tile-metadata manifest for the [[PointsSource]] connector.
  *
  * Without a manifest, every query plans by reading one parquet footer per
  * tile on the driver — parity with the reference's per-resource `ept.json`
  * fetch, but at 100 TB / O(10^6) tiles that is O(tiles) remote metadata
  * round-trips PER QUERY. The layout writer owns the tile set, so it writes
  * the per-tile per-column min/max (and the uniform file schema) ONCE at
  * layout time; planning then becomes a single small sequential file read,
  * with the footer path kept as the fallback for tile directories no layout
  * writer produced.
  *
  * Format is a flat text file (`_graft_manifest.txt` — the underscore
  * prefix keeps every Spark/Hadoop lister away from it), one record per
  * line:
  * {{{
  *   graft-points-manifest v1
  *   SCHEMA <parquet MessageType string, newlines escaped as \n>
  *   TILE <file name>
  *   COL <column> <min> <max>        (only columns with complete stats)
  * }}}
  * Doubles round-trip through `java.lang.Double.toString`/`parseDouble`
  * exactly; a column absent from a TILE block means "statistics unknown —
  * cannot prune on it", the same semantics the footer path gives a missing
  * statistic. Stale-manifest hazard is guarded twice: the layout writer
  * rewrites tiles and manifest together (behind its _SUCCESS guard), and
  * the reader verifies the manifest's tile set against the directory
  * listing at plan time, falling back to footer planning on any drift
  * (see [[PointsSource]] — a trusted-but-stale manifest would silently
  * drop tiles added after it was written).
  */
object PointsManifest {

  val FileName = "_graft_manifest.txt"
  private val Header = "graft-points-manifest v1"

  /** One tile's pruning metadata: file NAME (not path — the manifest is
    * relocatable with its directory) and per-column [min, max] for every
    * column whose statistics are complete across all row groups.
    */
  case class TileStats(file: String, cols: Map[String, (Double, Double)])

  case class Manifest(schemaStr: String, tiles: Seq[TileStats])

  private def manifestPath(dir: String): Path = new Path(dir, FileName)

  def exists(dir: String, conf: Configuration): Boolean = {
    val p = manifestPath(dir)
    p.getFileSystem(conf).exists(p)
  }

  /** Build the manifest from the tiles' parquet footers (driver-side,
    * parallel — the one-time cost planning otherwise pays per query) and
    * write it atomically (temp file + rename).
    */
  def write(dir: String, conf: Configuration): Unit = {
    val files = PointsSource.listFiles(dir, conf)
    require(files.nonEmpty, s"no parquet tiles under $dir to manifest")
    import scala.jdk.CollectionConverters._
    val tiles = files.asJava.parallelStream().map[(String, Map[String, (Double, Double)], String)] { f =>
      val footer = PointsSource.footerOf(f, conf)
      (f.getName, PointsSource.footerStats(footer), footer.getFileMetaData.getSchema.toString)
    }.collect(java.util.stream.Collectors.toList[(String, Map[String, (Double, Double)], String)])
      .asScala.toSeq.sortBy(_._1)
    val schemaStr = tiles.head._3
    val sb = new StringBuilder
    sb.append(Header).append('\n')
    sb.append("SCHEMA ").append(schemaStr.replace("\\", "\\\\").replace("\n", "\\n")).append('\n')
    tiles.foreach { case (name, cols, _) =>
      sb.append("TILE ").append(name).append('\n')
      cols.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
        sb.append("COL ").append(c).append(' ').append(mn).append(' ').append(mx).append('\n')
      }
    }
    val fs = manifestPath(dir).getFileSystem(conf)
    val tmp = new Path(dir, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fs.delete(manifestPath(dir), false)
    if (!fs.rename(tmp, manifestPath(dir)))
      throw new java.io.IOException(s"could not move $tmp to ${manifestPath(dir)}")
  }

  /** Parse the manifest if present; None -> caller falls back to footers. */
  def read(dir: String, conf: Configuration): Option[Manifest] = {
    val p = manifestPath(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
    val lines = text.split('\n').filter(_.nonEmpty)
    require(lines.headOption.contains(Header), s"unrecognized manifest header in $p")
    var schemaStr: String = null
    val tiles = Seq.newBuilder[TileStats]
    var curFile: String = null
    var curCols = Map.newBuilder[String, (Double, Double)]
    def flush(): Unit = if (curFile != null) tiles += TileStats(curFile, curCols.result())
    lines.drop(1).foreach { line =>
      val sp = line.indexOf(' ')
      val (tag, rest) = (line.substring(0, sp), line.substring(sp + 1))
      tag match {
        case "SCHEMA" =>
          // unescape in one pass: \\ -> \ and \n -> newline
          val sb = new StringBuilder
          var i = 0
          while (i < rest.length) {
            val c = rest.charAt(i)
            if (c == '\\' && i + 1 < rest.length) {
              rest.charAt(i + 1) match {
                case 'n' => sb.append('\n'); i += 2
                case '\\' => sb.append('\\'); i += 2
                case other => sb.append(other); i += 2
              }
            } else { sb.append(c); i += 1 }
          }
          schemaStr = sb.toString
        case "TILE" =>
          flush()
          curFile = rest
          curCols = Map.newBuilder
        case "COL" =>
          // Split from the RIGHT: a parquet column name may legally contain
          // spaces, so the last two tokens are (min, max) and everything
          // before them is the name — a left split would shift the stats
          // fields and throw NumberFormatException (or mis-key the stats).
          val mxSp = rest.lastIndexOf(' ')
          val mnSp = if (mxSp > 0) rest.lastIndexOf(' ', mxSp - 1) else -1
          require(mnSp > 0, s"bad COL record '$line' in $p")
          curCols += rest.substring(0, mnSp) ->
            (rest.substring(mnSp + 1, mxSp).toDouble, rest.substring(mxSp + 1).toDouble)
        case other => throw new IllegalArgumentException(s"bad manifest line tag '$other' in $p")
      }
    }
    flush()
    require(schemaStr != null, s"manifest $p has no SCHEMA record")
    Some(Manifest(schemaStr, tiles.result()))
  }
}
