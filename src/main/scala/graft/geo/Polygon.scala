package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact point-in-polygon containment — the full-fidelity form of the
  * reference's polygon crop: `fetch_data` pushes the query polygon (not just
  * its bbox) into the PDAL pipeline (`filters.crop`/`readers.ept` polygon,
  * `/root/reference/pipeline.json:6`, injected at
  * `scripts/usgs_lidar.py:121-127`), so points inside the bounds but outside
  * the polygon are dropped. [[graft.LidarEngine]] F4 serializes polygons to
  * WKT; this is the evaluation side.
  *
  * The predicate is the even-odd ray cast, unrolled at plan-build time into
  * one arithmetic term per edge (the vertex list is a query constant — the
  * reference's polygons have ~4-10 vertices). Everything is plain Column
  * arithmetic over flat doubles: whole-stage codegen applies, and the same
  * unrolled expression is renderable as ANSI SQL ([[predicateSql]]) so an
  * external engine computes the bit-identical IEEE sequence — which is what
  * the driver's hash compare requires.
  *
  * 100 TB posture: the predicate is map-only (no join, no shuffle) and is
  * paired with [[Polygon.bbox]] pre-filtering — the bbox conjuncts are
  * min/max-pruning-friendly and reach the parquet scan (or the DSv2
  * connector's pushed-filter list), so whole row groups/tiles are skipped
  * before the per-edge arithmetic runs on survivors.
  */
object Polygon {

  /** One polygon edge with driver-side precomputed deltas, so Spark and the
    * SQL oracle both consume identical literal values (no re-derivation in
    * either engine).
    */
  private final case class Edge(xi: Double, yi: Double, xj: Double, yj: Double) {
    val dx: Double = xj - xi
    val dy: Double = yj - yi
  }

  /** Closed ring -> non-horizontal edges (horizontal edges can never satisfy
    * the strict/non-strict y-straddle test and would divide by dy = 0).
    */
  private def edges(ring: Seq[(Double, Double)]): Seq[Edge] = {
    require(ring.size >= 3, s"polygon needs >= 3 vertices, got ${ring.size}")
    val closed = if (ring.head == ring.last) ring else ring :+ ring.head
    closed.sliding(2).collect {
      case Seq((xi, yi), (xj, yj)) if yi != yj => Edge(xi, yi, xj, yj)
    }.toSeq
  }

  /** WKT `POLYGON((x y, x y, ...))` -> vertex ring. Inverse of
    * [[graft.LidarEngine.wktPolygon]] (F4); outer ring only, matching the
    * reference's single-ring polygons.
    */
  def parseWkt(wkt: String): Seq[(Double, Double)] = {
    val body = wkt.trim
      .stripPrefix("POLYGON").trim
      .stripPrefix("((").stripSuffix("))")
    body.split(",").toSeq.map { pair =>
      val parts = pair.trim.split("\\s+")
      require(parts.length == 2, s"bad WKT vertex: '$pair'")
      (parts(0).toDouble, parts(1).toDouble)
    }
  }

  /** Even-odd ray cast as a Column predicate: a horizontal ray from (x, y)
    * crosses edge (i, j) iff the edge straddles y half-open (yi > y) != (yj
    * > y) and the crossing abscissa dx*(y-yi)/dy + xi lies right of x. Odd
    * crossing count == inside. Crossings are summed as 0/1 ints and reduced
    * mod 2 (not boolean-XOR-folded) so the oracle SQL is a plain SUM(CASE).
    */
  def contains(x: Column, y: Column, ring: Seq[(Double, Double)]): Column = {
    val terms = edges(ring).map { e =>
      val straddles = (lit(e.yi) > y) =!= (lit(e.yj) > y)
      val crossX = lit(e.dx) * (y - lit(e.yi)) / lit(e.dy) + lit(e.xi)
      when(straddles && x < crossX, 1).otherwise(0)
    }
    // A degenerate ring (all vertices collinear on one horizontal line) has
    // no non-horizontal edges: zero area, nothing is inside — and must not
    // crash on empty.reduce (matches PointInPolygon's zero-crossings false).
    if (terms.isEmpty) lit(false)
    else terms.reduce(_ + _) % 2 === 1
  }

  /** The identical unrolled predicate as ANSI SQL over column names xCol /
    * yCol — same literals, same parenthesization, same op order as
    * [[contains]], so DuckDB executes the bit-identical IEEE sequence.
    */
  def predicateSql(xCol: String, yCol: String, ring: Seq[(Double, Double)]): String = {
    val terms = edges(ring).map { e =>
      s"(CASE WHEN (${e.yi} > $yCol) <> (${e.yj} > $yCol) " +
        s"AND $xCol < ((${e.dx} * ($yCol - ${e.yi})) / ${e.dy} + ${e.xi}) THEN 1 ELSE 0 END)"
    }
    if (terms.isEmpty) "1 = 0" // degenerate ring: zero area (see contains)
    else s"(${terms.mkString(" + ")}) % 2 = 1"
  }

  /** Edge table for the native expression ([[graft.functions.PointInPolygon]]):
    * rows yi / yj / dx / dy / xi, one column per non-horizontal edge — the
    * same driver-side precomputation [[contains]] unrolls into literals, so
    * loop and unrolled forms execute identical IEEE sequences per edge.
    */
  def edgeTable(ring: Seq[(Double, Double)]): Array[Array[Double]] = {
    val es = edges(ring)
    Array(
      es.map(_.yi).toArray, es.map(_.yj).toArray,
      es.map(_.dx).toArray, es.map(_.dy).toArray, es.map(_.xi).toArray)
  }

  /** Bbox pre-filter conjuncts for the ring — the pushdown-friendly
    * companion: apply before [[contains]] so parquet/DSv2 min-max pruning
    * eliminates non-candidate row groups before any per-edge arithmetic.
    */
  def bbox(x: Column, y: Column, ring: Seq[(Double, Double)]): Column = {
    val xs = ring.map(_._1); val ys = ring.map(_._2)
    x >= xs.min && x <= xs.max && y >= ys.min && y <= ys.max
  }

  /** Same bbox conjuncts as SQL for the oracle. */
  def bboxSql(xCol: String, yCol: String, ring: Seq[(Double, Double)]): String = {
    val xs = ring.map(_._1); val ys = ring.map(_._2)
    s"$xCol >= ${xs.min} AND $xCol <= ${xs.max} AND $yCol >= ${ys.min} AND $yCol <= ${ys.max}"
  }
}
