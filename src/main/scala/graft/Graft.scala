package graft

import graft.functions.{KMinValues, PolyHash, VectorDot, WordShingles}
import graft.geo.WebMercator
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface entry point: registers the engine's custom functions and the
  * fixture tables so the whole operator surface is reachable from
  * `spark.sql(...)` as well as the DataFrame API.
  *
  * Functions registered:
  *  - `st_lon_to_x(lon)`, `st_lat_to_y(lat)`, `st_x_to_lon(x)`,
  *    `st_y_to_lat(y)` — closed-form Web-Mercator (F1/F2)
  *  - `vector_dot(a, b)` — native embedding dot product
  *  - `poly_hash(s)` — deterministic document fingerprint
  *  - `word_shingles(s)` — distinct word 3-gram shingles
  *  - `registrable_domain(host)` — Public-Suffix-List resolution
  */
object Graft {

  /** Catalyst twins of the WebMercator Column formulas — same literal
    * values and operation order, so SQL and DataFrame paths agree
    * bit-for-bit. (Composed Columns can't round-trip through the function
    * registry: they wrap into unresolvable ColumnNode exprs.) Shared by
    * the session-local registration below and [[GraftExtensions]].
    */
  private[graft] object MercatorExprs {
    import org.apache.spark.sql.catalyst.expressions._
    private val d2r = Literal(math.Pi / 180.0)
    private val r = Literal(WebMercator.R)
    private def clampLat(e: Expression): Expression =
      Least(Seq(Greatest(Seq(e, Literal(-WebMercator.MaxLat))), Literal(WebMercator.MaxLat)))
    def lonToX(e: Expression): Expression = Multiply(Multiply(e, d2r), r)
    def latToY(e: Expression): Expression =
      Multiply(Log(Tan(Add(Literal(math.Pi / 4.0), Divide(Multiply(clampLat(e), d2r), Literal(2.0))))), r)
    def xToLon(e: Expression): Expression = Divide(Divide(e, r), d2r)
    def yToLat(e: Expression): Expression =
      Divide(Subtract(Multiply(Atan(Exp(Divide(e, r))), Literal(2.0)), Literal(math.Pi / 2.0)), d2r)
  }

  /** UTM scalar-function builders over [[geo.TransverseMercator.ExprAlg]]
    * — the Catalyst instantiation of the same structural builder the
    * Column and oracle-SQL paths use (EPSG must be a literal: it
    * parameterizes the series constants at resolution time). Shared by
    * the session-local registration and [[GraftExtensions]].
    */
  private[graft] object UtmExprs {
    import org.apache.spark.sql.catalyst.expressions._
    import graft.geo.TransverseMercator
    private def dbl(e: Expression): Expression = Cast(e, org.apache.spark.sql.types.DoubleType)
    private def zone(e: Expression): (Double, Boolean) = {
      // Guard BEFORE eval: a non-foldable (column) or null EPSG argument
      // must fail with the contract message, not an opaque
      // ClassCastException/NPE out of eval(null) at analysis time.
      if (!e.foldable) throw new IllegalArgumentException(
        "st_utm_* EPSG argument must be an integer literal — it selects the " +
          s"projection constants at resolution time (got non-literal: ${e.sql})")
      val epsg = e.eval(null) match {
        case n: Number => n.intValue()
        case null => throw new IllegalArgumentException(
          "st_utm_* EPSG argument must be a non-null integer literal")
        case other => throw new IllegalArgumentException(
          s"st_utm_* EPSG argument must be an integer literal, got: $other")
      }
      val (z, south) = TransverseMercator.zoneOf(epsg).getOrElse(
        throw new IllegalArgumentException(s"not a UTM EPSG code: $epsg"))
      (TransverseMercator.centralMeridianDeg(z), south)
    }
    def easting(lat: Expression, lon: Expression, epsg: Expression): Expression = {
      val (lon0, south) = zone(epsg)
      TransverseMercator.forward(TransverseMercator.ExprAlg, dbl(lat), dbl(lon), lon0, south)._1
    }
    def northing(lat: Expression, lon: Expression, epsg: Expression): Expression = {
      val (lon0, south) = zone(epsg)
      TransverseMercator.forward(TransverseMercator.ExprAlg, dbl(lat), dbl(lon), lon0, south)._2
    }
    def lat(e: Expression, n: Expression, epsg: Expression): Expression = {
      val (lon0, south) = zone(epsg)
      TransverseMercator.inverse(TransverseMercator.ExprAlg, dbl(e), dbl(n), lon0, south)._1
    }
    def lon(e: Expression, n: Expression, epsg: Expression): Expression = {
      val (lon0, south) = zone(epsg)
      TransverseMercator.inverse(TransverseMercator.ExprAlg, dbl(e), dbl(n), lon0, south)._2
    }
  }

  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    val reg = spark.sessionState.functionRegistry

    // st_utm_*(…, epsg): ellipsoidal UTM forward/inverse (literal EPSG).
    reg.createOrReplaceTempFunction("st_utm_easting", exprs => UtmExprs.easting(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("st_utm_northing", exprs => UtmExprs.northing(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("st_utm_lat", exprs => UtmExprs.lat(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("st_utm_lon", exprs => UtmExprs.lon(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("st_lon_to_x", exprs => MercatorExprs.lonToX(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("st_lat_to_y", exprs => MercatorExprs.latToY(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("st_x_to_lon", exprs => MercatorExprs.xToLon(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("st_y_to_lat", exprs => MercatorExprs.yToLat(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("poly_hash", exprs => PolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles", exprs => WordShingles(exprs.head, 3), "built-in")
    // registrable_domain(host) — Public-Suffix-List resolution over the
    // embedded snapshot (swap via Psl.parse + UrlExprs for a custom list).
    reg.createOrReplaceTempFunction("registrable_domain",
      exprs => graft.functions.RegistrableDomainPsl(exprs.head, graft.ops.Psl.default),
      "built-in")
    // kmin_values(hash_col, k) — KMV distinct-count sketch aggregate; the
    // analyzer wraps the AggregateFunction into an AggregateExpression.
    reg.createOrReplaceTempFunction(
      "kmin_values",
      exprs => KMinValues(exprs(0), exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    // heavy_hitters(key_col, m) — Misra-Gries frequent-items aggregate.
    reg.createOrReplaceTempFunction(
      "heavy_hitters",
      exprs => graft.functions.HeavyHitters(
        exprs(0), exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    // mmr_select(packed_candidates, k, lambda) — greedy MMR re-rank over a
    // collect_list-packed array<struct<id, rel, v>> (k and lambda literal).
    reg.createOrReplaceTempFunction(
      "mmr_select",
      exprs => graft.functions.MmrSelect(
        exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        graft.functions.VectorExprs.litDouble(exprs(2))),
      "built-in")
    // st_point_in_poly(x, y, 'POLYGON((...))') — exact polygon containment.
    // The WKT must be a literal (it parametrizes the plan): the ring is
    // parsed at resolution time into the native PointInPolygon expression
    // (same per-edge arithmetic as the Column path), and the companion
    // optimizer rule auto-injects the ring's bbox conjuncts under any
    // Filter so scan pruning happens without a manual pre-filter.
    reg.createOrReplaceTempFunction(
      "st_point_in_poly",
      exprs => graft.functions.PointInPolygon(
        Cast(exprs(0), org.apache.spark.sql.types.DoubleType),
        Cast(exprs(1), org.apache.spark.sql.types.DoubleType),
        graft.geo.Polygon.parseWkt(exprs(2).eval(null).toString)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => graft.functions.SimHash64(exprs.head), "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.functions.PushPolygonBbox))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.functions.PushPolygonBbox
    // Same optimizer-rule parity as the extensions path: plain BETWEEN theta
    // joins execute as the leveled-grid equi-join here too.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
  }

  /** Register every fixture table in `dir` as a temp view (events with the
    * nanos normalization applied), so oracle-style SQL runs directly.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  def init(spark: SparkSession, dir: String): Unit = {
    registerFunctions(spark)
    registerTables(spark, dir)
  }
}
