package graft

import graft.functions.{KMinValues, PointInPolygon, PolyHash, PushPolygonBbox, VectorDot, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registration — the deployment-grade way to ship
  * the engine's custom expressions: users add
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the functions exist in every
  * session, SQL and DataFrame alike, without calling Graft.registerFunctions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // Web-Mercator scalar functions — the same shared Catalyst builders the
    // session-local Graft.registerFunctions path uses, so both surfaces
    // agree bit-for-bit with the DataFrame WebMercator columns.
    Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)](
      ("st_lon_to_x", exprs => Graft.MercatorExprs.lonToX(exprs.head)),
      ("st_lat_to_y", exprs => Graft.MercatorExprs.latToY(exprs.head)),
      ("st_x_to_lon", exprs => Graft.MercatorExprs.xToLon(exprs.head)),
      ("st_y_to_lat", exprs => Graft.MercatorExprs.yToLat(exprs.head)),
      ("st_utm_easting", exprs => Graft.UtmExprs.easting(exprs(0), exprs(1), exprs(2))),
      ("st_utm_northing", exprs => Graft.UtmExprs.northing(exprs(0), exprs(1), exprs(2))),
      ("st_utm_lat", exprs => Graft.UtmExprs.lat(exprs(0), exprs(1), exprs(2))),
      ("st_utm_lon", exprs => Graft.UtmExprs.lon(exprs(0), exprs(1), exprs(2)))).foreach {
      case (name, builder) =>
        e.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(graft.geo.WebMercator.getClass.getName, name),
          builder))
    }
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      exprs => VectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      exprs => PolyHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      exprs => WordShingles(exprs.head, 3)))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      exprs => graft.functions.SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("kmin_values"),
      new ExpressionInfo(classOf[KMinValues].getName, "kmin_values"),
      exprs => KMinValues(exprs(0), exprs(1).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[graft.functions.HeavyHitters].getName, "heavy_hitters"),
      exprs => graft.functions.HeavyHitters(
        exprs(0), exprs(1).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("mmr_select"),
      new ExpressionInfo(classOf[graft.functions.MmrSelect].getName, "mmr_select"),
      exprs => graft.functions.MmrSelect(
        exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        graft.functions.VectorExprs.litDouble(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("registrable_domain"),
      new ExpressionInfo(classOf[graft.functions.RegistrableDomainPsl].getName,
        "registrable_domain"),
      exprs => graft.functions.RegistrableDomainPsl(exprs.head, graft.ops.Psl.default)))
    e.injectFunction((
      FunctionIdentifier("st_point_in_poly"),
      new ExpressionInfo(classOf[PointInPolygon].getName, "st_point_in_poly"),
      exprs => PointInPolygon(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), org.apache.spark.sql.types.DoubleType),
        graft.geo.Polygon.parseWkt(exprs(2).eval(null).toString))))
    // Auto-inject the ring bbox next to any st_point_in_poly filter, so the
    // range conjuncts push into the scan (row-group pruning) with no manual
    // pre-filter.
    e.injectOptimizerRule(_ => PushPolygonBbox)
    // Rewrite point-in-interval theta joins (BETWEEN with no equi key) from
    // the nested loop Spark would plan into the leveled-grid equi-join.
    e.injectOptimizerRule(_ => graft.plans.RewriteRangeJoin)
    // Native as-of join: plan graft.plans.AsOfJoin logical nodes as the
    // sort-merge AsOfJoinExec.
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
