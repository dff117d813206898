package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQL surface: custom functions + registered views drive the same
  * operators through `spark.sql`.
  */
class GraftSqlSpec extends AnyFunSuite with Matchers with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("custom functions work from SQL") {
    Graft.init(spark, dir)
    val r = spark.sql(
      """SELECT st_lon_to_x(-93.759055) AS x, st_lat_to_y(41.925015) AS y,
        | st_x_to_lon(st_lon_to_x(-93.759055)) AS lon_rt,
        | vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        | poly_hash('ab') AS h,
        | size(word_shingles('a b c d')) AS ns,
        | registrable_domain('b.example.co.uk') AS rd,
        | registrable_domain('co.uk') AS rd_null""".stripMargin).head()
    r.getDouble(0) shouldBe graft.geo.WebMercator.lonToX(-93.759055)
    r.getDouble(1) shouldBe graft.geo.WebMercator.latToY(41.925015)
    r.getDouble(2) shouldBe -93.759055 +- 1e-9
    r.getDouble(3) shouldBe 11.0 +- 1e-12
    r.getLong(4) shouldBe 3105L // (0*31+97)*31+98 mod 1e9+7
    r.getInt(5) shouldBe 2
    r.getString(6) shouldBe "example.co.uk"
    r.isNullAt(7) shouldBe true // a public suffix has no registrable domain
  }

  test("st_utm_* SQL functions agree bit-for-bit with the scalar Krüger series") {
    Graft.init(spark, dir)
    val r = spark.sql(
      """SELECT st_utm_easting(40.7D, -74.2D, 32618) AS e,
        | st_utm_northing(40.7D, -74.2D, 32618) AS n,
        | st_utm_lat(st_utm_easting(40.7D, -74.2D, 32618), st_utm_northing(40.7D, -74.2D, 32618), 32618) AS lat_rt,
        | st_utm_lon(st_utm_easting(40.7D, -74.2D, 32618), st_utm_northing(40.7D, -74.2D, 32618), 32618) AS lon_rt""".stripMargin).head()
    val (es, ns) = graft.geo.TransverseMercator.utmForward(40.7, -74.2, 32618)
    r.getDouble(0) shouldBe es
    r.getDouble(1) shouldBe ns
    r.getDouble(2) shouldBe 40.7 +- 1e-9
    r.getDouble(3) shouldBe -74.2 +- 1e-9
    // a non-UTM EPSG is rejected at resolution time
    val err = intercept[Exception](spark.sql("SELECT st_utm_easting(1.0D, 2.0D, 4326)").head())
    err.getMessage should include("UTM")
    // a non-literal EPSG argument fails with the contract message, not an
    // opaque ClassCastException out of eval(null) (round-5 advice)
    val errCol = intercept[Exception](
      spark.sql("SELECT st_utm_easting(1.0D, 2.0D, CAST(x AS INT)) FROM VALUES (32618) t(x)").head())
    errCol.getMessage should include("literal")
    // a null EPSG literal likewise
    val errNull = intercept[Exception](
      spark.sql("SELECT st_utm_easting(1.0D, 2.0D, CAST(NULL AS INT))").head())
    errNull.getMessage should (include("null") or include("literal"))
  }

  test("mmr_select runs from SQL over a collect_list-packed candidate frame") {
    Graft.init(spark, dir)
    import spark.implicits._
    Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.8, Seq(0.999, 0.001)),
      (3L, 0.4, Seq(0.0, 1.0))).toDF("id", "rel", "v")
      .createOrReplaceTempView("mmr_cand")
    val picked = spark.sql(
      """SELECT e.vec_id, e.rnd FROM (
        | SELECT explode(mmr_select(collect_list(struct(id, rel, v)), 2, 0.5)) AS e
        | FROM mmr_cand)""".stripMargin)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
    picked shouldBe Seq((1L, 1L), (2L, 3L)) // diversified: round 2 jumps clusters
  }

  test("st_point_in_poly: SQL and DataFrame paths agree on a non-convex ring") {
    Graft.init(spark, dir)
    val wkt = "POLYGON((0.0 0.0, 10.0 0.0, 10.0 5.0, 5.0 5.0, 5.0 10.0, 0.0 10.0, 0.0 0.0))"
    val viaSql = spark.sql(
      s"""SELECT p_partkey FROM part
         |WHERE st_point_in_poly(CAST(p_partkey % 11 AS DOUBLE), CAST(p_partkey % 13 AS DOUBLE), '$wkt')
         |ORDER BY p_partkey""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    import org.apache.spark.sql.functions._
    val ring = graft.geo.Polygon.parseWkt(wkt)
    val viaDf = Tables(spark, dir, "part")
      .filter(graft.geo.Polygon.contains(
        (col("p_partkey") % 11).cast("double"), (col("p_partkey") % 13).cast("double"), ring))
      .orderBy("p_partkey").collect().map(_.getLong(0)).toSeq
    viaSql shouldBe viaDf
    viaSql.nonEmpty shouldBe true
  }

  test("a bare st_point_in_poly filter gets its bbox pushed into the parquet scan") {
    Graft.init(spark, dir)
    // No manual bbox pre-filter: the PushPolygonBbox optimizer rule must
    // inject the ring's range conjuncts, and they must reach PushedFilters.
    val q = spark.sql(
      """SELECT l_orderkey FROM lineitem
        |WHERE st_point_in_poly(l_extendedprice, l_quantity,
        |  'POLYGON((10000.0 5.0, 60000.0 5.0, 60000.0 25.0, 35000.0 25.0, 35000.0 45.0, 10000.0 45.0, 10000.0 5.0))')""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    plan should include("GreaterThanOrEqual(l_extendedprice,10000.0)")
    // (the PushedFilters list is elided in toString; the quantity bound is
    // visible in the Filter condition with a generated attribute id)
    plan should include regex """l_quantity#\d+ <= 45\.0"""
    // And the predicate itself still selects the exact polygon rows.
    import org.apache.spark.sql.functions._
    val ring = graft.geo.Polygon.parseWkt(
      "POLYGON((10000.0 5.0, 60000.0 5.0, 60000.0 25.0, 35000.0 25.0, 35000.0 45.0, 10000.0 45.0, 10000.0 5.0))")
    val expected = Tables(spark, dir, "lineitem")
      .filter(graft.geo.Polygon.contains(col("l_extendedprice"), col("l_quantity"), ring))
      .count()
    q.count() shouldBe expected
  }

  test("r07 polygon crop runs as pure SQL through Graft.init and matches the DataFrame path") {
    Graft.init(spark, dir)
    // The FULL r07 query as SQL text: st_point_in_poly predicate (bbox
    // conjuncts auto-injected by PushPolygonBbox) + the decimal-exact
    // aggregate mirrors of Exact.dsum/davg. Must reproduce the registered
    // DataFrame query row-for-row, proving the SQL surface executes the
    // same optimized semantics end to end.
    val wkt = "POLYGON((10000.0 5.0, 60000.0 5.0, 60000.0 25.0, 35000.0 25.0, " +
      "35000.0 45.0, 10000.0 45.0, 10000.0 5.0))"
    val viaSql = spark.sql(
      s"""SELECT y, CAST(count(*) AS BIGINT) AS n_points,
         | CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
         | CAST(SUM(CAST(z AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_z
         |FROM (SELECT l_extendedprice AS x, l_quantity AS y, l_discount*100.0 AS z FROM lineitem)
         |WHERE st_point_in_poly(x, y, '$wkt')
         |GROUP BY y ORDER BY y""".stripMargin)
    val viaDf = SparkEntry.queries("r07_polygon_crop")(spark, dir)
    viaSql.collect().toSeq shouldBe viaDf.collect().toSeq
    viaSql.count() should be > 0L
  }

  test("a plain BETWEEN theta join auto-rewrites to the grid equi-join and matches the DataFrame path") {
    Graft.init(spark, dir)
    // q24's shape as SQL text: no manual grid code, just BETWEEN. The
    // RewriteRangeJoin rule (injected by Graft.init) must splice the
    // leveled-grid plan — pinned by the __lvl key and the absence of a
    // nested-loop join — and results must equal the explicit
    // Intervals.intervalJoin DataFrame path.
    val q = spark.sql(
      """SELECT iid, CAST(count(*) AS BIGINT) AS n_points,
        | CAST(SUM(CAST(t AS DECIMAL(18,2))) AS DOUBLE) AS sum_t
        |FROM (SELECT l_extendedprice AS t FROM lineitem) p
        |JOIN (SELECT s_suppkey AS iid, s_acctbal*10.0 AS start,
        |      s_acctbal*10.0 + 500.0 AS `end` FROM supplier) i
        |  ON p.t BETWEEN i.start AND i.`end`
        |GROUP BY iid ORDER BY iid""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    plan should include("__lvl")
    // The only nested loop allowed is the tiny broadcast-levels cross join,
    // which never references the interval bounds; a data-sized BNLJ would
    // carry start/end in its condition line.
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => { l should not include "start"; l should not include "end" })
    import org.apache.spark.sql.functions._
    val pts = Tables(spark, dir, "lineitem").select(col("l_extendedprice").as("t"))
    val iv = Tables(spark, dir, "supplier").select(
      col("s_suppkey").as("iid"),
      (col("s_acctbal") * 10.0).as("start"),
      (col("s_acctbal") * 10.0 + 500.0).as("end"))
    val expected = ops.Intervals.intervalJoin(pts, iv)
      .groupBy(col("iid"))
      .agg(count(lit(1)).as("n_points"), graft.util.Exact.dsum(col("t"), 2).as("sum_t"))
      .orderBy(col("iid"))
    q.collect().toSeq shouldBe expected.collect().toSeq
  }

  test("an end-to-end reference query runs as pure SQL over the views") {
    Graft.init(spark, dir)
    // Voxel subsample (A1) as SQL with the registered tables.
    val out = spark.sql(
      """WITH pts AS (SELECT l_extendedprice AS x, l_quantity AS y, l_discount*100.0 AS z FROM lineitem),
        |m AS (SELECT min(x) AS mx, min(y) AS my, min(z) AS mz FROM pts)
        |SELECT floor((x - mx)/5000.0) AS vx, floor((y - my)/5.0) AS vy, floor((z - mz)/2.0) AS vz,
        |  count(*) AS n
        |FROM pts CROSS JOIN m GROUP BY 1, 2, 3""".stripMargin)
    out.count() should be > 0L
    // and the events view reads despite the nanos timestamps
    spark.sql("SELECT count(*) FROM events").head().getLong(0) should be > 0L
  }
}
