package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Extensions-based function injection: a session built with
  * GraftExtensions has the custom functions with no explicit registration.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers with SparkTest {

  test("a session built withExtensions(GraftExtensions) resolves the custom functions") {
    spark.sparkContext // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          | poly_hash('ab') AS h, size(word_shingles('a b c d')) AS ns""".stripMargin).head()
      r.getDouble(0) shouldBe 11.0 +- 1e-12
      r.getLong(1) shouldBe 3105L
      r.getInt(2) shouldBe 2
      // PSL resolution through the extensions surface (wildcard shape)
      s2.sql("SELECT registrable_domain('a.b.example.ck') AS d")
        .head().getString(0) shouldBe "b.example.ck"
      // simhash64 through SQL agrees with the DataFrame expression
      val sh = s2.sql("SELECT simhash64('the quick brown fox') AS h").head().getLong(0)
      import s2.implicits._
      val dfH = Seq("the quick brown fox").toDF("t")
        .select(graft.functions.TextExprs.simHash64(org.apache.spark.sql.functions.col("t")))
        .head().getLong(0)
      sh shouldBe dfH
      // Web-Mercator functions inject too (parity with Graft.init's
      // session-local registration — same shared Catalyst builders)
      val m = s2.sql(
        """SELECT st_lon_to_x(-93.759055) AS x, st_lat_to_y(41.925015) AS y,
          | st_x_to_lon(st_lon_to_x(-93.759055)) AS lon_rt""".stripMargin).head()
      m.getDouble(0) shouldBe graft.geo.WebMercator.lonToX(-93.759055)
      m.getDouble(1) shouldBe graft.geo.WebMercator.latToY(41.925015)
      m.getDouble(2) shouldBe -93.759055 +- 1e-9
      // st_point_in_poly resolves through the extension. (Over a
      // LocalRelation the optimizer constant-folds the whole filter, so
      // only the RESULT is assertable here — the bbox-injection plan shape
      // is pinned against parquet in GraftSqlSpec.)
      s2.createDataFrame(Seq((1L, 2.0, 2.0), (2L, 50.0, 50.0)))
        .toDF("id", "x", "y")
        .createOrReplaceTempView("ext_pts")
      val q = s2.sql(
        "SELECT id FROM ext_pts WHERE st_point_in_poly(x, y, 'POLYGON((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))')")
      q.collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
      // do NOT stop s2 — it shares the JVM-wide SparkContext
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
