package graft.ops

import graft.SparkTest
import graft.model.Bbox
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Catalog operators against the FIXTURES.md A2-A4 mini-fixtures:
  * F6/F7 name+year regex, F8 EPT JSON parse, P3+O1 fetchRegions (nulls-last
  * year sort — pandas `sort_values` semantics), J1 broadcast theta join, F9
  * year sentinel.
  */
class CatalogOpsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("withNameAndYear mirrors fetch_name_and_year (usgs_lidar.py:224-242)") {
    val names = Seq(
      "AK_BrooksCamp_2012/", // ordinary year-bearing name
      "IA_FullState/", // no year (metadata.csv:229)
      "NE_Rainwater-2_2009/", // dash in region
      "IN_Statewide-HarrisonCo-2011/", // DASH separator before the year
      "USGS_LPC_AL_SodaLake_2017_B17/", // year mid-name, suffix kept in filename only
      "MN_Xyz_2006_2008/" // first year wins (greedy first match)
    ).toDF("prefix")
    val out = CatalogOps.withNameAndYear(names, "prefix")
      .select("filename", "region", "year").collect().toSeq
    out should contain theSameElementsAs Seq(
      Row("AK_BrooksCamp_2012", "AK_BrooksCamp", 2012),
      Row("IA_FullState", "IA_FullState", null),
      Row("NE_Rainwater-2_2009", "NE_Rainwater-2", 2009),
      Row("IN_Statewide-HarrisonCo-2011", "IN_Statewide-HarrisonCo", 2011),
      Row("USGS_LPC_AL_SodaLake_2017_B17", "USGS_LPC_AL_SodaLake", 2017),
      Row("MN_Xyz_2006_2008", "MN_Xyz", 2006))
  }

  test("parseEptMeta extracts EPT bounds indices 0/3/1/4 (usgs_lidar.py:267-271)") {
    val meta = Seq(
      ("A_2010/", """{"bounds":[1.0,2.0,3.0,11.0,12.0,13.0],"points":42}"""),
      ("B_2011/", """not json"""), // 404-body analog -> dropped by buildCatalog
      ("C_2012/", """{"bounds":[-5.5,-6.5,0.0,5.5,6.5,9.0],"points":7}""")
    ).toDF("prefix", "body")
    val cat = CatalogOps.buildCatalog(meta).orderBy("filename").collect().toSeq
    cat shouldBe Seq(
      Row("A_2010", "A", 2010, 1.0, 11.0, 2.0, 12.0, 42L),
      Row("C_2012", "C", 2012, -5.5, 5.5, -6.5, 6.5, 7L))
  }

  private val miniCatalog = Seq(
    // filename, region, year, xmin, xmax, ymin, ymax, points
    ("R_Contains_2012", "R_Contains", Some(2012), 0.0, 100.0, 0.0, 100.0, 10L),
    ("R_OverlapOnly_2009", "R_OverlapOnly", Some(2009), 40.0, 60.0, 40.0, 60.0, 20L),
    ("R_Disjoint_2015", "R_Disjoint", Some(2015), 1000.0, 2000.0, 1000.0, 2000.0, 30L),
    ("R_NoYear", "R_NoYear", None, -10.0, 200.0, -10.0, 200.0, 40L),
    ("R_Early_2005", "R_Early", Some(2005), 10.0, 90.0, 10.0, 90.0, 50L)
  ).toDF("filename", "region", "year", "xmin", "xmax", "ymin", "ymax", "points")

  test("fetchRegions: containment (not intersection), year asc nulls LAST (P3+O1)") {
    // Query box [30,70]x[30,70]: contained by Contains/NoYear/Early;
    // OverlapOnly intersects but does not contain -> excluded (§2.10.2).
    val out = CatalogOps.fetchRegions(miniCatalog, Bbox(30, 30, 70, 70))
      .select("filename").as[String].collect().toSeq
    out shouldBe Seq("R_Early_2005", "R_Contains_2012", "R_NoYear")
  }

  test("fetchRegions: no containing region -> empty (P5 guard)") {
    CatalogOps.fetchRegions(miniCatalog, Bbox(-500, -500, 500, 500)).isEmpty shouldBe true
  }

  test("matchRegions: batched broadcast theta join (J1) agrees with fetchRegions") {
    val queries = Seq(
      (1, 30.0, 30.0, 70.0, 70.0),
      (2, -5000.0, -5000.0, 5000.0, 5000.0)
    ).toDF("qid", "qminx", "qminy", "qmaxx", "qmaxy")
    val out = CatalogOps.matchRegions(queries, miniCatalog)
      .groupBy("qid").agg(count(lit(1)).as("n"))
      .orderBy("qid").as[(Int, Long)].collect().toSeq
    out shouldBe Seq((1, 3L)) // qid 2 contains nothing -> absent (inner join)
    // The join must be broadcast on the catalog side (no shuffle of queries).
    val plan = CatalogOps.matchRegions(queries, miniCatalog)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
  }

  test("matchRegionsIndexed: gridded equi-join == nested-loop join, no BNLJ in plan") {
    // Deterministic synthetic workload: 200 catalog boxes of wildly varying
    // spans (1e-1 .. 1e4), 150 small query boxes scattered over the same area.
    val catalog = (0 until 200).map { i =>
      val cx = (i % 20) * 500.0 - 3000.0
      val cy = (i / 20) * 700.0 - 1000.0
      val span = math.pow(10.0, (i % 6) - 1) // 0.1 .. 10000
      (s"R_$i", cx - span / 2, cx + span / 2, cy - span / 2, cy + span / 2)
    }.toDF("filename", "xmin", "xmax", "ymin", "ymax")
    val queries = (0 until 150).map { q =>
      val px = (q % 15) * 610.0 - 2800.0
      val py = (q / 15) * 820.0 - 900.0
      val w = 0.5 + (q % 7) * 30.0
      (q, px, py, px + w, py + w)
    }.toDF("qid", "qminx", "qminy", "qmaxx", "qmaxy")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
      df.select(col("qid"), col("filename")).as[(Int, String)].collect().toSet

    val viaLoop = pairs(CatalogOps.matchRegions(queries, catalog))
    val viaGrid = pairs(CatalogOps.matchRegionsIndexed(queries, catalog))
    viaGrid shouldBe viaLoop
    viaLoop.nonEmpty shouldBe true // workload actually exercises matches

    // The whole point: candidate generation is a HASH equi-join on the
    // (lvl, cx, cy) index key — data-sized sides never meet in a nested
    // loop. (The one BNLJ in the plan is the query x distinct-levels cross
    // join — a broadcast of a <= ~60-row constant-size frame, by design.)
    val plan = CatalogOps.matchRegionsIndexed(queries, catalog)
      .queryExecution.executedPlan.toString
    plan should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[lvl"""
    // The containment predicate must ride the hash join, not a nested loop.
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => l should not include "xmin")
  }

  test("yearSentinel renders float-style years and the not_specified sentinel (F9)") {
    val out = miniCatalog
      .select(CatalogOps.yearSentinel(col("year")).as("y"))
      .as[String].collect().toSeq
    out should contain theSameElementsAs
      Seq("2012.0", "2009.0", "2015.0", "Year: not_specified", "2005.0")
  }
}
