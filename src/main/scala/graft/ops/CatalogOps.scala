package graft.ops

import graft.model.Bbox
import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog construction + spatial catalog queries (SURVEY.md §2.3/§2.4/§2.7).
  *
  * The catalog is tiny relative to the data it indexes (1,594 rows indexing
  * 31e12 points in the reference) — the 100 TB posture is: always broadcast
  * the catalog side of any join, never shuffle the big side for catalog
  * lookups.
  */
object CatalogOps {

  /** F6/F7 — name + year extraction from an S3 prefix
    * (`fetch_name_and_year`, `scripts/usgs_lidar.py:224-242`):
    * strip '/', regex-match `20[0-9][0-9]+`, region =
    * `location[:match.start() - 1]` — i.e. everything before the match
    * minus exactly ONE separator character (usually '_', but '-' in e.g.
    * IN_Statewide-HarrisonCo-2011 — verified against all 1,594 rows of the
    * reference's own metadata.csv); no match -> (whole name, null year).
    */
  val YearPattern = "20[0-9][0-9]+"

  def withNameAndYear(df: DataFrame, prefixCol: String): DataFrame = {
    val name = regexp_replace(col(prefixCol), "/", "")
    val year = nullif(regexp_extract(name, YearPattern, 0), lit(""))
    val before = regexp_extract(name, s"^(.*?)$YearPattern", 1)
    // Python's location[:match.start()-1]: with the match at position 0 the
    // slice wraps to location[:-1] (drop last char of the whole name).
    val region = when(year.isNull, name)
      .otherwise(
        when(length(before) > 0, before.substr(lit(1), length(before) - 1))
          .otherwise(name.substr(lit(1), length(name) - 1)))
    df.withColumn("filename", name)
      .withColumn("region", region)
      .withColumn("year", year.cast("int"))
  }

  /** F8 — EPT metadata JSON -> bounds/points columns. EPT bounds are
    * [xmin,ymin,zmin,xmax,ymax,zmax] so xmin/xmax/ymin/ymax = indices
    * 0/3/1/4 (`scripts/usgs_lidar.py:267-271`; 1-based in element_at).
    */
  def parseEptMeta(df: DataFrame, bodyCol: String): DataFrame = {
    val j = from_json(col(bodyCol), Schemas.eptMeta)
    df.withColumn("xmin", element_at(j("bounds"), 1))
      .withColumn("ymin", element_at(j("bounds"), 2))
      .withColumn("xmax", element_at(j("bounds"), 4))
      .withColumn("ymax", element_at(j("bounds"), 5))
      .withColumn("points", j("points"))
  }

  /** Catalog build (`fetch_metadata`, `scripts/usgs_lidar.py:245-276`):
    * prefix list -> parse metadata JSON -> name/year -> catalog schema.
    * The reference's per-row HTTP GET + whole-file CSV rewrite (O(n^2), K2)
    * becomes a single distributed projection + one write. Rows whose JSON is
    * missing/malformed are dropped — the `status==200` guard analog.
    */
  def buildCatalog(eptMeta: DataFrame, prefixCol: String = "prefix", bodyCol: String = "body"): DataFrame = {
    val parsed = parseEptMeta(withNameAndYear(eptMeta, prefixCol), bodyCol)
    parsed
      .filter(col("xmin").isNotNull && col("points").isNotNull)
      .select("filename", "region", "year", "xmin", "xmax", "ymin", "ymax", "points")
  }

  /** P3 — containment predicate: catalog row's box fully contains the query
    * box (`scripts/usgs_lidar.py:297-303`). Containment, NOT intersection —
    * deliberate reference semantics (SURVEY.md §2.10.2).
    */
  def containsBbox(q: Bbox): Column =
    col("xmin") <= q.minx && col("xmax") >= q.maxx &&
      col("ymin") <= q.miny && col("ymax") >= q.maxy

  /** `fetch_regions` (`scripts/usgs_lidar.py:279-310`): containment filter,
    * sort by year ascending with nulls LAST (pandas `sort_values` puts NaN
    * last — SURVEY.md §2.6 O1), project filename.
    */
  def fetchRegions(catalog: DataFrame, query: Bbox): DataFrame =
    catalog
      .filter(containsBbox(query))
      .orderBy(col("year").asc_nulls_last, col("filename"))
      .select("filename", "region", "year")

  /** J1 as a real join — many query boxes against the catalog in one pass.
    * The catalog side is broadcast; Catalyst plans a BroadcastNestedLoopJoin
    * for the theta (containment) predicate, so the big `queries` side never
    * shuffles. This is the scale path for batched spatial lookups.
    */
  def matchRegions(queries: DataFrame, catalog: DataFrame): DataFrame =
    queries.join(
      broadcast(catalog),
      catalog("xmin") <= queries("qminx") && catalog("xmax") >= queries("qmaxx") &&
        catalog("ymin") <= queries("qminy") && catalog("ymax") >= queries("qmaxy"))

  /** F9 — year rendering at the API boundary: float-style string ("2009.0"),
    * null -> "Year: not_specified" (`scripts/usgs_lidar.py:328-332`).
    */
  def yearSentinel(year: Column): Column =
    when(year.isNull, lit("Year: not_specified"))
      .otherwise(concat(year.cast("string"), lit(".0")))
}
