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

  /** J1 at catalog scale — the gridded (multi-level) containment join.
    *
    * [[matchRegions]]'s broadcast nested-loop is right for the reference's
    * 1,594-row catalog; it dies on a 10M-box catalog (O(catalog x queries)
    * pairs, catalog must fit in one broadcast). This form is an EQUI-join:
    *
    *  - each catalog box is assigned the power-of-two level `l` with
    *    `2^l >= max(width, height)`; at that level the box intersects at
    *    most 2 cells per axis, so it explodes into <= 4 (level, cx, cy)
    *    index rows — constant fan-out per box, any box size;
    *  - containment (box ⊇ query) implies the box covers the query's min
    *    corner, so each query probes exactly ONE cell per distinct level
    *    (the tiny distinct-level frame is broadcast — <= ~60 rows ever);
    *  - candidates equi-join on (level, cx, cy) — shuffle-partitioned on
    *    both sides, no broadcast of anything data-sized — then the exact
    *    4-way containment predicate filters false positives.
    *
    * Result is identical to the nested-loop form (the index is lossless for
    * containment), so correctness oracles stay plain theta-join SQL. Level
    * choice only affects performance, never the result — float noise in
    * `log2` near exact powers of two is harmless.
    */
  def matchRegionsIndexed(queries: DataFrame, catalog: DataFrame): DataFrame = {
    val span = greatest(col("xmax") - col("xmin"), col("ymax") - col("ymin"), lit(1.0))
    val cat = catalog
      .withColumn("lvl", ceil(log(2.0, span)).cast("int"))
      .withColumn("cs", pow(lit(2.0), col("lvl")))
      .withColumn("cx", explode(sequence(
        floor(col("xmin") / col("cs")).cast("long"), floor(col("xmax") / col("cs")).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor(col("ymin") / col("cs")).cast("long"), floor(col("ymax") / col("cs")).cast("long"))))
      .drop("cs")
    val levels = cat.select("lvl").distinct()
    val probes = queries.crossJoin(broadcast(levels))
      .withColumn("cs", pow(lit(2.0), col("lvl")))
      .withColumn("cx", floor(col("qminx") / col("cs")).cast("long"))
      .withColumn("cy", floor(col("qminy") / col("cs")).cast("long"))
      .drop("cs")
    probes.join(cat, Seq("lvl", "cx", "cy"))
      .filter(
        col("xmin") <= col("qminx") && col("xmax") >= col("qmaxx") &&
          col("ymin") <= col("qminy") && col("ymax") >= col("qmaxy"))
      .drop("lvl", "cx", "cy")
  }

  /** F9 — year rendering at the API boundary: float-style string ("2009.0"),
    * null -> "Year: not_specified" (`scripts/usgs_lidar.py:328-332`).
    */
  def yearSentinel(year: Column): Column =
    when(year.isNull, lit("Year: not_specified"))
      .otherwise(concat(year.cast("string"), lit(".0")))
}
