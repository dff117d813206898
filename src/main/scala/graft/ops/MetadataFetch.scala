package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S5 — executor-side per-resource metadata fetch, the distributed form of
  * the reference's catalog-build loop (`fetch_metadata`,
  * `scripts/usgs_lidar.py:245-276`): for each resource prefix, GET
  * `<base>/<prefix>ept.json` and parse it into the catalog schema.
  *
  * The reference does this as a sequential driver loop — one blocking HTTP
  * GET per row, 1,597 round trips, then an O(n^2) whole-file CSV rewrite per
  * row (K2). Here the prefix list is a Dataset and the fetch runs in
  * `mapPartitions` on the executors: parallelism = partition count, one
  * client per partition (not per row), and the downstream parse/write is the
  * single distributed [[CatalogOps.buildCatalog]] projection.
  *
  * The fetcher is pluggable ([[MetaFetcher]]) because this build runs in a
  * zero-egress sandbox: production wires [[MetadataFetch.http]], tests wire
  * a deterministic in-memory stub — the operator shape (partitioning, client
  * lifecycle, failure semantics) is identical either way. Failures map to
  * null bodies, which buildCatalog drops — the reference's `status != 200`
  * guard (`scripts/usgs_lidar.py:259-260`).
  *
  * 100 TB posture: fetch work scales horizontally with partitions; no
  * driver-side loop, no per-row client construction, no collect. Repartition
  * the prefix list to tune fan-out (e.g. 1,597 prefixes / 32 partitions =
  * ~50 sequential GETs per task).
  */
object MetadataFetch {

  /** A serializable fetch function: prefix -> body, None on any failure.
    * Implementations must be cheap to serialize; any heavyweight client
    * state belongs in a `@transient lazy val` so it is constructed once per
    * executor, after deserialization.
    */
  trait MetaFetcher extends Serializable {
    def fetch(prefix: String): Option[String]
  }

  /** Production fetcher over JDK 11+ java.net.http — GET
    * `<baseUrl>/<prefix>ept.json` (the reference's URL shape,
    * `scripts/usgs_lidar.py:253-257`: prefix already ends in '/').
    * The client is per-JVM-deserialization (`@transient lazy`), shared by
    * every partition the executor runs.
    */
  final class HttpMetaFetcher(baseUrl: String, timeoutMs: Long = 10000) extends MetaFetcher {
    @transient private lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    override def fetch(prefix: String): Option[String] = {
      try {
        val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/${prefix}ept.json"))
          .timeout(Duration.ofMillis(timeoutMs))
          .GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) Some(resp.body()) else None
      } catch {
        // Task kills arrive as thread interrupts — propagate them so the
        // partition stops instead of grinding through its remaining GETs
        // with the failure masked as a dropped row.
        case ie: InterruptedException => Thread.currentThread().interrupt(); throw ie
        case _: Exception => None // unreachable host / timeout -> dropped row
      }
    }
  }

  def http(baseUrl: String, timeoutMs: Long = 10000): MetaFetcher =
    new HttpMetaFetcher(baseUrl, timeoutMs)

  /** prefixes -> (prefix, body) rows; body null on fetch failure. Runs on
    * executors via mapPartitions, numPartitions controls fan-out.
    */
  def fetchBodies(
      prefixes: Dataset[String],
      fetcher: MetaFetcher,
      numPartitions: Option[Int] = None): DataFrame = {
    val spark: SparkSession = prefixes.sparkSession
    import spark.implicits._
    val parted = numPartitions.map(prefixes.repartition(_)).getOrElse(prefixes)
    parted
      .mapPartitions { it => it.map(p => (p, fetcher.fetch(p).orNull)) }
      .toDF("prefix", "body")
  }

  /** End-to-end S5: prefix list -> executor-side fetch -> catalog schema
    * (filename, region, year, xmin, xmax, ymin, ymax, points). Fetch
    * failures and malformed bodies are dropped by buildCatalog.
    */
  def fetchCatalog(
      prefixes: Dataset[String],
      fetcher: MetaFetcher,
      numPartitions: Option[Int] = None): DataFrame =
    CatalogOps.buildCatalog(fetchBodies(prefixes, fetcher, numPartitions))
}
