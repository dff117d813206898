package graft.ops

import graft.SparkTest
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** S5 executor-side metadata fetch: stubbed fetcher end-to-end into the
  * catalog schema (`fetch_metadata`, usgs_lidar.py:245-276).
  */
/** Deterministic in-memory stand-in for the HTTP client (zero-egress
  * sandbox) — same contract: body on 200, None on anything else. Top-level
  * so the closure ships without dragging the (non-serializable) suite along.
  */
private class StubFetcher(bodies: Map[String, String]) extends MetadataFetch.MetaFetcher {
  override def fetch(prefix: String): Option[String] = bodies.get(prefix)
}

class MetadataFetchSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private val bodies = Map(
    "AK_BrooksCamp_2012/" -> """{"bounds":[1.0,2.0,3.0,11.0,12.0,13.0],"points":42}""",
    "IA_FullState/" -> """{"bounds":[-5.5,-6.5,0.0,5.5,6.5,9.0],"points":7}""",
    "Bad_JSON_2020/" -> """<html>503</html>""" // fetched but unparseable
    // "Gone_2019/" absent -> fetch failure -> dropped
  )

  test("fetchCatalog: executor-side fetch into the catalog schema; failures dropped") {
    val prefixes = Seq(
      "AK_BrooksCamp_2012/", "IA_FullState/", "Bad_JSON_2020/", "Gone_2019/").toDS()
    val cat = MetadataFetch.fetchCatalog(prefixes, new StubFetcher(bodies), numPartitions = Some(3))
    cat.columns.toSeq shouldBe Seq(
      "filename", "region", "year", "xmin", "xmax", "ymin", "ymax", "points")
    cat.orderBy("filename").collect().toSeq shouldBe Seq(
      Row("AK_BrooksCamp_2012", "AK_BrooksCamp", 2012, 1.0, 11.0, 2.0, 12.0, 42L),
      Row("IA_FullState", "IA_FullState", null, -5.5, 5.5, -6.5, 6.5, 7L))
  }

  test("fetchBodies: failure rows surface as null bodies (status!=200 analog)") {
    val out = MetadataFetch.fetchBodies(Seq("IA_FullState/", "Gone_2019/").toDS(), new StubFetcher(bodies))
      .orderBy("prefix").collect().toSeq
    out shouldBe Seq(
      Row("Gone_2019/", null),
      Row("IA_FullState/", bodies("IA_FullState/")))
  }

  test("HttpMetaFetcher: PRODUCTION client against an in-JVM HTTP server — 200/404/500") {
    // com.sun.net.httpserver ships in the JDK, so the real fetch path
    // (request build, status guard, body decode, failure->None) runs with
    // zero egress: the server binds an ephemeral loopback port.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
      ex.close()
    }
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) =>
      ex.getRequestURI.getPath match {
        case "/AK_BrooksCamp_2012/ept.json" => respond(ex, 200, bodies("AK_BrooksCamp_2012/"))
        case "/IA_FullState/ept.json" => respond(ex, 200, bodies("IA_FullState/"))
        case "/Gone_2019/ept.json" => respond(ex, 404, "not found")
        case _ => respond(ex, 500, "boom")
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = MetadataFetch.http(base, timeoutMs = 5000)
      // non-200 statuses -> null bodies (the reference's status guard)
      val byPrefix = MetadataFetch.fetchBodies(
        Seq("AK_BrooksCamp_2012/", "Gone_2019/", "Err_2021/").toDS(), fetcher)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      byPrefix("AK_BrooksCamp_2012/") shouldBe bodies("AK_BrooksCamp_2012/")
      byPrefix("Gone_2019/") shouldBe null
      byPrefix("Err_2021/") shouldBe null
      // end to end through the distributed catalog build, executor-side
      val cat = MetadataFetch.fetchCatalog(
        Seq("AK_BrooksCamp_2012/", "IA_FullState/", "Gone_2019/", "Err_2021/").toDS(),
        fetcher, numPartitions = Some(2))
      cat.orderBy("filename").collect().toSeq shouldBe Seq(
        Row("AK_BrooksCamp_2012", "AK_BrooksCamp", 2012, 1.0, 11.0, 2.0, 12.0, 42L),
        Row("IA_FullState", "IA_FullState", null, -5.5, 5.5, -6.5, 6.5, 7L))
    } finally server.stop(0)
  }

  test("HttpMetaFetcher is serializable (ships to executors; client is transient)") {
    val f = MetadataFetch.http("http://localhost:1", timeoutMs = 50)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(f)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
      .asInstanceOf[MetadataFetch.MetaFetcher]
    // No listener on port 1: the contract is None on failure, not a throw.
    back.fetch("X_2020/") shouldBe None
  }
}
