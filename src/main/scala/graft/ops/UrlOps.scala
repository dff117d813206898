package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — the shared
  * per-row algebra of batch x73 (canonical-URL dedup), batch x94 (the
  * domain reputation gate), and the streaming domain-gate monitor
  * ([[graft.streaming.DocStreams.domainGateMonitor]]). Pure Column
  * work (regex extract/replace, array filter/sort — all codegen'd
  * built-ins, RE2-safe patterns), so the DuckDB oracles mirror it
  * byte for byte.
  *
  * Reference behavior modeled: CommonCrawl-style ingest canonicalization
  * and the RefinedWeb/FineWeb stage-0 domain gate.
  */
object UrlOps {

  /** Tracking parameters stripped by canonicalization. */
  val TrackRe = "^utm_"

  /** Multi-label public suffixes for [[registrableDomain]] — a
    * deliberate SUBSET of the public suffix list (publicsuffix.org);
    * the real ~9k-entry list loads as the same broadcast lookup with
    * longest-suffix-wins, four entries keep the oracle a literal while
    * exercising the 3-label path.
    */
  val MultiSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp", "org.uk")

  /** Canonical form of a raw URL: lowercased scheme+host, `www.` and
    * default ports stripped (443/https, 80/http), fragment dropped,
    * trailing path slashes trimmed (root stays `/`), `utm_*` params
    * removed, surviving params byte-sorted.
    *
    * @return (canon_url, host) — host already lowercased, www-stripped
    */
  def canonCols(url: Column): (Column, Column) = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/:?#]+)", 1)), "^www\\.", "")
    val port = regexp_extract(url, "^[A-Za-z]+://[^/:?#]+:([0-9]+)", 1)
    val portCanon = when(
      port === "" || (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]*(/[^?#]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qs = array_join(array_sort(
      filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
        p => p =!= "" && not(p.rlike(TrackRe)))), "&")
    val canon = concat(scheme, lit("://"), host, portCanon, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
    (canon, host)
  }

  /** Registrable domain of a canonical host: the last two labels, or
    * three when the last two are a multi-label public suffix. Hosts
    * must have >= 2 labels (1-label hosts would need a null-vs-empty
    * concat convention Spark and DuckDB don't share).
    */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val suffix2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    when(suffix2.isin(MultiSuffixes: _*) && size(parts) >= 3,
      concat_ws(".",
        element_at(parts, -3), element_at(parts, -2), element_at(parts, -1)))
      .otherwise(suffix2)
  }
}
