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

  /** Rule set behind [[registrableDomain]]: the embedded real-format
    * PSL snapshot ([[PslSnapshot]]), parsed once. The production ~9k
    * entry publicsuffix.org file is a drop-in text swap via
    * [[Psl.parse]] — same parser, same lookup, same expression.
    */
  def pslRules: PslRules = Psl.default

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

  /** Registrable domain of a canonical host under the embedded PSL
    * snapshot: public suffix resolved per the publicsuffix.org
    * algorithm (exception rules prevail, else longest match, else the
    * implicit `*` default — so an unknown TLD still yields the last
    * two labels), plus one label. NULL when the host is itself a
    * public suffix. Codegen'd O(labels) hash probes per row
    * ([[graft.functions.UrlExprs]]) — no shuffle, no interpreted-row
    * boundary, the rule table rides the plan as one reference object.
    */
  def registrableDomain(host: Column): Column =
    graft.functions.UrlExprs.registrableDomain(host, pslRules)
}
