package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, and document fingerprinting.
  *
  * Everything here is a pure per-row Column expression built from
  * codegen'd built-ins (split/regexp/higher-order functions) — no UDFs, no
  * shuffles, no state. At 100 TB these run as map-side work fused into the
  * scan by whole-stage codegen, and each formula is mirrored exactly in the
  * DuckDB oracle SQL (deterministic integer/double arithmetic only).
  */
object TextOps {

  /** Modulus for the polynomial rolling hash (fits BIGINT: acc < 1e9+7,
    * acc*31+255 < 2^63).
    */
  val HashP = 1000000007L

  /** Deterministic polynomial rolling hash over the string's characters:
    * fold(acc * 31 + ascii(char)) mod P. Used as the document fingerprint
    * and as the base hash for shingle MinHash — chosen over murmur/xxhash
    * because it is trivially reproducible in any engine (the oracle
    * recomputes it in SQL). Evaluated by the native
    * [[graft.functions.PolyHash]] expression (one imperative pass per row);
    * [[polyHashComposed]] is the built-ins-only twin kept for
    * cross-validation in specs.
    */
  def polyHash(c: Column): Column = graft.functions.TextExprs.polyHash(c)

  /** HOF twin of [[polyHash]] (interpreted, ~20 ms/doc — spec use only). */
  def polyHashComposed(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % HashP)

  /** Lower-cased whitespace tokens with empties removed. */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  /** Whitespace token count (0 for blank text). */
  def wsTokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** BPE-ish token count: letter runs, single digits, and single
    * non-alphanumeric symbols — a proxy for subword tokenizer load.
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast("long")

  /** Punctuation character count. */
  val PunctPattern = "[.,!?;:]"
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PunctPattern), lit(0))).cast("long")

  /** PII scrubbing patterns — deliberately RE2-compatible (no \b, no
    * lookaround) so the DuckDB oracle applies the byte-identical regex.
    * Shared by the batch x18 query and the streaming curation stage.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** Redact emails then phones to typed placeholders (map-only). */
  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe)).cast("long")
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe)).cast("long")

  /** Per-language stopword patterns for the n-gram language-ID heuristic. */
  val StopwordPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|and|of|to|in|is)\\b",
    "es" -> "\\b(el|la|de|que|y|en|los)\\b",
    "de" -> "\\b(der|die|und|das|ist|von|mit)\\b",
    "fr" -> "\\b(le|la|les|de|et|un|que)\\b")

  def stopHits(c: Column, pattern: String): Column =
    size(regexp_extract_all(lower(c), lit(pattern), lit(0))).cast("long")

  /** Heuristic language ID: argmax of stopword hits, ties resolved in
    * declaration order (en > es > de > fr).
    */
  def langGuess(c: Column): Column = {
    val hits = StopwordPatterns.map { case (lang, p) => lang -> stopHits(c, p) }
    val Seq(en, es, de, fr) = hits.map(_._2)
    when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Document quality score in [0, 1]: rewards reasonable length, stopword
    * density (real prose has function words), and low punctuation noise.
    * Pure double arithmetic, identical operation order in the oracle.
    */
  def quality(c: Column): Column = {
    val nTok = wsTokenCount(c).cast("double")
    val stops = stopHits(c, StopwordPatterns.head._2).cast("double")
    val punct = punctCount(c).cast("double")
    round(
      least(nTok / 100.0, lit(1.0)) * 0.5 +
        (stops / (nTok + 1.0)) * 0.3 +
        (lit(1.0) - punct / (nTok + 1.0)) * 0.2,
      6)
  }
}
