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

  /** Positional n-gram hashes: one [[polyHash]] per token position, NOT
    * deduplicated — within-document repetition counts (the x79 dup-rate
    * semantics). Empty array for texts under n tokens. Shared by the
    * batch dup-ngram/novelty/winnowing queries and the streaming
    * dup-gram monitor so all hash the identical gram stream.
    *
    * PERFORMANCE: pass a MATERIALIZED token-array column (project
    * [[tokens]] into its own column first). Higher-order-function
    * lambdas evaluate interpreted, so a tokenizer expression captured in
    * the lambda body re-tokenizes the document on every element_at —
    * n+1 re-tokenizations per gram position (measured 14 s -> 1.5 s at
    * sf0.1 for the dup-rate query). A projection boundary makes `tk` an
    * attribute and each access O(1); CollapseProject will not re-inline
    * a non-cheap expression referenced many times.
    */
  def positionalGramHashesOfTokens(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => polyHash(concat_ws(" ", (0 until n).map(j => element_at(tk, i + lit(j))): _*))))
      .otherwise(array().cast("array<long>"))

  /** [[positionalGramHashesOfTokens]] over raw text — convenience for
    * one-shot use; prefer the token-column form in anything hot (see the
    * performance note above).
    */
  def positionalGramHashes(c: Column, n: Int): Column =
    positionalGramHashesOfTokens(tokens(c), n)

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

  // --- HTML / boilerplate main-text extraction (stage-0 of a web-corpus
  // pipeline: raw HTML -> the main text everything downstream consumes).
  // Deliberately regex-dialect-neutral (no lookaround, no backreferences,
  // inline (?i)/(?s) flags only) so the DuckDB oracle applies
  // byte-identical patterns; everything here is a pure per-row Column
  // expression — at 100 TB this is map work fused into the WARC/HTML scan,
  // with no shuffle anywhere.

  /** Non-content regions dropped wholesale before block splitting:
    * script and style elements (their text is code, not prose) and HTML
    * comments. Non-greedy so adjacent elements never merge.
    */
  val HtmlDropRes: Seq[String] = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  /** Block boundaries: closing block-level tags and <br>. Splitting on
    * CLOSERS (not openers) keeps each block's own markup inside the
    * block, so link-density is measured against the right text — and
    * makes unclosed tags degrade gracefully (a malformed block simply
    * merges with its successor; no parser state to corrupt).
    */
  val HtmlBlockRe = "(?i)</p>|</div>|</li>|</h[1-6]>|<br[^>]*>|</tr>|</td>|</title>"

  /** Any remaining tag (after the drop pass) becomes a space. */
  val HtmlTagRe = "<[^>]*>"

  /** Explicit whitespace class for the collapse pass — deliberately NOT
    * `\s`: Java's `\s` matches vertical tab (\x0B) while RE2/DuckDB's
    * does not, so a document containing a VT would collapse differently
    * and fingerprint-mismatch across engines. This class names the same
    * five ASCII whitespace chars in both dialects. (The `(?i)` in
    * [[HtmlBlockRe]] is safe despite Java-vs-RE2 case-folding dialect
    * differences: it only folds ASCII tag names.)
    */
  val WsClassRe = "[ \\t\\n\\r\\f\\x0B]+"

  /** The single-char form of [[WsClassRe]] (no quantifier) for building
    * derived patterns.
    */
  val WsClass = "[ \\t\\n\\r\\f\\x0B]"

  /** Byte-preserving segmentation: every char of a document falls in
    * exactly one maximal whitespace run or one maximal token run, so
    * `regexp_extract_all(text, SegmentRe)` concatenates back to the
    * original string byte-for-byte, and its non-whitespace members are
    * exactly [[tokens]] (pre-lowercase) in order. Same five-char class
    * both dialects, so the DuckDB oracle segments identically.
    */
  val SegmentRe = WsClassRe + "|[^ \\t\\n\\r\\f\\x0B]+"

  /** Anchor elements; group 1 is the link's inner markup. */
  val HtmlLinkRe = "(?is)<a[^>]*>(.*?)</a>"

  /** The entity set worth decoding without a full parser; `&amp;` LAST
    * so escaped markup (`&amp;lt;`) decodes exactly once and never
    * resurrects a strippable tag.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Remove script/style/comment regions. */
  def htmlDropNonContent(c: Column): Column =
    HtmlDropRes.foldLeft(c)((acc, re) => regexp_replace(acc, re, " "))

  /** Visible text of one block: strip tags FIRST (so escaped markup in
    * the text survives as content), then decode entities, then collapse
    * whitespace.
    */
  def htmlBlockText(b: Column): Column =
    trim(regexp_replace(
      HtmlEntities.foldLeft(regexp_replace(b, HtmlTagRe, " ")) {
        case (acc, (e, r)) => replace(acc, lit(e), lit(r))
      },
      WsClassRe, " "))

  /** Total visible characters inside the block's anchor elements — the
    * numerator of the link-density boilerplate heuristic.
    */
  def htmlLinkChars(b: Column): Column =
    aggregate(
      transform(regexp_extract_all(b, lit(HtmlLinkRe), lit(1)),
        a => length(htmlBlockText(a)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Per-block (text, link_chars) structs in document order. */
  def htmlBlocks(c: Column): Column =
    transform(split(htmlDropNonContent(c), HtmlBlockRe),
      b => struct(htmlBlockText(b).as("t"), htmlLinkChars(b).as("lc")))

  /** Boilerplate rule on a block struct: drop empty blocks and blocks
    * where linked text is more than half the visible text (nav bars,
    * footers, related-links lists). Integer arithmetic — no float
    * threshold edge for engines to disagree on.
    */
  def htmlKeepBlock(s: Column): Column =
    length(s("t")) > 0 && s("lc") * 2 <= length(s("t")).cast("long")

  /** Extracted main text: kept blocks joined with single spaces. */
  def htmlMainText(c: Column): Column =
    array_join(
      transform(filter(htmlBlocks(c), htmlKeepBlock _), s => s("t")), " ")

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
