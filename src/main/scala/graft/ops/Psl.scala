package graft.ops

/** Parsed Public Suffix List rules + the spec's resolution algorithm
  * (publicsuffix.org/list/ "Formal algorithm"):
  *
  *  1. consider every rule matching the host (a rule matches when its
  *     labels equal the host's right-most labels; `*` matches exactly
  *     one label);
  *  2. an exception rule (`!…`) prevails over everything;
  *  3. otherwise the matching rule with the MOST labels prevails;
  *  4. if nothing matches, the implicit default rule `*` prevails
  *     (the last label is the public suffix);
  *  5. the public suffix is the prevailing rule's labels (for an
  *     exception rule, the rule minus its left-most label); the
  *     registrable domain is the public suffix plus one more label —
  *     or NULL when the host IS a public suffix.
  *
  * Storage is three hash sets keyed by suffix text (wildcard rules key
  * their fixed tail: `*.ck` -> "ck"), so resolution is
  * O(min(#labels, maxLabels)) hash probes per host — a bounded
  * driver-built lookup every executor receives once (Catalyst ships it
  * as an expression reference object; at ~9k entries that is a few
  * hundred KB, the broadcast-dimension regime). Resolution lives in
  * [[PslCode]] as ONE implementation shared by the interpreted and
  * generated paths of [[graft.functions.UrlExprs.registrableDomain]].
  *
  * Reference behavior modeled: the reference pipeline has no URL
  * algebra — this serves the RefinedWeb/FineWeb-style stage-0 domain gate
  * (x94) and its streaming twin, which the round-14 audit required to
  * ride a REAL-SHAPE list rather than an asserted 4-entry subset.
  */
final case class PslRules(
    normal: java.util.HashSet[String],
    wildcard: java.util.HashSet[String],
    exception: java.util.HashSet[String],
    maxLabels: Int) extends Serializable {

  /** (name, kind) pairs for oracle-side mirrors: kind 0 = normal,
    * 1 = wildcard (name is the fixed tail), 2 = exception (name is the
    * rule minus `!`). Sorted for deterministic SQL generation.
    */
  def rows: Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    (normal.asScala.toSeq.sorted.map(_ -> 0) ++
      wildcard.asScala.toSeq.sorted.map(_ -> 1) ++
      exception.asScala.toSeq.sorted.map(_ -> 2))
  }
}

object Psl {

  /** Parse PSL-format text: drop comments (`// …`) and blanks, take
    * each line's first whitespace-delimited token, classify by prefix
    * (`!` exception, `*.` wildcard, else normal), lowercase.
    */
  def parse(text: String): PslRules = {
    val normal = new java.util.HashSet[String]()
    val wildcard = new java.util.HashSet[String]()
    val exception = new java.util.HashSet[String]()
    var maxLabels = 1
    text.linesIterator.foreach { line0 =>
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val tok = line.split("\\s+", 2)(0).toLowerCase(java.util.Locale.ROOT)
        // Label count of the RULE (wildcard's * counts as a label, so
        // `*.ck` is a 2-label rule; its stored key "ck" is checked one
        // label short — see PslCode.publicSuffixLabels).
        val labs = tok.count(_ == '.') + 1
        if (tok.startsWith("!")) exception.add(tok.substring(1))
        else if (tok.startsWith("*.")) wildcard.add(tok.substring(2))
        else normal.add(tok)
        if (labs > maxLabels) maxLabels = labs
      }
    }
    PslRules(normal, wildcard, exception, maxLabels)
  }

  /** The embedded snapshot, parsed once per JVM. Swapping in the full
    * publicsuffix.org file is `Psl.parse(<file text>)` — nothing else
    * changes.
    */
  lazy val default: PslRules = parse(PslSnapshot.text)
}

/** One shared resolution implementation for interpreted eval AND
  * generated code (the TextExprCode static-forwarder discipline): the
  * generated Java calls these directly, so the label loop can never
  * drift between paths.
  */
object PslCode {

  /** Number of labels in `parts`' public suffix under `rules`. */
  def publicSuffixLabels(parts: Array[String], rules: PslRules): Int = {
    val n = parts.length
    var best = 1 // the implicit default rule `*`
    var exc = -1
    var suffix: String = null
    var k = 1
    // A wildcard rule with L-1 fixed labels is keyed by its tail and
    // matched at k = L-1, yielding L; exception rules have at most
    // maxLabels labels. So probing k <= maxLabels covers every rule.
    val kMax = math.min(n, rules.maxLabels)
    while (k <= kMax) {
      suffix = if (k == 1) parts(n - 1) else parts(n - k) + "." + suffix
      if (rules.exception.contains(suffix)) exc = k
      if (k > best && rules.normal.contains(suffix)) best = k
      if (k + 1 > best && n >= k + 1 && rules.wildcard.contains(suffix)) best = k + 1
      k += 1
    }
    if (exc >= 0) exc - 1 else best
  }

  /** Registrable domain of a host, or null when the host is itself a
    * public suffix, empty, or malformed. The UTF8String boundary form
    * the Catalyst expression calls.
    *
    * Canonicalizes here — not at the SQL boundary — so every caller of
    * `registrable_domain` gets the same contract: the host is
    * lowercased (PSL rules are stored lowercase, so 'EXAMPLE.CO.UK'
    * must not fall through to the implicit `*` default), one trailing
    * dot (the FQDN root marker) strips, and a host with any EMPTY
    * label ('.com', 'a..b', '.') is malformed and resolves to null
    * rather than a nonsense 'com.'-style answer.
    */
  def registrable(
      host: org.apache.spark.unsafe.types.UTF8String,
      rules: PslRules): org.apache.spark.unsafe.types.UTF8String = {
    val h0 = host.toString
    if (h0.isEmpty) return null
    val h1 =
      if (h0.charAt(h0.length - 1) == '.') h0.substring(0, h0.length - 1)
      else h0
    if (h1.isEmpty) return null
    val h = h1.toLowerCase(java.util.Locale.ROOT)
    val parts = h.split("\\.", -1)
    var pi = 0
    while (pi < parts.length) {
      if (parts(pi).isEmpty) return null
      pi += 1
    }
    val ps = publicSuffixLabels(parts, rules)
    if (parts.length < ps + 1) null
    else {
      val sb = new java.lang.StringBuilder()
      var i = parts.length - ps - 1
      while (i < parts.length) {
        if (sb.length > 0) sb.append('.')
        sb.append(parts(i))
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
    }
  }
}
