package graft

import scala.collection.immutable.ListMap

import graft.ops.{AnnModels, Checkpoints, CorpusMix, Dedup, GraphOps, Ranks, Similarity, Skew, TextOps, TimeSeries, UrlOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** LLM-training-data pipeline operators (SURVEY.md §7.7 extension surface):
  * text analysis, dedup family (exact / n-gram Jaccard / MinHash+LSH /
  * SimHash), and embedding similarity search — each as an oracle-checked
  * query over the driver fixture tables.
  *
  * Near-dup queries plant duplicates in-query (UNION ALL of a mutated copy
  * with shifted ids): the synthetic corpus has no natural near-dups (max
  * pairwise Jaccard ~0.03), and planting makes the detection path
  * observable while keeping both engines' inputs identical.
  */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Planted-duplicate document corpus: ids < 120, every 3rd doc copied
    * with id+100000 and a mutated tail.
    */
  private val PlantTail = " planted near duplicate tail marker"
  private def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 120).select(col("doc_id"), col("text"))
    base.union(
      base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), concat(col("text"), lit(PlantTail)).as("text")))
  }
  private val PlantedDocsSql =
    s"""base AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
       |corpus AS (SELECT doc_id, text FROM base
       |  UNION ALL SELECT doc_id + 100000, text || '$PlantTail' FROM base WHERE doc_id % 3 = 0)""".stripMargin

  /** Shared oracle CTE: whitespace tokens and distinct 3-gram shingles. */
  private val ShinglesSql =
    """tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t FROM corpus),
      |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
      |  THEN list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |  ELSE []::VARCHAR[] END AS s FROM tk)""".stripMargin

  /** Oracle polynomial rolling hash over a string expression (mirrors
    * TextOps.polyHash).
    */
  private def polySql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), c -> ascii(c)::BIGINT)), (a, x) -> (a*31 + x) % ${TextOps.HashP})"

  /** 31^k mod HashP for k = 0..255 as a DuckDB list literal — the power
    * table for token-level gram hashing ([[fastGramCtesSql]]).
    */
  private lazy val PwListSql: String =
    Iterator.iterate(1L)(v => v * 31 % TextOps.HashP).take(256)
      .mkString("[", ", ", "]")

  /** 31^length(tok) mod HashP: table lookup for tokens under 256 chars
    * (all of them, in practice), with an exact per-char fold fallback so
    * an oversized token can never silently index past the table (DuckDB
    * returns NULL there, which would corrupt every downstream hash).
    */
  private def pwSql(tok: String): String =
    s"CAST(CASE WHEN length($tok) < 256 THEN ($PwListSql)[length($tok) + 1] " +
      s"ELSE list_reduce(list_prepend(1::BIGINT, list_transform(range(length($tok)), x -> 31::BIGINT)), (a, x) -> (a * x) % ${TextOps.HashP}) END AS BIGINT)"

  /** The n-gram hash at 1-based token position `$i`, combined from
    * PER-TOKEN hashes instead of re-folding the concatenated gram text:
    * hash(x || ' ' || y) = ((hash(x)*31 + 32) * 31^|y| + hash(y)) mod P
    * (' ' is codepoint 32), applied n-1 times. Equal to
    * polySql(gram text) by the polynomial-hash composition law —
    * verified exhaustively against the per-char fold on the fixture
    * corpus (25,165 positions, 0 mismatches). Every intermediate fits
    * int64: (P-1)*31+32 < 2^35 and (P-1)^2 < 2^60.
    */
  private def gramHashSql(hs: String, pws: String, i: String, n: Int): String =
    (1 until n).foldLeft(s"$hs[$i]")((acc, j) =>
      s"((($acc * 31 + 32) % ${TextOps.HashP}) * $pws[$i + $j] + $hs[$i + $j]) % ${TextOps.HashP}")

  /** Positional n-gram hashes of `$src`(id, text) via token-level
    * combination — the oracle mirror of
    * [[graft.ops.TextOps.positionalGramHashesOfTokens]] that hashes each
    * character ONCE per document instead of once per gram position (the
    * per-char list_reduce over gram TEXT was the gram family's
    * certified-scale bottleneck: the oracle, not the engine). Emits
    * `${pfx}gh`(id, i, gh) with i 0-based, ordered within id by i.
    */
  private def fastGramCtesSql(src: String, id: String, pfx: String, n: Int): String =
    s"""${pfx}tk AS (SELECT $id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM $src),
       |${pfx}th AS (SELECT $id, list_transform(t, tok -> ${polySql("tok")}) AS hs,
       |  list_transform(t, tok -> ${pwSql("tok")}) AS pws FROM ${pfx}tk),
       |${pfx}gh AS (SELECT $id, i0 - 1 AS i, ${gramHashSql("hs", "pws", "i0", n)} AS gh
       | FROM (SELECT $id, hs, pws, unnest(range(1, len(hs) - ${n - 2})) AS i0 FROM ${pfx}th WHERE len(hs) >= $n))""".stripMargin

  /** Winnowing selection over `${pfx}gh`(id, i, gh): per-id lead window
    * of width w, argmin with the rightmost-tie CASE — emits
    * `${pfx}sel`(id, pos, gh), one row per selected (possibly repeated)
    * position. Generated from w like the gram concat is from n.
    */
  private def winnowSelCtesSql(id: String, pfx: String, w: Int): String =
    s"""${pfx}led AS (SELECT $id, i, gh AS gh0,
       |  ${(1 until w).map(j => s"lead(gh, $j) OVER (PARTITION BY $id ORDER BY i) AS gh$j").mkString(",\n       |  ")} FROM ${pfx}gh),
       |${pfx}sel AS (SELECT $id,
       |  i + CASE ${(w - 1 to 1 by -1).map(j => s"WHEN gh$j = m THEN $j").mkString(" ")} ELSE 0 END AS pos,
       |  m AS gh
       | FROM (SELECT *, least(${(0 until w).map(j => s"gh$j").mkString(", ")}) AS m FROM ${pfx}led WHERE gh${w - 1} IS NOT NULL))""".stripMargin

  /** Shared x95/x96 oracle base: the engine's [[decontFrames]] as CTEs
    * (bb/tr/vb/mu0/mu/bench) — one definition so the two oracles cannot
    * desync on the split/plants.
    */
  private lazy val decontBaseCtesSql: String =
    s"""bb AS MATERIALIZED (SELECT doc_id, text, ${polySql("text")} % 100 AS bucket FROM documents),
       |tr AS (SELECT doc_id, text FROM bb WHERE bucket < 80),
       |vb AS (SELECT doc_id + 200000 AS doc_id, text, 'verbatim' AS class FROM bb WHERE bucket < 80 AND doc_id % 13 = 0),
       |mu0 AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM bb WHERE bucket < 80 AND doc_id % 11 = 0),
       |mu AS (SELECT doc_id + 400000 AS doc_id,
       |  array_to_string(list_transform(range(1, len(t) + 1),
       |    i -> CASE WHEN (i - 1) % $MutEvery = 0 THEN 'zzmut' || CAST(i AS VARCHAR) ELSE t[i] END), ' ') AS text,
       |  'mutated' AS class FROM mu0),
       |bench AS MATERIALIZED (SELECT doc_id, text, 'natural' AS class FROM bb WHERE bucket >= 90
       | UNION ALL SELECT doc_id, text, class FROM vb
       | UNION ALL SELECT doc_id, text, class FROM mu)""".stripMargin

  /** Shared x98/x100/x101 oracle sweep (the mirror of
    * [[decontTrainSpans]]): train + bench winnow fingerprints, the
    * bench fingerprint SET, matched train positions, gaps-and-islands
    * merge — emits `sp$pfx`(doc_id, s, e). One generator so the three
    * scrub-family oracles can never desync on the sweep.
    */
  private def scrubSpanCtesSql(pfx: String): String =
    s"""${fastGramCtesSql("tr", "doc_id", s"t$pfx", DupNgramN)},
       |${winnowSelCtesSql("doc_id", s"t$pfx", WinnowW)},
       |${fastGramCtesSql("bench", "doc_id", s"b$pfx", DupNgramN)},
       |${winnowSelCtesSql("doc_id", s"b$pfx", WinnowW)},
       |bfp$pfx AS (SELECT DISTINCT gh FROM b${pfx}sel),
       |mt$pfx AS (SELECT DISTINCT t.doc_id, t.pos
       | FROM (SELECT DISTINCT doc_id, pos, gh FROM t${pfx}sel) t JOIN bfp$pfx b ON b.gh = t.gh),
       |i$pfx AS (SELECT doc_id, pos,
       |  SUM(CASE WHEN prev IS NOT NULL AND pos - prev > $SpanMergeGap THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS island
       | FROM (SELECT *, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM mt$pfx)),
       |sp$pfx AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS s,
       |  CAST(max(pos) + ${DupNgramN - 1} AS BIGINT) AS e
       | FROM i$pfx GROUP BY doc_id, island HAVING count(*) >= $SpanMinFp)""".stripMargin

  /** Byte-preserving segment view of the IMPLICATED train docs (the
    * oracle mirror of [[graft.ops.Dedup.segments]] after the left_semi
    * prune): `imp$pfx`(doc_id, text) the implicated slice,
    * `sg$pfx`(doc_id, si, seg, is_tok, tcnt, coff) its whitespace/token
    * runs with running token count and char offset. Patterns embed
    * [[TextOps.SegmentRe]]/[[TextOps.WsClass]] — the same five-char
    * class in Java and RE2 — so both engines segment identically.
    */
  private def segCtesSql(pfx: String): String =
    s"""imp$pfx AS (SELECT t.doc_id, t.text
       | FROM tr t JOIN (SELECT DISTINCT doc_id FROM sp$pfx) d ON d.doc_id = t.doc_id),
       |seg$pfx AS (SELECT doc_id, CAST(u.si AS BIGINT) AS si, u.seg FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
       |    i -> struct_pack(si := i - 1, seg := l[i]))) AS u
       |  FROM (SELECT doc_id, regexp_extract_all(text, '${TextOps.SegmentRe}') AS l FROM imp$pfx))),
       |sg$pfx AS (SELECT doc_id, si, seg,
       |  CASE WHEN NOT regexp_matches(seg, '^${TextOps.WsClass}') THEN 1 ELSE 0 END AS is_tok,
       |  SUM(CASE WHEN NOT regexp_matches(seg, '^${TextOps.WsClass}') THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY si) AS tcnt,
       |  SUM(length(seg)) OVER (PARTITION BY doc_id ORDER BY si) - length(seg) AS coff
       | FROM seg$pfx)""".stripMargin

  /** DuckDB mirror of Public-Suffix-List resolution over `$src`'s
    * DISTINCT hosts — emits `${pfx}dom`(host, domain) where domain is
    * the registrable domain (NULL when the host IS a public suffix).
    * The rule rows are GENERATED from [[graft.ops.Psl.default]] (name +
    * kind 0 normal / 1 wildcard-tail / 2 exception), so the engine's
    * codegen'd lookup ([[graft.functions.UrlExprs]]) and this mirror
    * resolve the identical rule set by construction — the UrlOps
    * tracking-regex aliasing discipline applied to the whole list.
    * Resolution: candidate suffixes (the host's last 1..maxLabels
    * labels) equi-join the rule table; exception prevails (minus its
    * left-most label), else most labels (wildcard tail k matches as
    * k + 1 when a label precedes it), else the implicit `*` default.
    * Hosts canonicalize EXACTLY as [[graft.ops.Psl.registrable]] does
    * (ASCII lowercase, one trailing FQDN dot stripped, any empty label
    * -> NULL domain) so the two sides agree on non-canonical input,
    * not just on well-formed hosts.
    */
  private def pslDomainCtesSql(src: String, pfx: String): String = {
    val rules = graft.ops.Psl.default
    val vals = rules.rows.map { case (n, t) => s"('$n', $t)" }.mkString(", ")
    s"""${pfx}h0 AS (SELECT host,
       |    lower(CASE WHEN host LIKE '%.' THEN host[1:len(host) - 1] ELSE host END) AS ch
       |  FROM (SELECT DISTINCT host FROM $src)),
       |${pfx}h AS (SELECT host, sp, len(sp) AS nl,
       |    CASE WHEN length(ch) = 0 OR list_contains(sp, '') THEN 0 ELSE 1 END AS ok
       |  FROM (SELECT host, ch, string_split(ch, '.') AS sp FROM ${pfx}h0)),
       |${pfx}r(name, typ) AS (SELECT * FROM (VALUES $vals)),
       |${pfx}c AS (SELECT host, nl, k, array_to_string(sp[nl - k + 1:nl], '.') AS suffix
       |  FROM (SELECT host, sp, nl, unnest(range(1, least(nl, ${rules.maxLabels}) + 1)) AS k FROM ${pfx}h WHERE ok = 1)),
       |${pfx}m AS (SELECT c.host,
       |    max(CASE WHEN r.typ = 2 THEN c.k END) AS exc,
       |    max(CASE WHEN r.typ = 0 THEN c.k WHEN r.typ = 1 AND c.nl >= c.k + 1 THEN c.k + 1 END) AS best
       |  FROM ${pfx}c c JOIN ${pfx}r r ON r.name = c.suffix GROUP BY c.host),
       |${pfx}dom AS (SELECT host,
       |    CASE WHEN ok = 1 AND nl >= ps + 1 THEN array_to_string(sp[nl - ps:nl], '.') END AS domain
       |  FROM (SELECT h.host, h.sp, h.nl, h.ok,
       |      CASE WHEN m.exc IS NOT NULL THEN m.exc - 1 ELSE coalesce(m.best, 1) END AS ps
       |    FROM ${pfx}h h LEFT JOIN ${pfx}m m ON m.host = h.host))""".stripMargin
  }

  /** DuckDB mirror of [[TextOps.htmlBlockText]] over expression `e`:
    * strip tags, decode entities (same order, &amp; last), collapse
    * whitespace, trim — byte-identical patterns AND semantics: the
    * collapse uses [[TextOps.WsClassRe]], the explicit class that means
    * the same five chars in Java and RE2 (`\s` does not — Java's
    * matches \x0B, RE2's doesn't).
    */
  private def htmlTxtSql(e: String): String =
    "trim(regexp_replace(" +
      "replace(replace(replace(replace(replace(replace(" +
      s"regexp_replace($e, '<[^>]*>', ' ', 'g'), " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), " +
      s"'&nbsp;', ' '), '&amp;', '&'), '${TextOps.WsClassRe}', ' ', 'g'))"

  /** DuckDB mirror of [[TextOps.htmlLinkChars]]. */
  private def htmlLcSql(e: String): String =
    s"coalesce(list_sum(list_transform(regexp_extract_all($e, '(?is)<a[^>]*>(.*?)</a>', 1), " +
      s"a -> CAST(length(${htmlTxtSql("a")}) AS BIGINT))), 0)"

  /** DuckDB mirror of [[TextOps.htmlBlocks]] (drop pass applied by the
    * caller): per-block (t, lc) structs in document order.
    */
  private def htmlBlocksSql(e: String): String =
    s"list_transform(string_split_regex($e, '${TextOps.HtmlBlockRe}'), " +
      s"b -> struct_pack(t := ${htmlTxtSql("b")}, lc := ${htmlLcSql("b")}))"

  // --- queries -------------------------------------------------------------

  private def x01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      TextOps.wsTokenCount(col("text")).as("ws_tokens"),
      TextOps.bpeTokenCount(col("text")).as("bpe_tokens"),
      TextOps.punctCount(col("text")).as("n_punct"),
      TextOps.stopHits(col("text"), TextOps.StopwordPatterns.head._2).as("stop_en"),
      TextOps.polyHash(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  private def x02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      TextOps.langGuess(col("text")).as("lang_guess"),
      TextOps.quality(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  private def x03(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = base.union(
      base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.exactDupGroups(corpus, "text", "doc_id").orderBy(col("content_hash"))
  }

  private def x04(s: SparkSession, dir: String): DataFrame = {
    // Scale shape: explode shingles -> equi self-join on the shingle ->
    // count shared shingles per pair -> join back set sizes. No quadratic
    // nested-loop join; the shuffle key is the shingle, the pair space is
    // only pairs that actually share content. (Pairs sharing nothing have
    // jac = 0 and can never pass the threshold, so results are identical
    // to the all-pairs form.)
    // The shingle table is tiny (pair queries cap the corpus) but its HOF
    // expression is interpreted and feeds three DAG branches — cut it so
    // shingling runs once, not per branch (a materialized cut, unlike a
    // .cache(), leaves no block leak behind for direct library callers).
    val sh = Checkpoints.cut(
      plantedDocs(s, dir).select(col("doc_id"), Dedup.shingles(col("text")).as("s")))
    val sizes = sh.select(col("doc_id"), size(col("s")).as("sz"))
    val ex0 = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
    // Hot-key guard for the pair join: drop shingles whose document
    // frequency exceeds the cap before self-joining. At 100 TB one viral
    // 3-gram otherwise becomes a single shuffle key generating O(df^2)
    // pairs. The groupBy count is skew-safe (map-side partial agg); the cap
    // (Dedup.ShingleDfCap = 1000) sits far above the fixture's max df
    // (~40, the planted-tail shingles), so fixture results are unchanged —
    // pinned in DedupSpec.
    val rare = ex0.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= Dedup.ShingleDfCap).select(col("shingle"))
    val ex = ex0.join(rare, "shingle")
    val inter = ex.as("a")
      .join(ex.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    val withSizes = inter
      .join(broadcast(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("sz", "sz1")), "id1")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("sz", "sz2")), "id2")
    val interD = col("inter").cast("double")
    val union = (col("sz1") + col("sz2")).cast("double") - interD
    withSizes
      .select(col("id1"), col("id2"), (interD / union).as("jac"))
      .filter(col("jac") >= 0.5)
      .select(col("id1"), col("id2"), col("jac"))
      .orderBy(col("id1"), col("id2"))
  }

  private def x05(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("hs"))
    docs.select(col("doc_id") +: (0 until Dedup.MinHashK).map(i =>
      Dedup.minhashComponent(col("hs"), i).as(s"mh$i")): _*)
      .orderBy(col("doc_id"))
  }

  private def x06(s: SparkSession, dir: String): DataFrame = {
    // Cut for the same multi-branch reason as x04 (sig computation,
    // banding, and the two verify joins all read the shingle sets).
    val sh = Checkpoints.cut(
      plantedDocs(s, dir).select(col("doc_id"), Dedup.shingles(col("text")).as("s")))
    val sigs = sh.select(
      (col("doc_id") +: col("s") +:
        (0 until Dedup.MinHashK).map(i =>
          Dedup.minhashComponent(transform(col("s"), x => TextOps.polyHash(x)), i).as(s"mh$i"))): _*)
    val cands = Dedup.lshCandidates(sigs.drop("s"), "doc_id")
    val withSets = cands
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("s", "s1"), "id1")
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("s", "s2"), "id2")
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val union = (size(col("s1")) + size(col("s2"))).cast("double") - inter
    withSets
      .select(col("id1"), col("id2"), (inter / union).as("jac"))
      .filter(col("jac") >= 0.5)
      .select(col("id1"), col("id2"), col("jac"))
      .orderBy(col("id1"), col("id2"))
  }

  private def x07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  /** Embedding dimension of the driver fixture (64-dim float vectors). */
  private[graft] val EmbDim = 64

  private def x08(s: SparkSession, dir: String): DataFrame = {
    // Raw float arrays straight into the static-dot path: no HOF conversion
    // anywhere, the whole cosine stays in whole-stage codegen.
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    // widen=false (round-21 A/B): 10 queries, one pass — the widen
    // exchange measured 0.67x here.
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 5, dim = EmbDim,
        widen = false)
      .select(col("qid"), col("vec_id"), col("cos"), col("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Embedding near-dup at scale: LSH-candidate generation (two independent
    * hyperplane tables, unioned for recall) -> exact-cosine verify.
    * Candidates come from grouping on the (table, bucket) band key — one
    * shuffle, never an all-pairs BroadcastNestedLoopJoin (pinned in
    * PlanSpec); near-identical vectors (cos >= 0.99) share every bit with
    * high probability and exact copies always collide in both tables. Both
    * engines apply the identical deterministic bucketing AND the identical
    * hot-band cap, so the candidate set — and hence the result — is
    * hash-checkable despite being "approximate".
    */
  private def x09(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val corpus = e.union(
      e.filter(col("vec_id") % 5 === 0).select((col("vec_id") + 100000).as("vec_id"), col("v")))
    val sig = corpus.select(
      col("vec_id"), col("v"),
      Similarity.norm(col("v"), EmbDim).as("nrm"),
      Similarity.lshSignature(col("v"), LshBits, EmbDim).as("b0"),
      Similarity.lshSignature(col("v"), LshBits, EmbDim, planeOffset = LshBits).as("b1"))
    val banded = sig.select(
      col("vec_id"), col("v"), col("nrm"),
      explode(array(
        concat(lit("0:"), col("b0").cast("string")),
        concat(lit("1:"), col("b1").cast("string")))).as("band"))
    // Single-pass pair generation (all 32 plane dot products per row run
    // once, not twice as in the banded self-join form) with the standard
    // hot-band cap; the oracle mirrors the cap with HAVING count <= cap.
    Similarity.bucketMemberPairs(
      banded, "band", struct(col("vec_id"), col("v"), col("nrm")), Dedup.ShingleDfCap)
      .filter(col("m1.vec_id") < col("m2.vec_id"))
      .select(
        col("m1.vec_id").as("id1"), col("m2.vec_id").as("id2"),
        round(
          Similarity.cosineStatic(col("m1.v"), col("m2.v"), col("m1.nrm"), col("m2.nrm"), EmbDim),
          6).as("cos"))
      .filter(col("cos") >= 0.99)
      .distinct()
      .orderBy(col("id1"), col("id2"))
  }

  /** LSH bits for the ANN query (2^8 = 256 buckets). */
  private val LshBits = 8

  /** Approximate-nearest-neighbour via random-hyperplane LSH — the scale
    * path for corpus-vs-corpus similarity (shuffle on bucket keys instead
    * of an all-pairs join). Deterministic planes let the DuckDB oracle
    * reproduce the exact bucket assignment, so even the "approximate"
    * operator is hash-checked: both engines must agree on every candidate
    * pair and cosine.
    */
  private def x11(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val corpus = e.union(
      e.filter(col("vec_id") % 5 === 0).select((col("vec_id") + 100000).as("vec_id"), col("v")))
    val sig = corpus.select(
      col("vec_id"), col("v"),
      Similarity.norm(col("v"), EmbDim).as("nrm"),
      Similarity.lshSignature(col("v"), LshBits, EmbDim).as("bucket"))
    // Single pass over the signature projection (16 plane dot products per
    // row) via the shared pair generator, hot buckets capped; the oracle
    // mirrors the cap with HAVING count <= cap. Same pairs, same cosine.
    Similarity.bucketMemberPairs(
      sig, "bucket", struct(col("vec_id"), col("v"), col("nrm")), Dedup.ShingleDfCap)
      .filter(col("m1.vec_id") < col("m2.vec_id"))
      .select(
        col("m1.vec_id").as("id1"), col("m2.vec_id").as("id2"),
        round(
          Similarity.cosineStatic(col("m1.v"), col("m2.v"), col("m1.nrm"), col("m2.nrm"), EmbDim),
          6).as("cos"))
      .filter(col("cos") >= 0.9)
      .orderBy(col("id1"), col("id2"))
  }

  private def x10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), TextOps.quality(col("text")).as("q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("q").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("avg_quality"))
      .orderBy(col("source"))

  /** Deterministic train/val/test split by content hash — the reproducible
    * alternative to random sampling for dataset curation: the same document
    * lands in the same split on any engine, any run, any cluster size.
    */
  private def x12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"), col("n_chars"),
        (TextOps.polyHash(col("text")) % 100).as("bucket"))
      .select(
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"),
        col("doc_id"), col("n_chars"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("split"))

  /** k-means training iterations for the IVF index (fixed + deterministic
    * so both engines train identical centroids — see
    * [[Similarity.kmeansCentroids]]).
    */
  private[graft] val KmIters = 2

  /** IVF cell count (seed = vec_id < 16). */
  private[graft] val IvfCells = 16

  /** IVF-ANN with TRAINED centroids: deterministic k-means (seeded from
    * vec_id < 16, [[KmIters]] iterations, decimal-quantized means) then
    * cell assignment + per-query top-3 within the probed cell. The oracle
    * unrolls the identical training loop in SQL, so even the trained
    * index is hash-checked end to end.
    *
    * Train/serve split: centroids come from the [[AnnModels]] store —
    * trained ONCE per dataset fingerprint and persisted; this query (and
    * x25, which shares the index) serves from the 16-row model table.
    * Determinism makes the persisted model bit-identical to an in-query
    * retrain, so the oracle is unchanged.
    */
  private def x13(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val assigned = Similarity.ivfAssign(e, cents, EmbDim)
    // Assign the (tiny) query set in its own pass rather than filtering the
    // full corpus assignment: per-row assignment is deterministic, so the
    // cells match — and the corpus-sized `assigned` frame is then evaluated
    // exactly once (as the probe side) instead of twice.
    val queriesDf = Similarity.ivfAssign(e.filter(col("vec_id") < 5), cents, EmbDim)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell_id").as("qcell"))
    val cands = assigned.join(broadcast(queriesDf),
      col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
    val scored = cands.select(
      col("qid"), col("vec_id"),
      round(
        Similarity.cosineStatic(col("qv"), col("v"), Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim), EmbDim),
        6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Per-dimension embedding statistics (posexplode -> per-index agg) —
    * the embedding-QA sweep: dead dimensions, scale drift, outliers.
    * Shuffle key is the dimension index (64 groups regardless of corpus
    * size); map-side combine collapses each partition to 64 partials.
    */
  private def x14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("pos"), col("v").cast("double").as("v"))
      .groupBy(col("pos"))
      .agg(
        (sum(col("v").cast("decimal(18,8)")).cast("double") / count(lit(1))).as("mean_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        count(lit(1)).as("n"))
      .orderBy(col("pos"))

  /** Pivot: per-user event-type counts as columns (conditional aggregation
    * — the shape `groupBy().pivot()` compiles to, spelled explicitly so
    * the oracle matches column-for-column).
    */
  private def x15(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === types.head, 1L).otherwise(0L)).as(s"n_${types.head}"),
        types.tail.map(t0 =>
          sum(when(col("event_type") === t0, 1L).otherwise(0L)).as(s"n_$t0")): _*)
      .orderBy(col("user_id"))
  }

  /** 64-bit SimHash signatures (the production fingerprint width) — native
    * one-pass salted-composition expression; same corpus slice as x07 so
    * the two widths are directly comparable.
    */
  private def x16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("simhash64"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling: per-stratum keep-rates applied via
    * a content-hash threshold, not an RNG — the sample is reproducible on
    * any engine, any partitioning, any run (the property x12's split has,
    * extended to per-stratum rates). Map-only; the sample decision never
    * shuffles.
    */
  private def x17(s: SparkSession, dir: String): DataFrame = {
    val rate = (length(col("source")) % 3 + 1) * 10 // 10/20/30% by stratum
    t(s, dir, "documents")
      .filter(TextOps.polyHash(col("text")) % 100 < rate)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("kept_chars"))
      .orderBy(col("source"))
  }

  /** PII patterns live in [[TextOps]] (shared with streaming curation). */
  private val EmailRe = TextOps.EmailRe
  private val PhoneRe = TextOps.PhoneRe

  /** PII scrub: redact emails/phones to typed placeholders + per-doc hit
    * counts. Map-only (the 100 TB shape: scan -> regex -> write); the
    * corpus has no natural PII, so deterministic contact tails are planted
    * on every 7th doc in-query, and the SCRUBBED text is verified by
    * fingerprint (hashing avoids shipping whole texts through the compare
    * while still proving the replacement happened byte-for-byte).
    */
  private def x18(s: SparkSession, dir: String): DataFrame = {
    val planted = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .withColumn("t2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")))
    planted.select(
      col("doc_id"),
      TextOps.emailCount(col("t2")).as("n_emails"),
      TextOps.phoneCount(col("t2")).as("n_phones"),
      TextOps.polyHash(TextOps.scrubPii(col("t2"))).as("scrubbed_fp"))
      .orderBy(col("doc_id"))
  }

  /** Repetition / boilerplate metrics: distinct-token ratio and top-token
    * share per document — the curation signal for template spam and
    * low-entropy boilerplate. Distributed shape: explode -> (doc, token)
    * partial counts (map-side combine) -> per-doc roll-up; the shuffle key
    * is (doc_id, token), so no per-doc in-memory token map ever forms.
    * Docs with no tokens produce no row (both engines drop them in the
    * explode/unnest).
    */
  private def x19(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_freq"))
      .select(
        col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_distinct").cast("long").as("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6).as("distinct_ratio"),
        round(col("top_freq").cast("double") / col("n_tokens").cast("double"), 6).as("top_token_share"))
      .orderBy(col("doc_id"))
  }

  /** Context-window budget for x20 packing (BPE-ish tokens per bin). */
  private val PackBudget = 512

  /** Sequential context-window packing: docs in id order fill fixed token
    * bins per source shard — the standard pretraining concat-and-chunk,
    * with each doc assigned to the bin its START offset lands in. Window
    * cumsum partitioned BY SOURCE: packing parallelizes across shards (a
    * single global order would serialize the window at 100 TB), which is
    * how production packers shard anyway.
    */
  private def x20(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), TextOps.bpeTokenCount(col("text")).as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("tok")).cast("double") / lit(PackBudget.toDouble)).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** Int8 scalar quantization + quantized top-k: per-dimension min/max
    * (64-group aggregate, same shuffle shape as x14) broadcast into a
    * map-only encode to 0..254 codes — the 4x memory/bandwidth reduction
    * that makes billion-vector ANN shelves fit — then brute-force top-3 in
    * QUANTIZED space for the x08 query set. Codes are exact integers and
    * the rank orders by the rounded cosine, so even this lossy operator is
    * hash-checked end to end: both engines must agree on every code, every
    * quantized cosine, every rank. The reassembly groupBy shuffles codes
    * (a quarter of the float bytes); array order is pinned by sorting
    * (pos, code) structs, never collect_list order.
    */
  private def x21(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ex = e.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
    val stats = ex.groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val codes = ex.join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos"),
        when(col("mx") > col("mn"),
          round((col("x") - col("mn")) / (col("mx") - col("mn")) * 254.0).cast("int"))
          .otherwise(lit(0)).as("code"))
    val qvecs = codes.groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("code")))),
        s0 => s0("code").cast("double")).as("qvec"))
    val queriesQ = qvecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qvec").as("quv"))
    val scored = qvecs.join(broadcast(queriesQ), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(
          Similarity.cosineStatic(col("quv"), col("qvec"),
            Similarity.norm(col("quv"), EmbDim), Similarity.norm(col("qvec"), EmbDim), EmbDim),
          6).as("qcos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Unigram language-model quality score (the CCNet-style LM filter,
    * simplified to unigrams so it is exactly oracle-checkable): two-pass —
    * (1) corpus unigram counts (shuffle key = token, map-side combine),
    * (2) score each doc by mean log-probability of its tokens under that
    * distribution (join back on token, decimal-quantized mean so the
    * result is summation-order independent). Low scores = out-of-
    * distribution/garbage docs; the token join is the only data-sized
    * shuffle and the 1-row total broadcasts.
    */
  private def x22(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("tc"))
    val total = vocab.agg(sum(col("tc")).as("tt"))
    tok.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        log(col("tc").cast("double") / col("tt").cast("double")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        // un-rounded like x49: the decimal-exact mean is bit-identical
        // across engines; rounding it lands on exact .5 ties where their
        // rounding modes disagree (hit for real by x49 at sf0.1)
        graft.util.Exact.davg(col("lp"), 6).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary extraction: top-100 tokens by term frequency with document
    * frequency — the tokenizer-training precursor. Two-level aggregation
    * (token, doc) -> token keeps the distinct-doc count shuffle-safe;
    * deterministic tie-break on the token string.
    */
  private def x23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("tok"))
      .agg(sum(col("c")).cast("long").as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(100)

  /** IVF-ANN with nprobe=2: identical trained index to x13, but each query
    * probes its TWO nearest cells — the standard recall/cost knob
    * ([[Similarity.ivfProbe]]) made hash-checkable: the oracle ranks the
    * same centroids and unions the same two cells, so both engines must
    * agree on every probed candidate and rank. Candidate volume doubles;
    * recall strictly improves for neighbors across a Voronoi boundary.
    */
  private def x25(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val assigned = Similarity.ivfAssign(e, cents, EmbDim)
    val queriesDf = Similarity.ivfProbe(e.filter(col("vec_id") < 5), cents, EmbDim, nprobe = 2)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell_id").as("qcell"))
    val cands = assigned.join(broadcast(queriesDf),
      col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
    val scored = cands.select(
      col("qid"), col("vec_id"),
      round(
        Similarity.cosineStatic(col("qv"), col("v"), Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim), EmbDim),
        6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored
      // a candidate can arrive via both probed cells only if it tied cells;
      // corpus assignment is unique, so rows are already distinct
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Eval decontamination: which test-split documents share 5-gram content
    * with the train split (the benchmark-leakage sweep every training run
    * needs). Deterministic hash split (x12's buckets), train side reduced
    * to a DISTINCT shingle set (shuffle key = shingle, map-side combine),
    * test side exploded and equi-joined on the shingle — no document ever
    * compares against another document directly, so the pair space is
    * shared-content only. Contamination is PLANTED (train docs re-added to
    * the test split at +200000) since the hash split makes natural 5-gram
    * overlap in word salad essentially zero; planted docs report
    * containment 1.0.
    */
  private def x24(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(
      col("doc_id"), col("text"), (TextOps.polyHash(col("text")) % 100).as("bucket"))
    val trainSh = base.filter(col("bucket") < 80)
      .select(explode(Dedup.shingles(col("text"), 5)).as("shingle")).distinct()
    val planted = base.filter(col("bucket") < 80 && col("doc_id") % 13 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    val test = base.filter(col("bucket") >= 90).select(col("doc_id"), col("text"))
      .union(planted)
    val testSh = test.select(col("doc_id"), Dedup.shingles(col("text"), 5).as("s"))
      .filter(size(col("s")) > 0)
    testSh
      .select(col("doc_id"), size(col("s")).as("n_shingles"), explode(col("s")).as("shingle"))
      .join(trainSh, "shingle")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_hits"))
      .select(
        col("doc_id"), col("n_shingles").cast("long").as("n_shingles"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 6).as("containment"))
      .orderBy(col("doc_id"))
  }

  /** 60-word tails for the x26 chain corpus, with the BASE doc id embedded
    * in every tail word. Per-doc-unique tails matter: a shared tail would
    * weld different docs' variants together (short word-salad docs become
    * tail-dominated, so e.g. docs d+200000 and e+200000 would share ~60 of
    * ~60+w shingles), producing components whose diameter exceeds the
    * oracle's unrolled rounds. With unique tails each component is exactly
    * one doc's variant set, diameter <= 2.
    *
    * Appending T1 adds ~60 distinct shingles, so for a base doc with w
    * distinct shingles: Jaccard(v1, v1+T1) ~ w/(w+60) and
    * Jaccard(v1, v1+T1+T2) ~ w/(w+120) — mid-length docs (60 <= w < 120)
    * link v1~v2 and v2~v3 but NOT v1~v3, a genuine transitive chain only
    * connected components can merge.
    */
  private def chainTail(prefix: String): org.apache.spark.sql.Column =
    concat((0 until 60).flatMap(i =>
      Seq(lit(s" $prefix${i}x"), col("doc_id").cast("string"))): _*)
  private def chainTailSql(prefix: String): String =
    // variadic concat, not chained || — DuckDB's binder recurses per ||
    // operator and rejects expressions deeper than 128
    "concat(" + (0 until 60).map(i => s"' $prefix${i}x', doc_id").mkString(", ") + ")"

  /** End-to-end dedup pipeline (the flagship composite a training run
    * actually executes) as ONE oracle-checked query:
    * exact dedup -> LSH candidate pairs -> Jaccard verification ->
    * connected components ([[Dedup.duplicateClusters]] label propagation)
    * -> per-cluster keep-id + surviving-corpus count.
    *
    * The corpus plants exact copies (+100000) and a CHAIN of near-dup
    * variants (+200000 = text+T1, +300000 = text+T1+T2): for mid-length
    * docs v1~v2 and v2~v3 pass the 0.5 Jaccard bar while v1~v3 fails it,
    * so only label propagation merges the component. The DuckDB oracle
    * unrolls FOUR propagation rounds in SQL (fixture component diameter
    * <= 3, and a converged propagation round is a no-op, so extra rounds
    * are safe) — the same unrolled-iteration trick as the x13 k-means
    * oracle. Scale posture: every stage is the already-verified x03/x06
    * shape (content-hash groups, band-key equi-joins, per-round id-key
    * shuffles); nothing quadratic, nothing data-sized on the driver.
    *
    * Output: one row per duplicate cluster (keep_id = component-min id,
    * n = member count) plus a keep_id = -1 summary row carrying the
    * surviving document count (total - removed).
    */
  /** The engineered x26/x66 dedup corpus: 120 base docs plus three
    * planted copy families (verbatim, one appended chain tail, two) so
    * exact AND near-dup edges both occur, with chained tails exercising
    * multi-hop cluster transitivity.
    */
  private def dedupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 120).select(col("doc_id"), col("text"))
    val third = base.filter(col("doc_id") % 3 === 0)
    // NOT widened (round-20): Width.atLeastCores here was tried and
    // measured WORSE on the 11-query chain family (+12 % normalized,
    // stash A/B) — the chain's cost is its ~40-job orchestration floor,
    // and a 32-partition corpus cut makes every tiny downstream stage pay
    // 28 extra tasks of scheduling for map work that fits in 4.
    base
      .union(third.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .union(third.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), chainTail("chainalpha")).as("text")))
      .union(third.select((col("doc_id") + 300000).as("doc_id"),
        concat(col("text"), chainTail("chainalpha"), chainTail("chainbeta")).as("text")))
  }

  /** Stages 1-3 of the x26 pipeline, shared with x66: exact-hash edges ∪
    * LSH-candidate + Jaccard-verified near-dup edges → connected
    * components. Returns (id, label) for every doc that HAS a duplicate;
    * singletons are absent (callers coalesce to self).
    */
  private def dupLabels(corpus: DataFrame): DataFrame = {
    // Shingle sets feed signature computation AND pair verification — cut
    // (interpreted HOF expression, multiple DAG branches; see x04/x06).
    val sh = Checkpoints.cut(
      corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("s")))
    // Stage 1 — exact dedup: edges (group-min id) ~ member, shuffling the
    // 128-bit content hash, never the text.
    val exactEdges = corpus
      .select(col("doc_id"), Dedup.contentKey(col("text")).as("h"))
      .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") =!= col("m"))
      .select(col("m").as("id1"), col("doc_id").as("id2"))
    // Stage 2 — LSH candidates + Jaccard >= 0.5 verification (x06 shape).
    val sigs = sh.select(
      (col("doc_id") +:
        (0 until Dedup.MinHashK).map(i =>
          Dedup.minhashComponent(transform(col("s"), x => TextOps.polyHash(x)), i).as(s"mh$i"))): _*)
    val cands = Dedup.lshCandidates(sigs, "doc_id")
    val withSets = cands
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("s", "s1"), "id1")
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("s", "s2"), "id2")
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val union = (size(col("s1")) + size(col("s2"))).cast("double") - inter
    val nearPairs = withSets
      .filter((inter / union) >= 0.5)
      .select(col("id1"), col("id2"))
    // Stage 3 — connected components over the union of both edge kinds.
    Dedup.duplicateClusters(exactEdges.union(nearPairs))
  }

  private def x26(s: SparkSession, dir: String): DataFrame = {
    // Cut like every other dedupCorpus caller (x66/x76/x77/x83/x92):
    // three consumers (shingle sets, exact-hash edges, the total count)
    // would otherwise each replay the 4-branch corpus build — the family's
    // round-13 partition-sensitivity lesson applied to its flagship.
    val corpus = Checkpoints.cut(dedupCorpus(s, dir))
    val labels = dupLabels(corpus)
    // Stage 4 — keep-list + surviving-corpus stats. The cluster histogram
    // feeds TWO consumers (the served union branch and the removed-count
    // aggregate), so it is cut too — the x83 fix's exact shape; the frame
    // is cluster-count-sized.
    val clusters = Checkpoints.cut(
      labels.groupBy(col("label").as("keep_id")).agg(count(lit(1)).as("n")))
    val total = corpus.agg(count(lit(1)).as("tot"))
    val removed = clusters.agg(coalesce(sum(col("n") - 1), lit(0L)).as("removed"))
    val summary = total.crossJoin(removed)
      .select(lit(-1L).as("keep_id"), (col("tot") - col("removed")).as("n"))
    clusters.union(summary).orderBy(col("keep_id"))
  }

  /** Salted two-phase aggregation ([[graft.ops.Skew.saltedSumCount]])
    * routed through the oracle gate: semantically a plain
    * `groupBy(l_returnflag).agg(sum, count)`, executed with the hot-key
    * spreading path (content-hash salt + per-(key, salt) partials +
    * per-key combine) so the skew mitigation itself is hash-verified
    * against the unsalted SQL. Values are cast to DECIMAL per row before
    * summing, so the two-phase sum is bit-identical to the one-phase one
    * under any partitioning — the property that makes the salted plan
    * substitutable for the plain one at 100 TB.
    */
  private def x27(s: SparkSession, dir: String): DataFrame =
    Skew.saltedSumCount(
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q"), col("l_orderkey")),
      col("l_returnflag"), col("q"), salts = 8, discriminator = col("l_orderkey"))
      .select(col("k"), col("sum_v").cast("double").as("sum_v"), col("count_v"))
      .orderBy(col("k"))

  /** PQ geometry: 64-dim embeddings as m=4 subspaces of 16 dims, k=8
    * codewords per subspace (3-bit codes; 256 bytes -> 4 codes).
    */
  private val PqM = 4
  private val PqSubDim = EmbDim / PqM
  private val PqK = 8

  /** Product-quantization ANN: train per-subspace codebooks
    * ([[Similarity.pqCodebooks]], deterministic k-means), encode the
    * corpus to m codes per vector, then answer queries by ASYMMETRIC
    * distance — the uncompressed query scored against each vector's
    * reconstruction (codeword concatenation). The oracle retrains the
    * identical codebooks by unrolling the k-means iterations per subspace
    * in SQL (the x13 trick, four times), so codes, reconstructions, and
    * the final top-k ranking are all hash-checked.
    *
    * Scale posture: the codebook frame is m*k = 32 rows (broadcast);
    * encoding is one broadcast pass + a rank-1 window (WindowGroupLimit);
    * search scans CODES (4 B/vector, not 256 B) plus a broadcast of the
    * query set — at billion-vector scale the 64x scan-size reduction is
    * the point of PQ, and nothing here shuffles the corpus.
    */
  private def x28(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = AnnModels.pqCodebooks(s, dir, e, PqM, PqSubDim, PqK, KmIters)
    val codes = Similarity.pqEncode(e, cb, PqSubDim)
    val recon = Similarity.pqReconstruct(codes, cb)
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = recon.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("vec_id"),
        round(
          Similarity.cosineStatic(
            col("qv"), col("rv"),
            Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("rv"), EmbDim), EmbDim),
          6).as("acos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Temperature-based source mixing (the multilingual/pretraining data-
    * mixing rule w_s proportional to n_s^alpha, alpha = 0.5): per-source
    * sampling rates that up-weight small sources toward uniform, applied
    * as a deterministic content-hash threshold. All rate arithmetic is
    * INTEGER (floor(sqrt(n)*1000) weights, integer-division permyriad
    * rates) so both engines compute identical thresholds — no float
    * summation-order hazard between the weight total and the rates.
    * Scale posture: rates derive from a per-source count frame (tiny) and
    * broadcast back; the keep decision is map-only on the corpus.
    */
  private def x29(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val weighted = counts.withColumn(
      "w", floor(sqrt(col("n_docs").cast("double")) * 1000.0).cast("long"))
    val total = weighted.agg(sum(col("w")).as("tw"), sum(col("n_docs")).as("tn"))
    // Overall target ~40% of the corpus, split across sources by w/n:
    // rate_pm = floor(tn*4000*w / (n*tw)) per-10000, capped at keep-all.
    val rates = weighted.crossJoin(broadcast(total))
      .withColumn("rate_pm", least(expr("(tn * 4000 * w) div (n_docs * tw)"), lit(10000L)))
      .select(col("source"), col("n_docs"), col("w"), col("rate_pm"))
    val kept = docs.join(broadcast(rates.select(col("source"), col("rate_pm"))), "source")
      .filter(pmod(TextOps.polyHash(col("text")), lit(10000L)) < col("rate_pm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).cast("long").as("kept_chars"))
    rates
      .join(kept, Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("w"), col("rate_pm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** RAG-style sliding-window chunking: split each document into
    * fixed-width token windows (ChunkTokens) advancing by ChunkStride
    * (so consecutive chunks overlap by ChunkTokens - ChunkStride tokens),
    * and fingerprint each chunk. Pure map-side work — tokenize, generate
    * the start offsets with `sequence`, `posexplode`, `slice` — so at
    * 100 TB chunking fuses into the scan with zero shuffles; the only
    * exchange in the plan is the presentation sort. The fingerprint (the
    * same polynomial hash the dedup family uses) is what downstream
    * chunk-level dedup/retrieval would key on.
    */
  private val ChunkTokens = 64
  private val ChunkStride = 48
  private def x30(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
    docs
      .select(
        col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), col("n") - 1, lit(ChunkStride))).as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("tk"), col("start") + 1, lit(ChunkTokens)).as("ck"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("ck")).cast("long").as("n_tokens"),
        TextOps.polyHash(concat_ws(" ", col("ck"))).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** BM25 keyword retrieval: score every document against a fixed query
    * and return the top 20. Classic sparse retrieval — the lexical half of
    * a retrieval pipeline (the dense half is x08/x11/x13).
    *
    * Scale shape: tokens are filtered to the query terms BEFORE the
    * (doc, term) tf shuffle, so the exchange carries only matching tokens
    * — O(matches), not O(corpus tokens). Document frequency and the
    * (n_docs, total_dl) frame are tiny and broadcast. Per-term
    * contributions are summed through a fixed-scale decimal
    * ([[graft.util.Exact.dsum]]) so the score is partition-order
    * independent; ties in the top-20 break on doc_id.
    */
  private val Bm25Terms = Seq("join", "vector", "stream")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  /** BM25 scoring shared by x31 (lexical top-k) and x105 (the lexical
    * arm of hybrid fusion): per-doc (n_terms, score) over the fixed
    * query terms — unordered; callers rank/limit.
    */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    val dl = docs.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    val tf = docs.select(col("doc_id"), explode(col("tk")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + 0.5) / (col("df").cast("double") + 0.5))
    val num = col("tf").cast("double") * lit(Bm25K1 + 1.0)
    val den = col("tf").cast("double") +
      lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl)
    tf.join(dl, "doc_id")
      .join(broadcast(dft), "tok")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), (idf * (num / den)).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_terms"),
        round(graft.util.Exact.dsum(col("contrib"), 8), 6).as("score"))
  }

  private def x31(s: SparkSession, dir: String): DataFrame =
    bm25Scores(s, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** CDC merge / upsert: apply a change batch (updates + inserts, derived
    * deterministically from the snapshot so both engines see identical
    * inputs) to the orders snapshot with MERGE semantics — one full-outer
    * equi-join on the key, row disposition (updated / inserted / carried)
    * from side markers, `coalesce` picks the surviving column values.
    *
    * Scale shape: the single shuffle is the join on o_orderkey; with the
    * snapshot bucketed by key (BucketedLayoutSpec's layout) only the
    * change batch moves. This is the merge-on-read compaction pattern every
    * incremental 100 TB corpus needs. Output = all changed rows plus a
    * deterministic 2% sample of carried rows, so row-level merge results
    * are hash-checked without dumping the full snapshot.
    */
  private def x32(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), lit(1).as("in_base"))
    val changed = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("R").as("u_status"), (col("o_totalprice") * 1.1).as("u_price"))
    // inserted keys are OUT-OF-BAND (negative mirror of the source key):
    // any positive offset eventually collides with real keys as the table
    // grows — the 10x probe caught +1e8 landing exactly on the next
    // replica's key range, which made the merge input carry two update
    // rows for one key and the output order non-total
    val inserted = base.filter(col("o_orderkey") % 97 === 0)
      .select((-col("o_orderkey") - 1).as("o_orderkey"), lit("N").as("u_status"), col("o_totalprice").as("u_price"))
    val updates = changed.union(inserted).withColumn("in_upd", lit(1))
    base.join(updates, Seq("o_orderkey"), "full_outer")
      .select(
        col("o_orderkey"),
        when(col("in_upd").isNotNull && col("in_base").isNotNull, lit("updated"))
          .when(col("in_upd").isNotNull, lit("inserted"))
          .otherwise(lit("carried")).as("disposition"),
        coalesce(col("u_status"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("u_price"), col("o_totalprice")).as("o_totalprice"))
      .filter(col("disposition") =!= "carried" || col("o_orderkey") % 50 === 0)
      .orderBy(col("o_orderkey"))
  }

  /** Heavy hitters via the native Misra-Gries aggregate
    * ([[graft.functions.HeavyHitters]]): top-20 suppliers by lineitem
    * frequency, with (lo, hi) count bounds from the sketch. One pass over
    * the fact table, m-bounded partials merged executor-side
    * (ObjectHashAggregate) — at 100 TB the "hottest keys" question costs
    * one scan plus O(partitions * m) longs of merge traffic, never a
    * key-space shuffle. HhCapacity (16384) exceeds the supplier count
    * through genuine TPC-H sf1 (10,000 suppliers) as well as the GenScale
    * probe fixtures, so the sketch runs in its exact regime and the oracle
    * is plain GROUP BY counts (the determinism contract documented on the
    * expression); the lossy regime's error bounds are spec-pinned instead
    * (SketchSpec).
    */
  private val HhCapacity = 16384
  private def x33(s: SparkSession, dir: String): DataFrame = {
    val hh = t(s, dir, "lineitem")
      .agg(graft.functions.SketchExprs.heavyHitters(col("l_suppkey").cast("long"), HhCapacity).as("hh"))
    hh.select(explode(col("hh")).as("e"))
      .select(col("e.key").as("l_suppkey"), col("e.lo").as("cnt_lo"), col("e.hi").as("cnt_hi"))
      .orderBy(col("cnt_lo").desc, col("l_suppkey"))
      .limit(20)
  }

  /** Maximal-marginal-relevance (MMR) diversified re-rank, batch shape:
    * for EACH of three query vectors, greedily select 5 of its exact
    * cosine top-20 candidates, each round maximizing lambda * rel(q, d) -
    * (1 - lambda) * max sim(d, selected) — the relevance-vs-redundancy
    * re-rank between retrieval and a context window.
    *
    * Scale shape: candidate generation is the x08 broadcast top-k path;
    * re-ranking is [[Similarity.mmrSelectGrouped]] — one shuffle on qid,
    * one native [[graft.functions.MmrSelect]] pass per query group, no
    * per-query driver coordination (a million queries re-rank the same
    * way). Every similarity is rounded to 6 dp BEFORE comparisons, so the
    * greedy argmax (ties to the lower vec_id) is engine-independent and
    * the DuckDB oracle unrolls the 5 rounds as qid-partitioned CTEs.
    */
  private val MmrLambda = 0.7
  private val MmrK = 5
  private val MmrQueries = 3
  private def x34(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    // widen=false (round-21 A/B): 3 queries, one pass — widen measured
    // 0.80x here.
    val cands = Similarity
      .bruteForceTopK(e, e.filter(col("vec_id") < MmrQueries), 20, dim = EmbDim,
        widen = false)
      .select(col("qid"), col("vec_id"), col("cos").as("rel"))
      .join(e, "vec_id")
    Similarity.mmrSelectGrouped(cands, MmrK, MmrLambda)
  }

  /** Token-budget corpus selection: keep the highest-quality documents
    * until a token budget is exhausted (a doc is kept iff the tokens
    * BEFORE it in (quality desc, doc_id) order stay under the budget) —
    * the curriculum/budget cut every training-data build ends with.
    *
    * The naive form is a corpus-wide cumulative-sum window — a single
    * partition sorting 100 TB. This runs the q20 histogram-refine shape
    * instead: a per-quality-bucket token histogram (hash agg), a
    * cumulative over the <= 1001-row bucket frame (bounded, broadcast
    * back), bucket-level pruning of everything past the budget, and a
    * per-bucket window (partitions are ~n/1000) only for survivors. Same
    * keep-set and same global cumulative values as the naive form — the
    * DuckDB oracle IS the naive global window.
    */
  private val SelBudget = 15000L
  private val SelBuckets = 1000
  private def x35(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"),
      TextOps.quality(col("text")).as("quality"),
      TextOps.bpeTokenCount(col("text")).as("n_tok"))
    val bucketed = docs.withColumn("bucket", floor(col("quality") * SelBuckets).cast("long"))
    val bstats = bucketed.groupBy(col("bucket")).agg(sum(col("n_tok")).as("bs"))
    // bounded frame (<= SelBuckets+1 rows): a single-partition window is
    // safe here. Partition on `bucket pmod 1` (constant 0, but
    // non-foldable — a literal partition key gets optimizer-stripped and
    // the warning returns) so WindowExec's no-partition warning stays a
    // real signal for genuinely unbounded windows. coalesce pins the
    // non-null assumption (a null key would fork the "constant"
    // partition and corrupt the cumulative sum).
    val wb = Window.partitionBy(pmod(coalesce(col("bucket"), lit(0L)), lit(1L)))
      .orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = bstats
      .withColumn("prev_cum", coalesce(sum(col("bs")).over(wb), lit(0L)))
      .select(col("bucket"), col("prev_cum"))
    val ww = Window.partitionBy(col("bucket"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(prev), "bucket")
      .filter(col("prev_cum") < SelBudget) // prune hopeless buckets before any sort
      .withColumn("cum", (col("prev_cum") + sum(col("n_tok")).over(ww)).cast("long"))
      .filter(col("cum") - col("n_tok") < SelBudget)
      .select(col("doc_id"), col("quality"), col("n_tok"), col("cum"))
      .orderBy(col("quality").desc, col("doc_id"))
  }

  /** Per-user z-score anomaly detection over the event stream: each
    * user's mean/stddev from decimal-exact sum and sum-of-squares (one
    * shuffle on user_id, partition-order independent), broadcast-joined
    * back onto events to flag |z| > 3, then per-user anomaly counts.
    * Two passes over events, both shuffling only (user_id, aggregates) —
    * the standard fleet-telemetry / data-quality outlier sweep at scale.
    * All z values round to 6 dp before comparison so the flag threshold
    * is engine-independent.
    */
  private def x36(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("value"))
    val stats = ev.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      graft.util.Exact.dsum(col("value"), 6).as("sv"),
      graft.util.Exact.dsum(col("value") * col("value"), 6).as("svv"))
    val meanC = col("sv") / col("n").cast("double")
    val varC = (col("svv") - (col("sv") * col("sv")) / col("n").cast("double")) /
      (col("n").cast("double") - 1.0)
    val st = stats
      // n > 1 explicitly: at n = 1 varC divides by zero, and whether the
      // user survives "sd > 0" would then hinge on engine div-by-zero
      // semantics (Spark non-ANSI yields NULL, IEEE engines inf/NaN)
      .filter(col("n") > 1)
      .select(col("user_id"), col("n"), meanC.as("mean"), sqrt(varC).as("sd"))
      .filter(col("sd") > 0)
    ev.join(st, "user_id")
      .select(col("user_id"), col("n"),
        round(abs((col("value") - col("mean")) / col("sd")), 6).as("az"))
      .groupBy(col("user_id"), col("n"))
      .agg(
        sum(when(col("az") > 3.0, lit(1L)).otherwise(lit(0L))).cast("long").as("n_anom"),
        max(col("az")).as("max_abs_z"))
      .orderBy(col("user_id"))
  }

  /** Prequential (streaming-order) anomaly scoring: each event's z-score
    * is computed against the moments of the events BEFORE it (per user,
    * (ts, event_id) order) — the batch twin of
    * [[graft.streaming.EventStreams.anomalyIngest]], which holds the same
    * three integers (n, sum, sum-of-squares in exact centi-units) as
    * per-user streaming state. Integer prefix sums make the prequential
    * stats bit-identical across engines AND across the stream/batch pair;
    * only the final mean/variance/z arithmetic is double, in the same
    * operation order everywhere. Per-user windows partition by user_id —
    * no global sort.
    */
  private val AnomMinPrior = 10
  private def x37(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.anomalyBatch(
      t(s, dir, "events"), AnomMinPrior, 3.0)

  /** Blocked fuzzy matching (entity resolution): customer-name pairs
    * within edit distance 1, found WITHOUT an all-pairs comparison — pairs
    * are generated only within a blocking key (the name minus its last two
    * characters), then verified with exact `levenshtein`. The blocking
    * equi-join is the scale shape: candidate volume is bounded by block
    * size, not corpus squared (a hot block would get the x04-style df cap;
    * fixture blocks are <= 100 by construction). Both engines block and
    * verify identically, so the pair set hash-matches.
    */
  private def x38(s: SparkSession, dir: String): DataFrame = {
    // Levenshtein strips common prefixes, so within a block (equal on all
    // but the last 2 chars) the full-name distance equals the 2-char
    // suffix distance — both engines verify on the suffix, turning the
    // per-pair cost from O(|name|^2) into O(1) (measured 10.9 s -> ~1 s
    // on the 740k-pair sf0.1 block space).
    val c = t(s, dir, "customer")
      .select(col("c_custkey"),
        expr("substring(c_name, 1, length(c_name) - 2)").as("blk"),
        expr("substring(c_name, length(c_name) - 1, 2)").as("suf"))
    c.as("a").join(c.as("b"),
        col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
      .select(
        col("a.c_custkey").as("id1"), col("b.c_custkey").as("id2"),
        levenshtein(col("a.suf"), col("b.suf")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
      .orderBy(col("id1"), col("id2"))
  }

  /** Retention cohort analysis: users grouped by first-seen day (their
    * cohort), counted on each subsequent active day offset — the DAU
    * retention triangle. Two user-keyed shuffles (first-seen min, then the
    * distinct (cohort, offset, user) dedup) and a tiny final aggregate;
    * nothing is ordered globally and nothing collects per-user history.
    */
  private def x39(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort"), datediff(col("d"), col("cohort")).as("day_k"))
      .distinct()
      .groupBy(col("cohort"), col("day_k"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("day_k"))
  }

  /** Batch twin of [[graft.streaming.EventStreams.windowedTopUsers]] (the
    * watermark is a no-op on a bounded frame — the repo's stream/batch
    * pattern): hourly top-3 users by event count out of the Misra-Gries
    * sketch, running in its exact regime (m = 1024 >> users/window), so
    * the oracle is plain per-window GROUP BY counts ranked.
    */
  private def x40(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.windowedTopUsers(Tables.events(s, dir))
      .orderBy(col("window_start"), col("rnk"))

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): each row gets
    * key u^(1/w) with u uniform and w its weight; the global top-k by key
    * IS a weighted sample without replacement. Here u derives
    * deterministically from the content hash (integer mod arithmetic), so
    * the "random" sample is reproducible on any engine and partitioning —
    * the same trick as the x12/x17 hash-threshold samplers, upgraded to
    * weights. Ranking uses ln(u)/w (monotone in the key, numerically
    * tame), rounded to 6 dp with doc_id tie-break. Map-only scoring +
    * TakeOrdered top-k: no shuffle of the corpus at any scale.
    */
  private val WsK = 100
  private val WsM = 1000003L
  private def x41(s: SparkSession, dir: String): DataFrame = {
    val u = (TextOps.polyHash(col("text")) % WsM + 1L).cast("double") / lit((WsM + 1).toDouble)
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("w"),
        round(log(u) / col("n_chars").cast("double"), 6).as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(WsK)
  }

  /** Telemetry burst-dedup: within each (user, event_type) stream, keep
    * an event only if it is the first or arrives more than DedupGapSec
    * after its predecessor — the batch complement of the streaming
    * horizon dedup (`DocStreams`). Per-key windows (partitioned, ordered
    * by event time with id tie-break) — gap arithmetic on exact epoch
    * micros, so both engines agree integer-for-integer. At scale this is
    * one shuffle on the (user, type) key; no global order.
    */
  private val DedupGapSec = 300L
  private def x42(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    ev.withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNull || col("us") - col("prev_us") > DedupGapSec * 1000000L)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy(col("user_id"), col("event_type"), col("event_id"))
  }

  /** Incremental aggregate maintenance: a stored per-group aggregate
    * (count + decimal-exact sum — the mergeable partial form) absorbs a
    * delta batch by aggregating ONLY the delta and sum-merging, never
    * rescanning the base — the materialized-view maintenance pattern that
    * turns a 100 TB nightly recompute into a delta-sized update. The
    * oracle IS the full recompute over base + delta: equality of the two
    * is the correctness proof of the merge algebra (counts add; decimal
    * sums add order-independently; avg re-derives from the merged pair).
    */
  private def x43(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"))
    val delta = t(s, dir, "lineitem").filter(col("l_orderkey") % 13 === 0)
      .select(col("l_returnflag"), (col("l_quantity") * 2.0).as("l_quantity"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
    partial(base).union(partial(delta))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("n")).cast("long").as("n"), sum(col("sq")).as("sq"))
      .select(col("l_returnflag"), col("n"),
        col("sq").cast("double").as("sum_qty"),
        (col("sq").cast("double") / col("n").cast("double")).as("avg_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** BPE merge-training rounds for x45 (unrolled so the oracle can
    * mirror each round as a CTE).
    */
  private val BpeRounds = 3

  /** Space-padded symbol string for a word column: space-joined
    * characters, padded so a merge pattern " a b " can only match on
    * symbol boundaries.
    *
    * BMP-only by contract: Spark's `split(w, "")` cuts at UTF-16 code
    * units (a supplementary-plane char becomes two surrogate symbols)
    * while DuckDB's `string_split(w, '')` cuts at code points — the two
    * engines would symbolize any non-BMP word differently. Callers
    * therefore exclude non-BMP words via [[bmpOnly]] on BOTH sides
    * before symbolizing, making the divergence unreachable instead of
    * merely untested.
    */
  private def bpeSymbolize(w: Column): Column =
    concat(lit(" "), concat_ws(" ", filter(split(w, ""), c => c =!= "")), lit(" "))

  /** True iff the word contains no supplementary-plane (non-BMP) code
    * point. Same regex semantics in Java (Spark `rlike`) and RE2 (DuckDB
    * `regexp_matches`): a code-point class over U+10000..U+10FFFF.
    */
  private def bmpOnly(w: Column): Column = !w.rlike("[\\x{10000}-\\x{10FFFF}]")
  private val BmpOnlySql = "NOT regexp_matches(w, '[\\x{10000}-\\x{10FFFF}]')"

  /** Shared BPE training loop for x45/x46: `vocab` carries (sym, n) plus
    * any extra columns (e.g. the word itself), which ride through the
    * merges untouched. Returns (per-round picks, post-merge vocabulary).
    *
    * Merge semantics: left-to-right non-overlapping replacement over the
    * space-joined symbol string, boundary-padded — identical in Spark and
    * DuckDB by construction (both scan from the end of the previous
    * match), and exactly reproducible, which is what the oracles check.
    * (On a run like "a b a b" this leaves the second pair unmerged where
    * pairwise BPE would merge both — a documented, deterministic
    * divergence.)
    */
  private def bpeTrainRounds(vocab: DataFrame, rounds: Int): (Seq[DataFrame], DataFrame) = {
    def pairsOf(df: DataFrame): DataFrame = {
      val arr = filter(split(trim(col("sym")), " "), c => c =!= "")
      df.select(col("n"), arr.as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("n"), explode(transform(
          sequence(lit(1), size(col("a")) - 1),
          i => concat(element_at(col("a"), i), lit(" "), element_at(col("a"), i + 1)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).cast("long").as("cnt"))
    }
    var cur = vocab
    val picks = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val top = pairsOf(cur)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .select(lit(r.toLong).as("rnd"), col("pair"), col("cnt"))
      picks += top
      // merge: " a b " -> " ab " everywhere (left-to-right, non-overlap);
      // the broadcast single-row pick parameterizes the replacement
      cur = cur.crossJoin(broadcast(top.select(col("pair").as("mp"))))
        .withColumn("sym",
          replace(
            col("sym"),
            concat(lit(" "), col("mp"), lit(" ")),
            concat(lit(" "), regexp_replace(col("mp"), lit(" "), lit("")), lit(" "))))
        .drop("mp")
    }
    (picks.toSeq, cur)
  }

  /** BPE merge training (the tokenizer-training core, Sennrich et al.
    * 2016): count adjacent symbol pairs across the word-frequency table,
    * merge the most frequent pair, repeat. Three rounds unrolled.
    *
    * Scale posture — the real BPE-training shape: the corpus collapses
    * ONCE to a (word, count) vocabulary (one shuffle on the word; every
    * later round works on the vocabulary-sized frame, never re-reading
    * the corpus). Per round: pair extraction is a map-side array
    * transform, pair counting shuffles pair-vocabulary-sized keys, and
    * the argmax pair (count desc, pair asc — deterministic) broadcasts
    * back for the merge ([[bpeTrainRounds]]).
    *
    * Output: (rnd, pair, cnt) — the merge chosen each round with its
    * count at selection time.
    */
  private def x45(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(bmpOnly(col("w")))
      .select(bpeSymbolize(col("w")).as("sym"), col("n"))
    val (picks, _) = bpeTrainRounds(words, BpeRounds)
    picks.reduce(_ union _).orderBy(col("rnd"))
  }

  /** BPE segmentation (x46) — the SERVE side of the tokenizer split:
    * apply the merges x45 trains to tokenize every document, reporting
    * per-doc word and post-merge BPE token counts.
    *
    * Train/serve split: the merged symbol vocabulary is a build artifact
    * — trained once per dataset fingerprint through the [[AnnModels]]
    * store (training is a deterministic argmax chain, so the persisted
    * vocabulary is bit-identical to an in-query retrain) and served as a
    * vocabulary-sized parquet read, exactly like the IVF/PQ models. The
    * apply itself never touches per-document text beyond the initial
    * tokenize: token counts attach at the WORD level (one equi-join on
    * the word — vocabulary-sized build side), then aggregate per doc.
    * At 100 TB that is the only sane shape: the corpus shuffles once on
    * the word for the join, the merge chain runs over the vocabulary
    * (millions of rows), never the corpus (trillions).
    *
    * Output: (doc_id, n_words, bpe_tokens); blank docs have no tokens
    * and (like the oracle's unnest) drop out.
    */
  /** The persisted post-merge BPE vocabulary x45/x46/x81 all serve from:
    * trained once per dataset fingerprint ([[AnnModels.trainOrLoad]]) on
    * the corpus-wide word counts, so every consumer tokenizes with the
    * IDENTICAL vocabulary — retraining per query would replay the merge
    * DAG and could drift if a consumer's word frame differed.
    */
  private def bpeMergedVocab(s: SparkSession, dir: String): DataFrame =
    AnnModels.trainOrLoad(s, dir, "documents", s"bpe_vocab_r$BpeRounds") {
      val words = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
      val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(bmpOnly(col("w")))
        .select(col("w"), bpeSymbolize(col("w")).as("sym"), col("n"))
      bpeTrainRounds(vocab, BpeRounds)._2
    }

  private def x46(s: SparkSession, dir: String): DataFrame = {
    val docWords = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val merged = bpeMergedVocab(s, dir)
    val tokCounts = merged.select(
      col("w"),
      size(filter(split(trim(col("sym")), " "), c => c =!= "")).cast("long").as("ntok"))
    docWords.join(tokCounts, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window width for exact-substring dedup: the corpus analogue
    * of the 50-token rule (fixture docs run 10-99 tokens, so 20 keeps
    * plants detectable while staying far above chance collision for
    * word-salad text).
    */
  private val SubstrW = 20

  /** Exact substring (shared-passage) dedup ([[Dedup.exactSubstringSpans]]):
    * maximal runs of >= [[SubstrW]] consecutive tokens shared verbatim
    * across documents — the passage-level complement to the doc-level
    * MinHash family (x05/x06/x26). Shared passages are PLANTED by
    * concatenating adjacent docs into synthetic docs at +300000 (each
    * synthetic doc shares its halves verbatim with two different base
    * docs); the word-salad corpus has no natural 20-token repeats, so the
    * planted spans are exactly what both engines must find — including
    * their maximal extents, which the gaps-and-islands merge must chain
    * from overlapping window hits. One window-hash shuffle + a per-
    * (pair, diagonal) window — no all-pairs comparison anywhere.
    */
  private def x44(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
    val synth = base.filter(col("doc_id") % 7 === 0).alias("a")
      .join(base.alias("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        (col("a.doc_id") + 300000).as("doc_id"),
        concat(col("a.text"), lit(" "), col("b.text")).as("text"))
    val corpus = base.union(synth)
    Dedup.exactSubstringSpans(corpus, "doc_id", "text", SubstrW)
      .orderBy(col("id1"), col("id2"), col("start1"), col("start2"))
  }

  /** Semantic-dedup cosine threshold (exact clones score 1.0). */
  private val SemDedupTau = 0.99

  /** Semantic dedup (x47) — the SemDeDup shape (Abbas et al. 2023):
    * cluster the corpus semantically with the TRAINED IVF k-means model
    * (the same persisted 16-cell index x13/x25 serve from), generate
    * candidate pairs only within a cluster, and remove every member that
    * duplicates (cosine >= [[SemDedupTau]]) a lower-id member, reporting
    * its keeper, best-duplicate cosine, and duplicate count.
    *
    * Scale posture: cluster count is the published SemDeDup knob (k grows
    * with the corpus so clusters stay small); on top of that each cell is
    * sub-bucketed by the 8-bit hyperplane signature before pair
    * generation, so the pair space stays bounded even when a cell
    * outgrows the hot-bucket cap. Identical vectors always share
    * (cell, signature), so exact clones are caught at ANY scale;
    * borderline near-dups trade recall exactly like the x09/x11 LSH
    * family. Clones are planted (+100000, every 5th vector) and both
    * cell assignment and signatures are deterministic, so the engines
    * see the identical candidate set — the removal DECISION, not just a
    * score, is hash-checked.
    */
  private def x47(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val corpus = e.union(
      e.filter(col("vec_id") % 5 === 0).select((col("vec_id") + 100000).as("vec_id"), col("v")))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val bucketed = Similarity.ivfAssign(corpus, cents, EmbDim).select(
      col("vec_id"), col("v"),
      concat(
        col("cell_id").cast("string"), lit(":"),
        Similarity.lshSignature(col("v"), LshBits, EmbDim).cast("string")).as("sb"),
      Similarity.norm(col("v"), EmbDim).as("nrm"))
    Similarity.bucketMemberPairs(
      bucketed, "sb",
      struct(col("vec_id").as("id"), col("v").as("vec"), col("nrm").as("nrm")),
      Dedup.ShingleDfCap)
      .filter(col("m1.id") < col("m2.id"))
      .select(
        col("m1.id").as("id1"), col("m2.id").as("id2"),
        round(
          Similarity.cosineStatic(col("m1.vec"), col("m2.vec"), col("m1.nrm"), col("m2.nrm"), EmbDim),
          6).as("cos"))
      .filter(col("cos") >= SemDedupTau)
      .groupBy(col("id2"))
      .agg(min(col("id1")).as("kept_id"), max(col("cos")).as("max_cos"), count(lit(1)).as("n_dups"))
      .select(col("id2").as("removed_id"), col("kept_id"), col("max_cos"), col("n_dups"))
      .orderBy(col("removed_id"))
  }

  /** The trained IVF centroid frame x47 serves from — the persisted
    * (cell_id, cv) model — exposed so tools.ScaleVerify can materialize
    * it next to its output dump for the probe-scale oracle.
    */
  private[graft] def x47Centroids(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
  }

  /** x47 oracle for probe scales where DuckDB cannot afford the in-SQL
    * k-means retrain (at sf100 the retrain spilled >50 GB of temp and
    * died): the identical decision pipeline, but the trained cells come
    * from the engine's PERSISTED centroid parquet. The
    * persisted-equals-retrained equivalence is itself pinned
    * (AnnModelsSpec bit-identity; the full-retrain oracle remains the
    * gate at sf<=10), so this verifies every probe-scale removal
    * DECISION with bounded oracle resources.
    *
    * Assignment avoids the original oracle's vector-carrying window sort:
    * the (round(cos,6) DESC, cell_id) argmax becomes one arg_min whose
    * key is an exact BIGINT encoding — round(cos,6) is a multiple of
    * 1e-6, so (1e6 - cos*1e6)*100 + cell_id orders identically, and the
    * winning (v, cell) ride along in a struct. Duplicate corpus ids
    * (planted clone ids collide with real ids once the table outgrows
    * the +100000 offset) collapse to one row per id in BOTH engines:
    * Spark's ivfAssign window and this GROUP BY vec_id pick the same
    * global-argmax row.
    */
  private[graft] def x47ScaleOracle(centroidsGlob: String): String = {
    val bucketSql = (0 until LshBits).map { p =>
      val plane = (0 until EmbDim).map(d => Similarity.planeComponent(p, d)).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corpus AS (SELECT vec_id, v FROM e
       | UNION ALL SELECT vec_id + 100000, v FROM e WHERE vec_id % 5 = 0),
       |c2 AS (SELECT cell_id, CAST(cv AS DOUBLE[]) AS cv FROM read_parquet('$centroidsGlob')),
       |ac AS (SELECT vec_id, a.w.v AS v, a.w.cell_id AS cell_id FROM (
       | SELECT t.vec_id, arg_min(
       |   {'v': t.v, 'cell_id': c.cell_id},
       |   (1000000 - CAST(round(round(list_cosine_similarity(t.v, c.cv), 6) * 1000000, 0) AS BIGINT)) * 100
       |     + c.cell_id) AS w
       |  FROM corpus t CROSS JOIN c2 c GROUP BY t.vec_id) a),
       |sig AS (SELECT vec_id, v,
       |  CAST(cell_id AS VARCHAR) || ':' || CAST($bucketSql AS VARCHAR) AS sb FROM ac),
       |cool AS (SELECT sb FROM sig GROUP BY sb HAVING count(*) <= ${Dedup.ShingleDfCap}),
       |capped AS (SELECT sig.* FROM sig JOIN cool USING (sb)),
       |pr AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
       | FROM capped a JOIN capped b ON a.sb = b.sb AND a.vec_id < b.vec_id)
       |SELECT id2 AS removed_id, CAST(min(id1) AS BIGINT) AS kept_id,
       | max(cos) AS max_cos, CAST(count(*) AS BIGINT) AS n_dups
       |FROM pr WHERE cos >= $SemDedupTau
       |GROUP BY id2 ORDER BY removed_id""".stripMargin
  }

  /** DSIR feature-hash bucket count (hashed unigram features). */
  private val DsirB = 256L

  /** DSIR selection size. */
  private val DsirK = 100

  /** Importance-weighted data selection (x48) — the DSIR shape (Xie et
    * al. 2023): score every document by how target-like its hashed
    * n-gram features are, then keep the top-K. Features are unigrams
    * hashed into [[DsirB]] buckets; the target distribution is the
    * English slice (`lang = 'en'`), the reference is the whole corpus;
    * each bucket's add-1-smoothed log-likelihood-ratio
    * ln(p_target/p_corpus) is computed as ONE ln of an exact integer
    * ratio (products stay in BIGINT; a single transcendental, rounded
    * once at 6 dp — the engine-agnostic discipline every score here
    * follows), and a document's weight is the decimal-exact
    * (order-independent) sum of its tokens' bucket ratios.
    *
    * Scale posture: two corpus-wide passes (bucket histogram: 256
    * map-side-combined keys; per-doc weight: one shuffle on doc_id),
    * with the 256-row ratio table broadcast — no all-to-one state, no
    * driver loop. Selection is a TakeOrdered top-K, never a global sort.
    */
  private def x48(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"), (TextOps.polyHash(col("w")) % DsirB).as("b"))
    val tgt = toks.filter(col("lang") === "en").groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val all = toks.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tots = tgt.agg(sum(col("ct")).as("tt")).crossJoin(all.agg(sum(col("cs")).as("ts")))
    // lr = ln( ((ct+1)/(tt+B)) / ((cs+1)/(ts+B)) ) with the ratio formed
    // from exact BIGINT products before the one double division
    val lr = all.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .select(
        col("b"),
        round(
          log(
            ((coalesce(col("ct"), lit(0L)) + 1L) * (col("ts") + lit(DsirB))).cast("double") /
              ((col("cs") + 1L) * (col("tt") + lit(DsirB))).cast("double")),
          6).as("lr"))
    toks.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(col("lr").cast("decimal(18,6)")).as("lw"))
      .select(col("doc_id"), col("n_toks"), col("lw").cast("double").as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(DsirK)
  }

  /** Interpolation weight for the bigram LM (x49): P = lambda * bigram
    * MLE + (1 - lambda) * add-1 unigram.
    */
  private val BigramLambda = 0.9

  /** Interpolated bigram LM scoring (x49) — the CCNet/Gopher-style
    * perplexity filter, one order up from x22's unigram model: each
    * document's mean log P(cur | prev) under an interpolated bigram LM
    * trained on the corpus itself. Bigram extraction is a map-side array
    * transform (never a per-doc window shuffle); the model is a
    * bigram-vocabulary-sized score table (bigram counts joined to the
    * two unigram counts, totals broadcast) built once and equi-joined by
    * the corpus — the same two-level train/score split every LM filter
    * runs at 100 TB. Per-bigram log-probs follow the x22 discipline:
    * the interpolation is deterministic double arithmetic on exact
    * counts, ln applied once, decimal-quantized mean.
    *
    * Output: (doc_id, n_bigrams, avg_logprob); docs under 2 tokens have
    * no bigrams and drop out in both engines.
    */
  private def x49(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = docs.select(col("doc_id"), explode(transform(
      sequence(lit(1), size(col("t")) - 1),
      i => struct(
        element_at(col("t"), i).as("prev"),
        element_at(col("t"), i + 1).as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))
    val uni = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("uc"))
    val tot = uni.agg(sum(col("uc")).as("tt"), count(lit(1)).as("vv"))
    val scores = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bc"))
      .join(uni.select(col("tok").as("prev"), col("uc").as("pc")), "prev")
      .join(uni.select(col("tok").as("cur"), col("uc").as("cc")), "cur")
      .crossJoin(broadcast(tot))
      .select(col("prev"), col("cur"),
        log(
          lit(BigramLambda) * (col("bc").cast("double") / col("pc").cast("double")) +
            lit(1.0 - BigramLambda) *
            ((col("cc") + 1L).cast("double") / (col("tt") + col("vv")).cast("double"))).as("lp"))
    bi.join(scores, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // deliberately un-rounded: the decimal-exact mean is already
        // bit-identical across engines, and rounding it lands on exact
        // .5 ties where their rounding modes disagree (the Exact.davg
        // hazard — hit for real at sf0.1 before this was removed)
        graft.util.Exact.davg(col("lp"), 6).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** GD rounds / learning rate for the x50 classifier (unrolled so the
    * oracle mirrors round for round).
    */
  private val LrRounds = 3
  private val LrRate = 0.5

  /** In-engine quality-classifier training (x50): logistic regression by
    * unrolled full-batch gradient descent over per-document text
    * features (bias, capped length, stopword density, punctuation
    * density), labeled by the English slice — the fastText-style
    * quality-filter trainer as a first-class, oracle-checked operator.
    *
    * Determinism discipline (the k-means playbook applied to GD):
    * features and residuals live in integer micro-units — the per-row
    * sigmoid is the only transcendental and is rounded ONCE to an
    * integer micro value; every (residual * feature) product and its
    * gradient sum is then EXACT integer arithmetic (order-independent,
    * decimal(38,0) against overflow), so the weight vector after each
    * round is the identical double in both engines and the DuckDB
    * oracle replays training round for round. Scale
    * shape: each round is one map-side scoring pass + a 4-component
    * decimal aggregate (map-side combined) with the 1-row weight frame
    * broadcast back — the corpus never shuffles; rounds cost O(scan).
    *
    * Output: (rnd, w0..w3) — the weight trajectory.
    */
  private def x50(s: SparkSession, dir: String): DataFrame = {
    // Features in integer MICRO-UNITS (exact BIGINT arithmetic: capped
    // length, floor-divided density ratios). A first cut kept features
    // as raw doubles and cast (residual * feature) to decimal for the
    // sum — the cast ROUNDS an arbitrary double, and at sf0.1 the two
    // engines' double->decimal tie behavior diverged by a few 1e-8 units
    // (w2 off at 1e-11). Integer micro-units make every product and sum
    // exact; the rounded sigmoid is the only quantization left.
    val base = t(s, dir, "documents").select(
      when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"),
      TextOps.wsTokenCount(col("text")).as("ntok"),
      TextOps.stopHits(col("text"), TextOps.StopwordPatterns.head._2).as("stops"),
      TextOps.punctCount(col("text")).as("punct"))
    val feats = base.select(
      col("y"),
      lit(1000000L).as("f0m"),
      least(col("ntok") * 10000L, lit(1000000L)).as("f1m"),
      expr("(stops * 1000000) div (ntok + 1)").as("f2m"),
      expr("(punct * 1000000) div (ntok + 1)").as("f3m"))
    var w = feats.sparkSession.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
    val rounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (r <- 1 to LrRounds) {
      def fd(j: Int) = col(s"f${j}m").cast("double") / 1000000.0
      val z = col("w0") * fd(0) + col("w1") * fd(1) + col("w2") * fd(2) + col("w3") * fd(3)
      // micro-unit residual: the sigmoid is rounded ONCE to an integer
      // micro value (the only transcendental quantization in the loop)
      val residM = col("y") * 1000000L -
        round(lit(1.0) / (lit(1.0) + exp(-z)) * 1000000.0).cast("long")
      val scored = feats.crossJoin(broadcast(w)).select(
        (0 to 3).map(j => (residM * col(s"f${j}m")).cast("decimal(38,0)").as(s"g$j")) :+
          lit(1L).as("one"): _*)
      val grads = scored.agg(
        sum(col("g0")).cast("double").as("g0"), sum(col("g1")).cast("double").as("g1"),
        sum(col("g2")).cast("double").as("g2"), sum(col("g3")).cast("double").as("g3"),
        sum(col("one")).cast("double").as("n"))
      // step = lr * mean residual-weighted feature (de-scaled from the
      // 1e-12 product units), added to the broadcast previous weights;
      // the 1-row model is lineage-cut per round (the kmeansCentroids
      // pattern)
      w = grads.select(
        (0 to 3).map(j =>
          (col(s"g$j") / 1000000000000.0 / col("n") * LrRate).as(s"d$j")): _*)
        .crossJoin(broadcast(w))
        .select(
          (0 to 3).map(j => (col(s"w$j") + col(s"d$j")).as(s"w$j")): _*)
        .transform(graft.ops.Checkpoints.cut)
      rounds += w.select(lit(r.toLong).as("rnd"), col("w0"), col("w1"), col("w2"), col("w3"))
    }
    rounds.reduce(_ union _).orderBy(col("rnd"))
  }

  /** PageRank iterations for x51 (unrolled so the oracle can replay). */
  private val PrRounds = 3

  /** PageRank (x51) over the supplier<->customer co-purchase graph
    * (distinct lineitem x orders pairs, both directions, ids
    * disambiguated by parity): three unrolled power iterations with
    * damping 0.85, in ALL-INTEGER pico-rank units — contributions are
    * floor-divided by out-degree and the damping factor applies as
    * (85 * c) div 100, so every rank is a BIGINT and the result is
    * hash-exact with no floating point anywhere (a documented
    * deterministic variant: floor division leaks up to outdeg-1 pico
    * units of mass per node per round).
    *
    * Scale shape — textbook distributed PageRank: the edge list with
    * out-degrees builds once (one shuffle) and is materialized (lineage
    * cut) for reuse across rounds; each iteration is one join of the node-sized rank
    * vector with the edge list on the source key plus a contribution
    * aggregate on the destination key, with the rank vector
    * materialized per round (the Pregel superstep pattern;
    * localCheckpoint cuts the iteration lineage exactly like the
    * k-means family). Top-20 presentation is a TakeOrdered, never a
    * global sort.
    */
  private def x51(s: SparkSession, dir: String): DataFrame = {
    // Cut (round-20): `pairs` is referenced twice by the symmetrize union
    // and `edges` twice more by the degree build — without the cut the
    // lineitem ⋈ orders + distinct chain re-ran per branch (profiled: two
    // ~0.7 s scan+join jobs per x51 run). The cut frame is two longs per
    // pair; downstream consumers read blocks. (Round-21 A/B: lazy cuts
    // here measured slower — kept eager.)
    val pairs = graft.ops.Checkpoints.cut(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2L).as("a"), (col("o_custkey") * 2L + 1L).as("b"))
        .distinct())
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    // Materialized cuts, not .cache(): every PageRank round re-reads the
    // degree-annotated edge list, and a cache would leak blocks into a
    // direct caller's session after the query returns (the x59
    // precedent). The cut frame is a scan of materialized blocks, so
    // loop reuse costs no lineage replay and nothing stays registered.
    // SHUFFLE_HASH on the node-sized degree side (round-21, guide §3.1):
    // the LogicalRDD inputs have no size statistics, so the planner
    // defaults to sort-merge — sorting the edge-sized side for a join
    // whose build side is node-count-bounded (nodes / shuffle.partitions
    // rows per task at any scale, a few MB per task at 1e9 nodes).
    val withDeg = graft.ops.Checkpoints.cut(edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
        .hint("SHUFFLE_HASH"), "src"))
    // Node count as ONE driver scalar (round-21 job thinning): the old
    // `nodes` cut + 1-row broadcast nFrame re-ran a distinct + aggregate
    // + broadcast build inside EVERY materialization that referenced it
    // (the init vector and each round's damping term). The count is a
    // per-run scalar derived from the inputs (the capMixAllocation
    // budget precedent), and the damping constant folds to a literal in
    // every round's plan. Same integer floor-division arithmetic —
    // values identical.
    val n = withDeg.select(col("src")).distinct().count()
    val initRank = 1000000000000L / n
    val damp = (15L * initRank) / 100L
    // The init vector is a constant expression over the (src-distinct)
    // node set — leave it LAZY: round 1 folds it into its own join.
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(initRank).as("r"))
    for (i <- 1 to PrRounds) {
      // No dangling-node left join: the edge list is SYMMETRIZED (a->b and
      // b->a both present), so every node receives at least one
      // contribution and the aggregate's dst key set IS the node set —
      // provably identical values with one join fewer per round.
      // Build the node-sized rank vector, stream the edge side (guide
      // §3.1): sort-merge re-sorted the edge-sized withDeg EVERY round;
      // the hash build is rank-vector-sized per partition at any scale.
      ranks = ranks.hint("SHUFFLE_HASH").join(withDeg, col("node") === col("src"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("node"),
          (lit(damp) + expr("(85 * cs) div 100")).as("r"))
      // Cut lineage every SECOND round plus the FINAL one (the r20
      // cadence — an all-lazy variant was A/B'd in r21 and measured
      // slower): a 2-round plan over cached inputs is cheap to carry,
      // and the served result stays a scan of the materialized vector
      // (the PlanSpec serve-discipline pin). The FINAL cut is LAZY: the
      // serve's TakeOrdered is the single consumer, so its action
      // computes and persists the last generation in one pass.
      if (i == PrRounds) ranks = graft.ops.Checkpoints.cutLazy(ranks)
      else if (i % 2 == 0) ranks = graft.ops.Checkpoints.cut(ranks)
    }
    ranks.select(col("node").as("node_id"), col("r").as("rank_pico"))
      .orderBy(col("rank_pico").desc, col("node_id"))
      .limit(20)
  }

  /** x52 Bloom sizing: CORPUS-DRIVEN. 6 probe hashes, target ~1% false
    * positives; the word count comes from [[bloomWordsFor]] applied to
    * the corpus key count, so a growing corpus grows its filter instead
    * of silently saturating a fixed one into a pass-everything no-op.
    * Sizing only affects PRUNING, never the answer (the confirm join
    * removes false positives; Bloom has no false negatives) — BloomSpec
    * pins both the FP-rate tracking and the saturation degradation.
    */
  private val BloomHashes = 6
  private val BloomTargetFpp = 0.01

  /** Bits from the standard Bloom occupancy model
    * `p = (1 - e^(-k n / m))^k` solved for m at the target FP rate,
    * rounded up to a power-of-two 64-bit word count and clamped to
    * [2^10, 2^24] words (8 KiB .. 128 MiB of driver-collected bitset —
    * the upper clamp keeps the broadcast bounded; beyond it the FP rate
    * degrades gracefully and the confirm join still makes the answer
    * exact).
    */
  private[graft] def bloomWordsFor(nKeys: Long, hashes: Int, targetFpp: Double): Int = {
    val n = math.max(1L, nKeys).toDouble
    val bits = -hashes * n / math.log1p(-math.pow(targetFpp, 1.0 / hashes))
    val words = math.max(1L, math.ceil(bits / 64.0).toLong)
    val pow2 = if (words <= 1L) 1L else java.lang.Long.highestOneBit(words - 1) * 2
    math.min(1L << 24, math.max(1L << 10, pow2)).toInt
  }

  /** Incremental-ingest membership via a broadcast Bloom prefilter (x52):
    * which docs of an incoming batch (doc_id % 10 = 0) are genuinely NEW
    * versus already represented in the historical corpus (the rest), keyed
    * by an 8-token prefix fingerprint (prefix fingerprints catch the
    * template/boilerplate reuse that exact-text equality misses).
    *
    * The 100 TB shape — the corpus is never shuffled for this join: corpus
    * keys fold map-side into corpus-count-sized bitset partials merged by
    * OR ([[graft.functions.BloomAgg]]; [[bloomWordsFor]] picks the size
    * for the ~1% FP target), ONE bitset comes back to the driver, and the
    * batch probes it map-only ([[graft.functions.BloomMightContain]],
    * codegen'd, bitset attached as a reference object). Only the
    * bloom-positive candidates — true members plus the FP-target tail —
    * reach the exact confirm path, and both confirm joins broadcast
    * the candidate-sized side, so the corpus full scan stays map-only end
    * to end. The answer is exact for ANY filter sizing.
    *
    * Oracle: a plain NOT EXISTS anti-join on the same fingerprint — the
    * Bloom filter is invisible in the semantics, which is the point.
    */
  private def x52(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents").select(
      col("doc_id"), col("n_chars"),
      graft.functions.TextExprs.polyHash(
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")).as("k"))
    val corpus = keyed.filter(col("doc_id") % 10 =!= 0)
    val batch = keyed.filter(col("doc_id") % 10 === 0)
    // Corpus-count-driven sizing: here an exact count (column-pruned to a
    // metadata-cheap scan); on a production catalog the same number comes
    // from table statistics without a job. Either way the result is exact
    // for ANY estimate — sizing is purely a pruning-quality knob.
    val nCorpus = corpus.count()
    val bloomWords = bloomWordsFor(nCorpus, BloomHashes, BloomTargetFpp)
    val words = corpus
      .agg(graft.functions.BloomExprs.bloomAgg(col("k"), bloomWords, BloomHashes).as("bf"))
      .head.getSeq[Long](0).toArray
    val candidates = batch.filter(graft.functions.BloomExprs.mightContain(col("k"), words, BloomHashes))
    val confirmed = corpus
      .join(broadcast(candidates.select(col("k")).distinct()), Seq("k"), "left_semi")
      .select(col("k")).distinct()
    batch.join(broadcast(confirmed), Seq("k"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Shard fan-out for x53 — 16 at fixture scale; production sizes this to
    * (corpus bytes / target shard bytes), and every property below is
    * shard-count independent.
    */
  private val NShards = 16

  /** Deterministic training-shard export (x53): the step after selection
    * and dedup where the corpus is laid out for the trainer. Every train
    * doc gets a content-derived shard (salted second hash, independent of
    * the x12 split hash) and a reproducible position within its shard
    * (ordered by shard hash then doc_id — a deterministic global shuffle
    * of the corpus, NOT a random one, so reruns and backfills produce
    * byte-identical shards). Emits the shard MANIFEST: doc/char counts,
    * an order fingerprint (sum of position * keyed hash — any reorder or
    * substitution shifts it), and the first/last docs by position.
    *
    * Scale shape: ONE shuffle total. The window partitions by shard (never
    * a global sort: per-shard sorts run in parallel), and the manifest
    * aggregate reuses the window's hashpartitioning(shard) so no second
    * exchange appears — pinned in PlanSpec. At 100 TB the same plan holds
    * with NShards in the thousands; per-shard position assignment is the
    * only serial-within-shard step, exactly as in any shard writer.
    */
  private def x53(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents").select(
      col("doc_id"), col("n_chars"),
      TextOps.polyHash(col("text")).as("h"),
      graft.functions.TextExprs.polyHash(concat(lit("shard#"), col("text"))).as("h2"))
    val train = keyed.filter(col("h") % 100 < 80)
      .select(col("doc_id"), col("n_chars"), (col("h2") % NShards).as("shard"), col("h2"))
    val pos = row_number().over(
      Window.partitionBy(col("shard")).orderBy(col("h2"), col("doc_id")))
    train.select(col("shard"), col("doc_id"), col("n_chars"), col("h2"),
        pos.cast("long").as("position"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("position") * (col("h2") % 1000003L)).as("order_fp"),
        expr("min_by(doc_id, position)").as("first_doc"),
        expr("max_by(doc_id, position)").as("last_doc"))
      .orderBy(col("shard"))
  }

  /** SCD type-2 dimension build (x54): compress each user's event stream
    * into validity intervals of the tracked attribute (`event_type` as the
    * "status" dimension) — consecutive equal values collapse into one
    * version row with [valid_from, valid_to) bounds, the last version open
    * (`valid_to` null, `is_current` 1). This is the history-table half of
    * the CDC story (x32 is merge-on-read; this is the slowly-changing-
    * dimension layout every warehouse keeps next to it).
    *
    * Scale shape: ONE exchange total, on `user_id`. Every window below —
    * ordering, change detection (lag), per-user totals, version numbering
    * and interval close-off (lead) — partitions by `user_id` alone, and the
    * change filter between the two window passes preserves that
    * distribution, so the second pass adds sorts but no new shuffle
    * (PlanSpec pins the single exchange). Per-user state is one partition's
    * sort run — no global sort, no driver state; at 100 TB this is the
    * same plan with more partitions.
    */
  private def x54(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val perUser = Window.partitionBy(col("user_id"))
    val marked = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(byTime))
      .withColumn("total", count(lit(1)).over(perUser))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    marked.select(
        col("user_id"),
        row_number().over(byRun).cast("long").as("version"),
        col("event_type").as("status"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(byRun).as("valid_to"),
        (coalesce(lead(col("rn"), 1).over(byRun), col("total") + 1) - col("rn"))
          .cast("long").as("n_events"),
        lead(col("ts"), 1).over(byRun).isNull.cast("int").as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** One profiled column of x55: tbl/col labels plus the shared metric
    * schema (numeric min/max, string min/max, decimal-exact mean length) —
    * nulls where a metric doesn't apply to the column's type.
    */
  private def profiled(tbl: String, cn: String,
      nNulls: Column, nDistinct: Column,
      minNum: Column, maxNum: Column,
      minStr: Column, maxStr: Column, avgLen: Column): Column =
    struct(
      lit(tbl).as("tbl"), lit(cn).as("col_name"),
      count(lit(1)).as("n_rows"), nNulls.cast("long").as("n_nulls"),
      nDistinct.cast("long").as("n_distinct"),
      minNum.cast("double").as("min_num"), maxNum.cast("double").as("max_num"),
      minStr.cast("string").as("min_str"), maxStr.cast("string").as("max_str"),
      avgLen.cast("double").as("avg_len"))

  /** Data-quality profiler (x55, the Deequ-style pre-training audit): per
    * column of `documents` and `events` — row count, null count, exact
    * distinct count, typed min/max (numeric as double — min/max do no
    * arithmetic, so the raw doubles are bit-identical cross-engine;
    * timestamps as epoch micros; strings lexicographic), and decimal-exact
    * mean length for text columns (null counted as length 0). Free-text
    * `text` reports distinct + length only — a profiler row should never
    * embed megabyte extremal documents.
    *
    * Scale shape: ONE pass per table — a single aggregate computes every
    * column's metrics at once; the multiple exact COUNT(DISTINCT)s plan as
    * one Expand (rows × profiled columns) feeding one partial+final hash
    * aggregate, the classic exact-profile trade. At 100 TB the same query
    * swaps the exact distincts for the KMV sketch family (q21/q29) and the
    * Expand disappears; everything else is map-side. The per-table rows
    * then explode from ONE aggregated row — no second scan, no union of
    * per-column scans.
    */
  private def x55(s: SparkSession, dir: String): DataFrame = {
    // Two-phase per-column profile (round-20 optimization): the previous
    // single-pass form planned every table as one Expand (rows x profiled
    // columns, full TEXTS replicated into the grouping key) feeding a
    // SortAggregate that sorted the expanded rows by the 6-wide key TWICE
    // around the exchange — the multi-distinct rewrite's worst case. Here
    // each column profiles independently: phase A is a map-side-combined
    // HASH aggregate on the column's values (the null group rides along),
    // phase B derives every metric from the distinct-value histogram —
    // n_rows = Σcnt, n_nulls = the null group's cnt, n_distinct = count of
    // non-null values, min/max over the distinct set (= min/max overall),
    // and the decimal-exact length sum weighted by cnt (= the per-row
    // sum). Identical values, no Expand, no row replication, and the 11
    // column-pruned scans together read the same bytes as the old
    // full-width scan — at 100 TB this moves one distinct-value histogram
    // per column instead of sorting rows x columns replicas.
    def phase(df: DataFrame, tbl: String, cn: String, v: Column,
        numeric: Boolean, extremes: Boolean, lengths: Boolean): DataFrame = {
      val aggs = count(lit(1)).as("cnt") +: (if (lengths)
        Seq(sum(length(coalesce(col(cn), lit(""))).cast(DecimalType(18, 0))).as("lsum"))
      else Nil)
      val g = df.groupBy(v.as("v")).agg(aggs.head, aggs.tail: _*)
      g.agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
          .cast("long").as("n_nulls"),
        count(col("v")).cast("long").as("n_distinct"),
        (if (numeric) min(col("v")) else lit(null)).cast("double").as("min_num"),
        (if (numeric) max(col("v")) else lit(null)).cast("double").as("max_num"),
        (if (extremes) min(col("v")) else lit(null)).cast("string").as("min_str"),
        (if (extremes) max(col("v")) else lit(null)).cast("string").as("max_str"),
        (if (lengths) sum(col("lsum")).cast("double") / sum(col("cnt"))
        else lit(null)).cast("double").as("avg_len"))
        .select(lit(tbl).as("tbl"), lit(cn).as("col_name"), col("n_rows"),
          col("n_nulls"), col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"), col("avg_len"))
    }
    def numP(df: DataFrame, tbl: String, cn: String): DataFrame =
      phase(df, tbl, cn, col(cn), numeric = true, extremes = false, lengths = false)
    def tsP(df: DataFrame, tbl: String, cn: String): DataFrame =
      phase(df, tbl, cn, unix_micros(col(cn)), numeric = true, extremes = false,
        lengths = false)
    def strP(df: DataFrame, tbl: String, cn: String, extremes: Boolean = true): DataFrame =
      phase(df, tbl, cn, col(cn), numeric = false, extremes = extremes, lengths = true)
    val docs = t(s, dir, "documents")
    val evs = Tables.events(s, dir)
    Seq(
      numP(docs, "documents", "doc_id"), strP(docs, "documents", "lang"),
      numP(docs, "documents", "n_chars"), strP(docs, "documents", "source"),
      strP(docs, "documents", "text", extremes = false),
      numP(evs, "events", "event_id"), strP(evs, "events", "event_type"),
      strP(evs, "events", "props", extremes = false), tsP(evs, "events", "ts"),
      numP(evs, "events", "user_id"), numP(evs, "events", "value"))
      .reduce(_ union _)
      .orderBy(col("tbl"), col("col_name"))
  }

  /** Co-purchase edge threshold for x56: supplier<->customer pairs linked
    * by >= this many distinct orders form an edge. 3 keeps the sf0.01
    * graph one giant ~800-node component — the diameter stress case the
    * star-contraction algorithm exists for.
    */
  private val CcMinOrders = 3

  /** Connected components (x56) over the thresholded supplier<->customer
    * co-purchase graph (same bipartite id scheme as x51's PageRank), via
    * [[GraphOps.connectedComponents]] — alternating large-star/small-star
    * contraction, O(log n) rounds independent of component diameter.
    * Output: every graph node with its component root and component size.
    *
    * Scale shape: the graph build is one pair-key aggregate over the
    * fact join (bounded by distinct co-purchase pairs, like x51's edge
    * build); each contraction round is two node-key hash aggregates plus a
    * node-key join with checkpointed generations — no diameter-length
    * round counts, no driver-side graph. The oracle replays reachability
    * as a recursive CTE, which is O(sum of component sizes squared) — fine
    * at fixture scale, and exactly why the ENGINE uses contraction instead.
    */
  /** The thresholded supplier<->customer co-purchase edge list shared by
    * x56 (full recompute) and x61 (incremental maintenance).
    */
  private[graft] def copurchaseEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"), col("o_custkey"))
      .agg(countDistinct(col("l_orderkey")).as("m"))
      .filter(col("m") >= CcMinOrders)
      .select((col("l_suppkey") * 2L).as("a"), (col("o_custkey") * 2L + 1L).as("b"))

  /** Component labels + sizes in x56/x61's output shape. */
  private def componentSizes(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("comp_size"))
    // SHUFFLE_HASH: cluster-histogram build side, bounded per partition
    labels.join(sizes.hint("SHUFFLE_HASH"), "component")
      .select(col("node"), col("component"), col("comp_size"))
      .orderBy(col("node"))
  }

  private def x56(s: SparkSession, dir: String): DataFrame =
    componentSizes(GraphOps.connectedComponents(copurchaseEdges(s, dir)))

  /** Incremental connected components (x61): the daily-delta maintenance
    * twin of x56. A deterministic 80/20 hash coin splits the SAME
    * thresholded co-purchase edge set into a "historical" graph and a
    * planted delta; the engine labels the historical graph, keeps only its
    * star forest (node-count-sized — the historical EDGE set is never
    * re-read), and folds the delta in via
    * [[GraphOps.incrementalComponents]]. The oracle replays reachability
    * over the FULL edge set — coin-independent — so the row-exact compare
    * machine-checks the maintenance theorem: components(stars ∪ delta) =
    * components(full graph). Completes the warehouse family's incremental
    * story (x43 incremental agg, x32 CDC merge, x54 SCD2) for graphs.
    *
    * Scale shape: everything x56 does, plus one node-key left join; the
    * re-contraction's per-round edge count is |star forest| + |delta|,
    * and its round count is bounded by the delta's merge depth (≤ full
    * recompute's O(log n)).
    */
  private def x61(s: SparkSession, dir: String): DataFrame = {
    // Cut the edge build ONCE: the coin splits below filter this frame
    // twice (prior + delta), and without the cut each side replays the
    // corpus-sized lineitem⋈orders join + countDistinct aggregate —
    // the cut-shared-lineage convention jsDivergenceMatrix /
    // prefixSimilarityJoin / the triangle join already follow. The cut
    // frame is distinct-pair-sized, not corpus-sized.
    val pairs = Checkpoints.cut(copurchaseEdges(s, dir))
    val coin = pmod(col("a") * 31L + col("b"), lit(10L))
    val prior = pairs.filter(coin < 8)
    val delta = pairs.filter(coin >= 8)
    val prev = GraphOps.connectedComponents(prior)
    componentSizes(GraphOps.incrementalComponents(prev, delta))
  }

  /** Hourly gap-fill + forward fill (x57) over the events stream via
    * [[TimeSeries.gapFillForward]]: every user's irregular events become a
    * dense epoch-hour series — zero counts on silent hours, the per-hour
    * mean value carried forward across gaps — the regularization step
    * before any fixed-step window model. The per-hour mean is the
    * decimal-exact sum divided by the count (deterministic double, see
    * [[graft.util.Exact]]), so the forward-filled value hash-matches the
    * sequential oracle.
    *
    * Scale shape: see [[TimeSeries.gapFillForward]] — the grid is
    * output-sized (Σ per-user spans), every stage keys on user_id or
    * (user_id, hr), and the fill window is bounded by a user's span.
    */
  private def x57(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("user_id").as("key"), TimeSeries.epochHour("ts").as("bucket"), col("value"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), graft.util.Exact.dsum(col("value"), 6).as("sv"))
      .select(col("key"), col("bucket"), col("cnt"),
        (col("sv") / col("cnt").cast("double")).as("metric"))
    TimeSeries.gapFillForward(hourly)
      .select(col("key").as("user_id"), col("bucket").as("hr"),
        col("cnt"), col("is_observed"), col("filled").as("filled_avg"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** Modulus/keep-threshold of x58's deterministic edge sampling: an edge
    * survives iff polyHash("s1#s2") % 10 < 3, i.e. p = 0.3 — DOULION
    * (Tsourakakis, Kang, Miller, Faloutsos, KDD 2009): count triangles on a
    * p-sampled graph, estimate the full count as sampled/p³. The hash coin
    * (instead of rand()) keeps the sample — and therefore the whole query —
    * reproducible row-for-row in the oracle.
    */
  private val TriBuckets = 10
  private val TriKeep = 3

  /** Sampled triangle counting (x58) over the supplier co-purchase graph:
    * suppliers are linked when they serve the same order; edges are
    * DOULION-sampled at p = 0.3 by a deterministic hash coin, and per-node
    * triangle counts on the sampled graph come from
    * [[GraphOps.triangleCounts]] (degree-ordered wedge join). Graph motif
    * density is the engine's community-structure probe — triangle-rich
    * neighborhoods are co-purchase cliques (and in the dedup setting,
    * near-dup clusters), and the DOULION estimator (tri/p³) recovers the
    * full-graph count without ever materializing the unsampled wedge set.
    *
    * Scale shape: the edge build shuffles the fact table ONCE — per-order
    * supplier sets via collect_set, then map-side pair explosion over the
    * sorted set (fan-out ≤ C(items-per-order, 2), a constant; a self-join
    * on the order key would shuffle lineitem twice for the same pairs) —
    * and dedups on the pair key; sampling is a map-side filter BEFORE the
    * degree/wedge machinery, cutting wedge work by p²; the wedge join
    * itself is bounded by the √|E| out-degree cap of the orientation (see
    * [[GraphOps.triangleCounts]]).
    */
  private def x58(s: SparkSession, dir: String): DataFrame = {
    val sets = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    // Round-robin to core width before the C(n,2) fan-out (round-20): AQE
    // sizes the post-aggregate stage by the SET frame's bytes, which lands
    // the interpreted-HOF pair explosion + hash coin + dedup partial on a
    // handful of tasks (3 of 32 at sf0.1 — 13 s of task time serialized
    // onto them). The per-order supplier sets are id-only and small at any
    // scale, so a cores-wide round-robin exchange is cheap, and the
    // fan-out stage — whose cost AQE's bytes model cannot see — runs at
    // full width. max(cores, shuffle width) so the exchange can never
    // NARROW a deploy whose shuffle width exceeds its core count
    // (locally both are the core count — plan unchanged).
    val pairs = sets
      .repartition(graft.util.Width.coresOrShuffleWidth(sets))
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss")) - i - lit(1)), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
    // Cut (round-20): triangleCounts consumes its edge input from several
    // DAG branches across separate actions (degree aggregate, the oriented
    // cut's build join); without the cut each consumer re-ran the whole
    // collect_set + interpreted-HOF pair explosion + dedup chain
    // (profiled: the chain executed 2-3x per run). The cut frame is two
    // longs per sampled edge — block reads, not recomputes, from here on.
    val sampled = Checkpoints.cut(pairs.filter(
      TextOps.polyHash(concat_ws("#", col("a"), col("b"))) % TriBuckets < TriKeep))
    GraphOps.triangleCounts(sampled).orderBy(col("node"))
  }

  /** Jaccard threshold of the x59 prefix-filtered similarity join. */
  private val PrefixJoinT = 0.6

  /** Exact set-similarity join via prefix filtering (x59) — AllPairs
    * (Bayardo, Ma, Srikant, "Scaling Up All Pairs Similarity Search",
    * WWW 2007): order every document's shingle set by global rarity
    * (document frequency, then shingle — no global rank table, the
    * (df, shingle) tuple IS the order), keep only each document's PREFIX
    * (the `sz - ceil(t*sz) + 1` rarest shingles), and generate candidate
    * pairs by equi-joining prefixes on the shingle. Correctness theorem:
    * Jaccard >= t forces overlap >= t*|x| for BOTH sets, so two qualifying
    * sets must collide inside their prefixes — the join is EXACT, unlike
    * x06/x09's LSH (probabilistic) and without x04's ShingleDfCap
    * heuristic (hot shingles are simply never in a prefix unless they are
    * among a document's rarest, and then df-squared work is inherent).
    * Candidates verify with the true intersection over the full sets.
    *
    * Scale shape: df is a shingle-key aggregate; the rarity sort is a
    * per-document window (doc-key partitioning, row bounded by doc
    * length); candidate generation joins PREFIX tokens only — a (1-t)
    * fraction of the x04 join's input, concentrated on rare shingles, so
    * per-key fan-out stays small without any semantic cap. Verification
    * joins are candidate-sized.
    */
  private def x59(s: SparkSession, dir: String): DataFrame = {
    // No .cache() here: prefixSimilarityJoin materializes the shingle
    // frame itself (Checkpoints.cut — its three internal consumers), and
    // the between-query CacheHygiene sweep reclaims those blocks.
    val sh = plantedDocs(s, dir)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
    Dedup.prefixSimilarityJoin(sh, PrefixJoinT).orderBy(col("id1"), col("id2"))
  }

  /** Sketch size of the x60 profiler — same k as q21/q29's KMV family. */
  private val ProfK = 64

  /** Sketch-mode data profiler (x60): x55's documented "at 100 TB the
    * exact distincts swap for the KMV sketch family" made a real query.
    * Same per-column profile over `documents` and `events`, with every
    * exact COUNT(DISTINCT) replaced by the [[graft.functions.KMinValues]]
    * aggregate over [[TextOps.polyHash]] of the column's canonical string
    * form (ints/epoch-micros/micro-quantized doubles render identically in
    * both engines; H = 1e9+7, estimate (k-1)*H/kth_min). The oracle
    * reproduces the sketch EXACTLY (distinct hashes, sort, kth — the
    * q21/q29 determinism argument), so the compare is hash-exact, not
    * epsilon-judged; the ε-closeness to x55's exact answers is pinned
    * separately in SketchProfilerSpec.
    *
    * Scale shape — the whole point: x55's exact multi-distinct plans as an
    * Expand (rows × profiled columns shuffled, full document TEXTS as
    * grouping keys for the text column). Here each row contributes k-long
    * bounded sketch updates instead: ONE ObjectHashAggregate pass per
    * table, NO Expand (PlanSpec-pinned), partials k longs per column
    * regardless of input size — the profile of a trillion-row table moves
    * O(partitions × columns × k) longs.
    */
  private def x60(s: SparkSession, dir: String): DataFrame = {
    // polyHash alone is NOT estimator-grade: short strings ("311") hash to
    // tiny values, piling the k-min mass near zero and inflating the
    // estimate 1000x (caught by SketchProfilerSpec on n_chars). Compose
    // with q21's affine spreader mod P = 2^31-1 — a BIJECTION on [0, P)
    // (polyHash's range [0, 1e9+7) sits inside it), so distinct counts are
    // untouched while the k-mins become uniform on [0, P); the estimator's
    // H is therefore P, exactly as in q21/q29.
    val P = 2147483647L
    val A = 506952114L
    val B = 12345L
    def spread(h: Column): Column = (lit(A) * h + lit(B)) % lit(P)
    def est(arr: Column): Column =
      round(
        when(size(arr) < ProfK, size(arr).cast("double"))
          .otherwise(lit((ProfK - 1).toDouble * P.toDouble) / element_at(arr, ProfK).cast("double")),
        4)
    def intH(cn: String): Column = spread(TextOps.polyHash(col(cn).cast("string")))
    def strH(cn: String): Column = spread(TextOps.polyHash(col(cn)))
    // micro-quantized double: round-half-away-from-zero ties never occur
    // (values carry <= 6 decimals — the x57/Exact.dsum contract), so the
    // long is injective on the value domain and identical cross-engine
    val valH: Column =
      spread(TextOps.polyHash(round(col("value") * 1e6, 0).cast("long").cast("string")))
    val tsH: Column = spread(TextOps.polyHash(unix_micros(col("ts")).cast("string")))
    // Hashes are PROJECTED before the aggregate: count() and kmin_values()
    // both consume each hash, and ObjectHashAggregate evaluates per-
    // function inputs independently — without the projection the
    // dominant per-row cost (polyhash over full document text) runs
    // twice per row.
    def profile(df: DataFrame, cols: Seq[(String, String, Column)]): DataFrame = {
      val hashed = df.select(cols.zipWithIndex.map {
        case ((_, _, hc), i) => hc.as(s"h$i")
      }: _*)
      val named = cols.zipWithIndex.map { case ((tbl, cn, _), i) =>
        struct(
          lit(tbl).as("tbl"), lit(cn).as("col_name"),
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(s"h$i"))).cast("long").as("n_nulls"),
          graft.functions.SketchExprs.kMinValues(col(s"h$i"), ProfK).as("kmv")).as(s"p$i")
      }
      hashed.agg(named.head, named.tail: _*)
        .select(explode(array(cols.indices.map(i => col(s"p$i")): _*)).as("p"))
        .select(col("p.tbl"), col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
          est(col("p.kmv")).as("kmv_distinct"))
    }
    val docs = profile(t(s, dir, "documents"), Seq(
      ("documents", "doc_id", intH("doc_id")),
      ("documents", "lang", strH("lang")),
      ("documents", "n_chars", intH("n_chars")),
      ("documents", "source", strH("source")),
      ("documents", "text", strH("text"))))
    val evs = profile(Tables.events(s, dir), Seq(
      ("events", "event_id", intH("event_id")),
      ("events", "event_type", strH("event_type")),
      ("events", "props", strH("props")),
      ("events", "ts", tsH),
      ("events", "user_id", intH("user_id")),
      ("events", "value", valH)))
    docs.union(evs).orderBy(col("tbl"), col("col_name"))
  }

  /** Reachability-closure oracle over the FULL co-purchase graph — shared
    * by x56 (the engine recomputes from scratch) and x61 (the engine takes
    * the incremental star-forest path; the oracle is deliberately
    * coin-independent, so the row-exact compare certifies
    * components(stars ∪ delta) = components(full graph)).
    */
  private val CcOracleSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT l_suppkey * 2 AS a, o_custkey * 2 + 1 AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY l_suppkey, o_custkey
       |  HAVING count(DISTINCT l_orderkey) >= $CcMinOrders),
       |e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       |n AS (SELECT DISTINCT a AS node FROM e),
       |reach(node, lab) AS (
       |  SELECT node, node FROM n
       |  UNION
       |  SELECT e.b, reach.lab FROM reach JOIN e ON e.a = reach.node),
       |comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
       |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS comp_size
       |  FROM comp GROUP BY component)
       |SELECT c.node, c.component, s.comp_size
       |FROM comp c JOIN sz s USING (component) ORDER BY node""".stripMargin

  /** Temperature exponent / document budget of the x63 mix allocation. */
  private val MixAlpha = 0.3
  private[graft] val MixBudget = 100000L

  /** Pairwise source-distribution divergence (x62): Jensen-Shannon
    * divergence between every pair of sources' token-hash-bucket
    * distributions (256 polyHash buckets, add-one smoothing) via
    * [[CorpusMix.jsDivergenceMatrix]] — the drift diagnostic that tells a
    * curation pipeline which sources are stylistic near-duplicates and
    * which are outliers before designing the mix. One corpus-sized
    * (source, bucket) count shuffle; everything after is
    * dimension-sized.
    */
  private def x62(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("source"),
        pmod(TextOps.polyHash(col("tok")), lit(CorpusMix.Buckets.toLong)).as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    CorpusMix.jsDivergenceMatrix(counts).orderBy(col("src1"), col("src2"))
  }

  /** Token-slice modulus of the x62s probe twin: both engines keep only
    * tokens whose polyHash ≡ 0 (mod 16) before counting.
    */
  private val DivSliceMod = 16L

  /** Sliced source divergence (x62s): x62 over the 1-in-[[DivSliceMod]]
    * token-hash subsample — the divergence statistic a monitor would
    * actually compute at 100 TB (subsampling tokens by hash preserves
    * per-source style signal; the JS values differ from x62's only
    * through the subsample). Its REASON to exist is the scale gate: the
    * full x62 oracle must explode ~1B tokens through DuckDB's unnest at
    * sf100 (infeasible — the round-10 note caps it at sf10), while this
    * twin's pre-bucket filter (`pmod(polyHash(tok), 16) = 0` — the SAME
    * predicate text in both engines, applied before the count) cuts the
    * oracle's exploded row count 16x, making the sf100 row-exact compare
    * affordable. ScaleVerify carries it; logs/SCALECHECK_r12 has the row.
    */
  private def x62s(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("source"), TextOps.polyHash(col("tok")).as("h"))
      .filter(pmod(col("h"), lit(DivSliceMod)) === 0)
      .select(col("source"), pmod(col("h"), lit(CorpusMix.Buckets.toLong)).as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    CorpusMix.jsDivergenceMatrix(counts).orderBy(col("src1"), col("src2"))
  }

  /** Alpha-temperature mix allocation (x63): raw per-source document
    * counts rebalanced into an EXACT integer budget via
    * [[CorpusMix.temperatureAllocation]] (w ∝ n^0.3 upweights small
    * sources; largest-remainder apportionment makes Σ alloc == budget
    * deterministically). The complement of x29's hash-rate sampling: x29
    * decides WHICH documents survive a target rate, x63 decides HOW MANY
    * each source contributes to the next training epoch.
    */
  private def x63(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    CorpusMix.temperatureAllocation(counts, MixAlpha, MixBudget)
      .orderBy(col("source"))
  }

  /** Per-source keep threshold of the x64 calibration: docs below the
    * 20th quality percentile OF THEIR OWN SOURCE are cut.
    */
  private val CalibCut = 0.2

  /** Per-source quality calibration (x64): the exact percent_rank of
    * every document's quality score WITHIN its source, plus the keep
    * flag for a per-source bottom-20% cut. A global quality threshold
    * (x10/x35's shape) silently guts whole sources whose score
    * distribution sits low (different language, different register);
    * calibrating the cut per source keeps each source's own best 80% —
    * the standard quantile-normalization step before mixing sources.
    *
    * Scale shape: [[Ranks.groupPercentRank]] — the oracle's
    * `percent_rank() OVER (PARTITION BY source ORDER BY quality)` sorts
    * each source inside ONE window partition (a dominant source = one
    * straggler task at 100 TB); the engine reassembles the identical
    * values from a (source, bucket) histogram + within-bucket rank, so
    * the widest shuffle key is 1000x finer than the source.
    */
  private def x64(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
      TextOps.quality(col("text")).as("quality"))
    // materialize=true (round-21 A/B 1.19x): quality(text) is expensive
    // expression work and re-ran in every rank branch.
    Ranks.groupPercentRank(d, "source", "quality", materialize = true)
      .select(col("doc_id"), col("source"), col("quality"), col("pct_rank"),
        (col("pct_rank") >= CalibCut).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Train-coin modulus/threshold and keep floor of the x65 held-out
    * perplexity filter: content-hash coin < 8 of 10 trains the LM
    * (80%), the rest is scored; held-out docs whose mean bigram
    * log-probability clears the floor are kept.
    */
  private val LmSplitMod = 10
  private val LmTrainBelow = 8

  /** Sits inside the fixture's held-out score range (−3.76..−3.36 at
    * sf0.01) so the flag genuinely splits (~30% cut), with ≥3.6e-4 of
    * margin to the nearest observed mean — far above any cross-engine
    * noise on the decimal-exact average.
    */
  private val LmKeepFloor = -3.45

  /** Held-out perplexity filter (x65): the CCNet-style LM quality cut
    * with the train/serve discipline x47's SemDeDup established. x49
    * scores every document under an LM fit on the SAME corpus — fine as
    * a feature, circular as a filter (a document helps shape the model
    * that judges it). Here a deterministic content-hash coin splits the
    * corpus 80/20; unigram+bigram statistics come from the TRAIN split
    * only, and the HELD-OUT split is scored under them. Unseen held-out
    * bigrams don't drop (x49's inner join would silently skip them —
    * exactly the out-of-domain evidence a filter exists to see): the
    * interpolated backoff term floors every bigram at
    * (1-λ)·(c(cur)+1)/(T+V), so novel text scores LOW rather than not
    * at all. Output: per held-out doc WITH at least one bigram (docs of
    * fewer than 2 tokens have no bigram evidence and are absent from
    * the output by contract — a consumer wanting a default for them
    * left-joins this frame), bigram count, decimal-exact mean log-prob,
    * and the keep flag against [[LmKeepFloor]].
    *
    * Scale shape: x49's — tokenize/explode map-side, counts and scoring
    * joins all equi-keyed on tokens or (prev, cur), the totals frame a
    * broadcast scalar. The split adds one map-side hash predicate.
    */
  private def x65(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"),
      (TextOps.polyHash(concat(lit("lmsplit#"), col("text"))) % LmSplitMod).as("coin"))
    val train = docs.filter(col("coin") < LmTrainBelow)
    val held = docs.filter(col("coin") >= LmTrainBelow)
    val uni = train.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("uc"))
    val tot = uni.agg(sum(col("uc")).as("tt"), count(lit(1)).as("vv"))
    def bigrams(d: DataFrame): DataFrame = d
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(
          element_at(col("t"), i).as("prev"),
          element_at(col("t"), i + 1).as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))
    val bc = bigrams(train).groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bc"))
    // bc non-null implies prev was seen in train (pc non-null), so the
    // seen-bigram term needs only the bc guard
    val hb = bigrams(held)
      .join(bc, Seq("prev", "cur"), "left")
      .join(uni.select(col("tok").as("prev"), col("uc").as("pc")), Seq("prev"), "left")
      .join(uni.select(col("tok").as("cur"), col("uc").as("cc")), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        log(
          when(col("bc").isNotNull,
            lit(BigramLambda) * (col("bc").cast("double") / col("pc").cast("double")))
            .otherwise(lit(0.0)) +
            lit(1.0 - BigramLambda) *
              ((coalesce(col("cc"), lit(0L)) + 1L).cast("double") /
                (col("tt") + col("vv")).cast("double"))).as("lp"))
    hb.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // un-rounded on purpose — the x49 tie-hazard note applies
        graft.util.Exact.davg(col("lp"), 6).as("avg_logprob"))
      .withColumn("keep", (col("avg_logprob") >= LmKeepFloor).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Cluster canonicalization (x66): the dedup story's last step. x26
    * answers "which docs are duplicates of each other" and keeps the
    * MIN-ID member per cluster — arbitrary; a real pipeline keeps the
    * BEST copy (the clean original, not the boilerplate-wrapped scrape).
    * Over the same engineered corpus and the same exact+LSH cluster
    * machinery ([[dupLabels]]), every document gets its cluster's
    * argmax-quality representative (ties broken by min doc_id) and a
    * keep flag; singletons represent themselves.
    *
    * The argmax runs as TWO primitive-typed hash aggregates — per-cluster
    * max(quality), then min(doc_id) among the members tied at that max —
    * rather than one min(struct(-quality, doc_id)): a struct-typed
    * min/max is not hash-aggregatable in Spark and silently plans as a
    * SortAggregate (caught by this query's PlanSpec pin), while the
    * two-phase form stays in codegen'd hash aggregation on (cluster)
    * keys. No per-cluster sort or window anywhere; the serve join is
    * node-keyed. Everything else inherits x26's scale shape (banded LSH
    * equi-joins, O(diameter) label propagation with per-round lineage
    * cuts).
    */
  private def x66(s: SparkSession, dir: String): DataFrame = {
    // quality rides along from the start; the corpus is cut because the
    // edge build and the serve side both read it
    val corpus = Checkpoints.cut(dedupCorpus(s, dir)
      .withColumn("quality", TextOps.quality(col("text"))))
    // three consumers (best, the tie filter, the serve join) — cut so the
    // label join computes once
    val labeled = Checkpoints.cut(corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"), col("quality")))
    // the two-phase argmax lives in Dedup.clusterReps (null-safe tie
    // filter — an all-null-quality cluster still elects a rep)
    val reps = Dedup.clusterReps(labeled.withColumnRenamed("doc_id", "id"))
    labeled.join(reps.hint("SHUFFLE_HASH"), "cluster")
      .select(col("doc_id"), col("rep_id"), col("quality"),
        (col("doc_id") === col("rep_id")).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Eval-slice size and neighbour count of the x67 label-vote QA: a
    * FIXED-COUNT hash sample of 25 vectors is held out (not a
    * proportional slice — 5% of a 100 TB table cannot broadcast; 25
    * rows always can); each is labeled by its 10 nearest train vectors.
    */
  private val KnnEvalN = 25L
  private val KnnK = 10

  /** k-NN label-vote QA (x67): the auto-labeling / label-quality audit
    * over the embeddings table's `label` column (its first consumer).
    * A fixed-count hash-sampled eval slice is held out; each eval
    * vector is assigned the majority label of its [[KnnK]] nearest
    * TRAIN vectors by exact cosine (vote ties → smallest label,
    * neighbour-rank ties → smallest vec_id), and compared against its
    * true label. Disagreements are exactly the candidates a labeling
    * pipeline routes to review — and the aggregate accuracy is the
    * health metric for embedding/label coherence.
    *
    * The eval slice is the [[KnnEvalN]] vectors with the smallest
    * (content-hash, vec_id) — a deterministic, engine-reproducible
    * "random" sample whose SIZE is a constant, not a fraction: the
    * round-10 `vec_id % 20` slice was corpus-proportional, and
    * broadcasting 5% of a 100 TB table is terabytes. Ranking uses
    * [[Ranks.groupRowNumber]] (constant group key), so no task ever
    * sorts more than ~1/1000 of the corpus to pick the sample.
    *
    * Scale shape: the brute-force scan is (train x 25-row sample) with
    * the sample broadcast — one pass over the corpus, no shuffle of the
    * train side; the vote/argmax is the x66 two-phase hash-aggregate
    * shape on qid keys (no struct aggregates, no per-qid windows beyond
    * the bounded top-k rank). For labeling the FULL corpus at 100 TB the
    * IVF/PQ serve path (x13/x25/x28) replaces brute force; this query is
    * the exactness harness those approximations are measured against.
    */
  private def x67(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"), col("label"))
      .withColumn("_hd",
        TextOps.polyHash(concat(lit("knn#"), col("vec_id").cast("string")))
          .cast("double"))
      .withColumn("_g", pmod(coalesce(col("vec_id"), lit(0L)), lit(1L)))
    // ranked once (cut): the eval filter and its train complement would
    // otherwise each replay the two rank shuffles
    val ranked = Checkpoints.cut(
      Ranks.groupRowNumber(e, "_g", "_hd", "vec_id")
        .select(col("vec_id"), col("v"), col("label"), col("row_num")))
    val eval = ranked.filter(col("row_num") <= KnnEvalN).drop("row_num")
    val train = ranked.filter(col("row_num") > KnnEvalN).drop("row_num")
    val nn = Similarity.bruteForceTopK(
      train.select(col("vec_id"), col("v")),
      eval.select(col("vec_id"), col("v")), KnnK, dim = EmbDim)
    // Cut: the vote table's two consumers (the max and the argmax join)
    // would otherwise each replay the corpus-sized kNN scan — the
    // cut-shared-lineage convention; the cut frame is (eval x labels)-
    // sized.
    val votes = Checkpoints.cut(nn
      .join(train.select(col("vec_id"), col("label").as("nl")), "vec_id")
      .groupBy(col("qid"), col("nl")).agg(count(lit(1)).as("votes")))
    val top = votes.groupBy(col("qid")).agg(max(col("votes")).as("mv"))
    val pred = votes.join(top, "qid")
      .filter(col("votes") === col("mv"))
      .groupBy(col("qid"))
      .agg(min(col("nl")).as("pred"), max(col("mv")).as("votes"))
    eval.select(col("vec_id"), col("label"))
      .join(pred.withColumnRenamed("qid", "vec_id"), "vec_id")
      .select(col("vec_id"), col("label"), col("pred"), col("votes"),
        (col("label") === col("pred")).cast("int").as("correct"))
      .orderBy(col("vec_id"))
  }

  /** Neighbourhood size and keep floor of the x68 margin miner. */
  private val BitextK = 4
  private val BitextMarginFloor = 1.0

  /** Margin-based bitext mining (x68): the parallel-corpus construction
    * op (Artetxe & Schwenk 2019's margin criterion, the CCMatrix shape).
    * For every English document, its best Spanish candidate by exact
    * cosine is scored by margin = 2·cos(x,y) / (avgK(x) + avgK(y)) —
    * the ratio of the pair's similarity to the mean of each side's
    * [[BitextK]]-nearest cross-language neighbourhood — so a pair only
    * survives when it stands OUT of both vectors' neighbourhoods
    * (absolute-cosine thresholds fail because hub vectors are close to
    * everything). Ids align embeddings↔documents, languages come from
    * `documents.lang`.
    *
    * Determinism: cosines round to 6 (the x08 convention), the
    * neighbourhood means are decimal-exact sums over the rounded
    * cosines, and the margin is a fixed-op-order double expression —
    * hash-identical across engines with no rounding of the served
    * margin (the Exact.davg convention).
    *
    * Scale shape: one cross-language cosine grid, cut once for its
    * three consumers (best-candidate, forward and backward
    * neighbourhood means); ranks are WindowGroupLimit-pruned per-side
    * windows, means are hash aggregates on the side keys. At 100 TB the
    * grid comes from the ANN path (x13/x25) instead of the broadcast
    * brute force; the margin algebra downstream is unchanged.
    */
  private def x68(s: SparkSession, dir: String): DataFrame = {
    val langs = t(s, dir, "documents").select(col("doc_id").as("vec_id"), col("lang"))
    val em = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
      .join(langs, "vec_id")
    val en = em.filter(col("lang") === "en").select(col("vec_id").as("en_id"), col("v").as("ev"))
    val es = em.filter(col("lang") === "es").select(col("vec_id").as("es_id"), col("v").as("sv"))
    val allCos = Checkpoints.cut(en.crossJoin(broadcast(es))
      .select(col("en_id"), col("es_id"),
        round(Similarity.cosineStatic(col("ev"), col("sv"),
          Similarity.norm(col("ev"), EmbDim), Similarity.norm(col("sv"), EmbDim),
          EmbDim), 6).as("cos")))
    bitextMarginTail(allCos)
  }

  /** English-side probe width of the x68b ANN miner (the IVF recall
    * knob): each en vector searches its [[BitextNProbe]] nearest cells.
    */
  private val BitextNProbe = 4

  /** ANN-served bitext mining (x68b): the 100 TB path of x68 — the
    * identical margin algebra ([[bitextMarginTail]]), but the candidate
    * grid comes from the trained IVF index (the same persisted k-means
    * model x13/x25/x47 serve from) instead of x68's |en|×|es| broadcast
    * cosine grid. The Spanish side is ASSIGNED to its one nearest cell
    * (the index); the English side PROBES its [[BitextNProbe]] nearest
    * cells (the recall knob), and candidates are the cell equi-join
    * pairs — the only data shuffle is on cell id, and the only broadcast
    * is the fixed-k centroid model, so nothing is corpus-proportional in
    * executor memory at any scale (vs x68, whose broadcast IS the
    * Spanish corpus). At 100 TB the cell count grows with the corpus
    * (the published IVF knob) and candidate volume stays
    * ~|en| · nprobe · cell-occupancy, linear in the data.
    *
    * Semantics: margins are computed over the candidate-restricted
    * neighbourhoods — the CCMatrix construction (Schwenk et al. 2021
    * mine with FAISS-served neighbourhoods, not exact grids). Recall of
    * x68's kept pairs is measured in BitextSpec; the oracle retrains the
    * identical IVF model in SQL (the x13 unrolled-k-means trick), so the
    * PRUNED candidate set itself — not just the margin algebra — is
    * hash-checked end to end.
    */
  private def x68b(s: SparkSession, dir: String): DataFrame =
    bitextMarginTail(Checkpoints.cut(x68bCandidates(s, dir)))

  /** x68b's IVF-served candidate grid, pre-cut — exposed so PlanSpec can
    * pin the generation stage's shape (the cut hides it behind an
    * ExistingRDD in the served query's plan) and so tools.BitextTrade
    * can measure the recall/cost trade across probe widths.
    */
  private[graft] def x68bCandidates(
      s: SparkSession, dir: String, nprobe: Int = BitextNProbe): DataFrame = {
    val langs = t(s, dir, "documents").select(col("doc_id").as("vec_id"), col("lang"))
    val em = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val trained = AnnModels.ivfCentroids(s, dir, em, IvfCells, KmIters, EmbDim)
    val lem = em.join(langs, "vec_id")
    val en = lem.filter(col("lang") === "en").select(col("vec_id").as("en_id"), col("v").as("ev"))
    val es = lem.filter(col("lang") === "es").select(col("vec_id").as("es_id"), col("v").as("sv"))
    val esa = Similarity.ivfAssign(
      es, trained.select(col("cell_id").as("es_id"), col("cv").as("sv")), EmbDim, "es_id", "sv")
    val ena = Similarity.ivfProbe(
      en, trained.select(col("cell_id").as("en_id"), col("cv").as("ev")),
      EmbDim, nprobe, "en_id", "ev")
    // es lives in exactly one cell and the probed en cells are distinct
    // (row_number), so each (en_id, es_id) pair appears at most once.
    ena.join(esa, "cell_id")
      .select(col("en_id"), col("es_id"),
        round(Similarity.cosineStatic(col("ev"), col("sv"),
          Similarity.norm(col("ev"), EmbDim), Similarity.norm(col("sv"), EmbDim),
          EmbDim), 6).as("cos"))
  }

  /** The margin algebra both bitext miners share, over a (en_id, es_id,
    * cos) candidate grid: forward/backward neighbourhood ranks
    * (WindowGroupLimit-pruned), decimal-exact K-neighbourhood means,
    * margin = 2·cos / (ax + ay), keep against [[BitextMarginFloor]].
    */
  private[graft] def bitextMarginTail(allCos: DataFrame): DataFrame = {
    val wf = Window.partitionBy(col("en_id")).orderBy(col("cos").desc, col("es_id"))
    val wb = Window.partitionBy(col("es_id")).orderBy(col("cos").desc, col("en_id"))
    val fwd = allCos.withColumn("rf", row_number().over(wf))
    val top1 = fwd.filter(col("rf") === 1).select(col("en_id"), col("es_id"), col("cos"))
    val avgX = fwd.filter(col("rf") <= BitextK).groupBy(col("en_id"))
      .agg((graft.util.Exact.dsum(col("cos"), 6) / count(lit(1))).as("ax"))
    val avgY = allCos.withColumn("rb", row_number().over(wb))
      .filter(col("rb") <= BitextK).groupBy(col("es_id"))
      .agg((graft.util.Exact.dsum(col("cos"), 6) / count(lit(1))).as("ay"))
    top1.join(avgX, "en_id").join(avgY, "es_id")
      .select(col("en_id"), col("es_id"), col("cos"),
        (lit(2.0) * col("cos") / (col("ax") + col("ay"))).as("margin"))
      .withColumn("keep", (col("margin") >= BitextMarginFloor).cast("int"))
      .orderBy(col("en_id"))
  }

  /** Document budget of the x69 materialization — below the fixture
    * corpus size so the cut binds on every source.
    */
  private val MatBudget = 200L

  /** Mix materialization (x69): x63 decides HOW MANY documents each
    * source contributes; this query decides WHICH — the per-source
    * alloc-many docs with the smallest content-hash spread (a seeded,
    * engine-independent "random" sample that is reproducible run to
    * run, the x12/x29 determinism discipline). A source smaller than
    * its allocation contributes everything it has (alloc is a target,
    * not a guarantee).
    *
    * The selection primitive is [[Ranks.groupRowNumber]]: "take exactly
    * K per group" is naively `row_number() OVER (PARTITION BY source
    * ORDER BY hash)` — one window partition per source, a straggler
    * sort at 100 TB; the decomposition reassembles the identical unique
    * ranks from a (source, bucket) histogram + within-bucket
    * row_number, so no task sorts more than ~n/1000 of a source. The
    * hash (< 2^30) is exactly representable as the double the bucketing
    * runs on.
    */
  private def x69(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
      TextOps.polyHash(concat(lit("mix#"), col("text"))).cast("double").as("hd"))
    val counts = t(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val allocs = CorpusMix.temperatureAllocation(counts, MixAlpha, MatBudget)
      .select(col("source"), col("alloc"))
    Ranks.groupRowNumber(docs, "source", "hd", "doc_id")
      .join(broadcast(allocs), "source")
      .filter(col("row_num") <= col("alloc"))
      .select(col("doc_id"), col("source"), col("row_num").as("pick_rank"))
      .orderBy(col("doc_id"))
  }

  /** Corpus release diff (x70): the dataset-versioning audit every
    * corpus RELEASE ships with — which documents were added, removed,
    * changed, or untouched between version N and N+1. A simulated next
    * release (drop every 17th doc, revise every 13th survivor, add a
    * new doc for every 19th) diffs against the fixture; the diff itself
    * is version-agnostic: a doc_id-keyed full outer join comparing
    * CONTENT HASHES, so only 32-byte keys move through the shuffle —
    * never document bodies. The complement of x32's row-level CDC merge
    * at corpus granularity.
    */
  private def x70(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .union(v1.filter(col("doc_id") % 19 === 0)
        // 1e12 offset: far above any realistic corpus id, so simulated
        // additions can never collide with surviving v1 ids at larger
        // scale factors (a 1e6 offset collided beyond ~1M docs)
        .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text")))
    val a = v1.select(col("doc_id"), Dedup.contentKey(col("text")).as("h1"))
    val b = v2.select(col("doc_id"), Dedup.contentKey(col("text")).as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .orderBy(col("doc_id"))
  }

  /** Power-of-two sequence-length buckets of the x71 report, clamped to
    * [16, 4096]; longer docs truncate to the top cap.
    */
  private val PadCaps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)

  /** Padding-waste report (x71): the batch-shape diagnostic behind
    * length-bucketed training. Each doc lands in the smallest
    * power-of-two token cap that holds it; per bucket the report gives
    * doc count, real tokens, padding (cap·docs − tokens) and the waste
    * ratio — the number a pipeline minimizes when tuning bucket
    * boundaries vs x20's packing. The cap is a literal comparison
    * chain, NOT 2^ceil(log2 n): the libm form has knife edges at exact
    * powers of two, exactly the values the buckets sit on.
    *
    * One map-side expression pass + one 9-key hash aggregate; the waste
    * ratio is an integer-over-integer double division (hash-exact).
    */
  private def x71(s: SparkSession, dir: String): DataFrame = {
    val n = TextOps.bpeTokenCount(col("text"))
    val cap = PadCaps.init.foldRight(lit(PadCaps.last): Column)(
      (c, acc) => when(n <= c, lit(c)).otherwise(acc))
    t(s, dir, "documents")
      .select(cap.as("cap"), least(n, lit(PadCaps.last)).cast("long").as("tok"))
      .groupBy(col("cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
      .select(col("cap"), col("n_docs"), col("tokens"),
        (col("cap") * col("n_docs") - col("tokens")).as("padding"),
        ((col("cap") * col("n_docs") - col("tokens")).cast("double") /
          (col("cap") * col("n_docs")).cast("double")).as("waste_ratio"))
      .orderBy(col("cap"))
  }

  /** HTML/boilerplate main-text extraction (x72): the stage-0 of every
    * web-corpus pipeline — raw HTML in, main text out — over
    * [[TextOps.htmlMainText]]'s block/link-density machinery. The
    * corpus has no HTML, so a deterministic page is PLANTED around each
    * document's text (the x18 PII-planting discipline): head with
    * title/style/script, a pure-link nav bar, an h1, the document text
    * as the main paragraph, a link-heavy related-links block on every
    * 5th doc, an UNCLOSED paragraph on every 7th (malformed nesting —
    * block splitting on closers degrades it to a merge with the footer,
    * no parser state to corrupt), and a link-dense footer.
    *
    * The extractor must: drop script/style/comments wholesale, split on
    * closing block tags, strip residual tags, decode entities, collapse
    * whitespace, and drop boilerplate by integer link-density
    * (linked chars * 2 > visible chars). Verified by fingerprint: the
    * polyHash of the extracted main text proves byte-identical
    * extraction without shipping full texts through the compare.
    *
    * Scale shape: map-only — one expression pass fused into the scan,
    * ORDER BY aside; no shuffle, no join, no aggregate (PlanSpec pins
    * ≤1 exchange, the final sort's range partitioning).
    */
  private def x72(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><style>body {color: #222}</style><script>var id = "), id,
      lit(";</script></head><body>" +
        "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></div>" +
        "<h1>Doc "), id, lit("</h1><p>"), col("text"),
      // entity-bearing tail on every 3rd doc: the decode order
      // (&amp; last, after tag stripping) is exercised through the
      // fingerprint compare, not just the unit spec
      when(col("doc_id") % 3 === 0,
        lit(" tail &quot;q&quot; &amp;lt;esc&amp;gt; &lt;i&gt; x&nbsp;y"))
        .otherwise(lit("")),
      lit("</p>"),
      when(col("doc_id") % 5 === 0,
        lit("<p>Related: <a href=\"/r1\">first link text</a> and " +
          "<a href=\"/r2\">second much longer link text here</a> end</p>"))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit("<p>trailing malformed <b>bold text without closing tags"))
        .otherwise(lit("")),
      lit("<div class=\"footer\"><a href=\"/terms\">Terms of Service</a> " +
        "<a href=\"/privacy\">Privacy Policy</a> (c)</div></body></html>"))
    // Widened (round-21, guide §2.5): the block-split + link-density
    // machinery is the heaviest per-row expression work in the suite and
    // ran as one task on the single-split documents scan (profiled: two
    // ~1 s single-task jobs were the whole query). No-op at real corpus
    // width; the PlanSpec pin carries the widen exchange.
    graft.util.Width.atLeastCores(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .withColumn("_blocks", TextOps.htmlBlocks(html))
      .withColumn("_ne", filter(col("_blocks"), b => length(b("t")) > 0))
      .withColumn("_kept", filter(col("_ne"), TextOps.htmlKeepBlock _))
      .withColumn("_main", array_join(transform(col("_kept"), b => b("t")), " "))
      .select(col("doc_id"),
        size(col("_ne")).cast("long").as("n_blocks"),
        size(col("_kept")).cast("long").as("n_kept"),
        length(col("_main")).cast("long").as("main_chars"),
        TextOps.polyHash(col("_main")).as("main_fp"))
      .orderBy(col("doc_id"))
  }

  /** Tracking-parameter prefix dropped by the x73 canonicalizer. */
  // Aliased from the engine-side op so the oracle regex can never desync
  // from what UrlOps.canonCols actually strips.
  private val UrlTrackRe = graft.ops.UrlOps.TrackRe

  /** URL canonicalization + dedup (x73): stage-0 of every web-corpus
    * pipeline — CommonCrawl-style ingest dedupes by CANONICAL URL before
    * any content hash is computed, because the same page arrives under
    * scheme/host case variants, explicit default ports, `www.` prefixes,
    * tracking parameters, reordered query strings, trailing slashes, and
    * fragments. Each document synthesizes a deterministic messy URL
    * (seven independent variant axes keyed off doc_id residues — the x72
    * synthesis discipline, so the oracle builds the byte-identical
    * input); the canonical form lowercases scheme+host, strips `www.`
    * and default ports (443/https, 80/http), drops the fragment, strips
    * trailing path slashes (root stays `/`), removes `utm_*` params, and
    * byte-sorts the survivors. Dedup = one hash aggregate on the
    * canonical string: variant count and the kept (min) doc id.
    *
    * Scale shape: canonicalization is pure per-row Column work fused
    * into the scan (regex extract/replace + array filter/sort — all
    * codegen'd built-ins, RE2-safe patterns so DuckDB applies the
    * identical bytes); the only shuffle is the (canon_url) hash
    * aggregate with map-side combine. No UDF, no driver work, map+agg
    * at any corpus size.
    */
  private def x73(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(
      when(id % 7 === 0, lit("HTTPS")).otherwise(lit("https")), lit("://"),
      when(id % 2 === 0, lit("www.")).otherwise(lit("")),
      when(id % 3 === 0, upper(col("source"))).otherwise(col("source")),
      lit(".example"),
      when(id % 5 === 0, lit(".COM")).otherwise(lit(".com")),
      when(id % 4 === 0, lit(":443")).otherwise(lit("")),
      lit("/docs/"), (id % 50).cast("string"),
      when(id % 6 === 0, lit("/")).otherwise(lit("")),
      lit("?"),
      when(id % 2 === 0,
        concat(lit("a=1&utm_source=feed&id="), (id % 20).cast("string")))
        .otherwise(concat(lit("id="), (id % 20).cast("string"), lit("&a=1"))),
      when(id % 9 === 0, lit("#top")).otherwise(lit("")))
    val u = t(s, dir, "documents").select(col("doc_id"), col("source"))
      .withColumn("url", url)
    val (canon, host) = UrlOps.canonCols(col("url"))
    u.select(col("doc_id"), canon.as("canon_url"), host.as("host"))
      .groupBy(col("canon_url"), col("host"))
      .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("canon_url"))
  }

  /** Documents whose line appears in more than this many docs are
    * boilerplate (the x74 df cap).
    */
  private val LineDfCap = 5L

  /** Line-level boilerplate dedup (x74): the CCNet line-dedup stage —
    * lines repeated across many documents (headers, footers, cookie
    * banners, nav text) are removed from EVERY document, keeping each
    * doc's unique prose. Boilerplate is planted deterministically (a
    * shared header on every 2nd doc, a shared footer on every 3rd, so
    * their document frequency far exceeds [[LineDfCap]] while real
    * content lines stay df=1), then: posexplode the line split, count
    * each line's distinct-document frequency, drop lines above the cap,
    * and reassemble surviving lines in document order with a
    * fingerprint over the cleaned text.
    *
    * Scale shape: two corpus-sized shuffles — the (line) df aggregate
    * (map-side combined; the key is the line's polyHash, 8 bytes, never
    * the line text) and the per-doc reassembly aggregate on doc_id. The
    * df frame joins back by hash equi-join. collect_list holds ONE
    * document's lines (the packing bound every reassembly in this suite
    * shares). Hash collisions: polyHash is the suite-wide content key
    * (x03's convention) — a collision conflates two lines' df counts,
    * the standard trade every hash-keyed dedup makes; the oracle uses
    * the identical hash, so the compare is exact.
    */
  private def x74(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .withColumn("_t", concat(
        when(col("doc_id") % 2 === 0,
          lit("Subscribe to our newsletter for updates\n")).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 3 === 0,
          lit("\nAll rights reserved - terms apply")).otherwise(lit(""))))
    val lines = d
      .select(col("doc_id"), posexplode(split(col("_t"), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", TextOps.polyHash(col("line")))
    val df = lines.groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
    lines.join(df, "lh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("line_df") <= LineDfCap).cast("long")).as("n_kept"),
        TextOps.polyHash(array_join(transform(
          array_sort(collect_list(when(col("line_df") <= LineDfCap,
            struct(col("pos"), col("line"))))),
          e => e.getField("line")), "\n")).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  /** Fixed IPF round count of x75 (convergence is geometric; three
    * alternating projections land within ~1e-3 of both marginals on the
    * fixture, and a FIXED count keeps both engines bit-aligned).
    */
  private val IpfRounds = 3

  /** 2-D mix design via iterative proportional fitting (x75): x63
    * apportions a budget over ONE dimension; real mix design must hit
    * marginal targets on TWO at once (per-language and per-source
    * quotas, each temperature-allocated with the x63 kernel), which no
    * independent per-dimension split can satisfy — the classic raking
    * problem (Deming & Stephan 1940; survey raking / matrix balancing).
    * Starting from the observed (lang, source) cell counts, each round
    * rescales rows to the language targets then columns to the source
    * targets; [[IpfRounds]] alternating projections converge to the
    * max-entropy table with (approximately) both marginals.
    *
    * Determinism: the targets are x63's exact-integer allocations; each
    * half-round's marginal sums are decimal-exact ([[graft.util.Exact]]
    * scale-12 quantization), every rescaled cell re-quantizes at scale
    * 12 (the x62 discipline — ties at the served round-6 digit are
    * ~1e-6-rare), and the scale factor applies as `q * (target / m)` in
    * both engines, so the oracle (which unrolls the identical rounds in
    * SQL) hash-matches the served quotas.
    *
    * Scale shape: ONE corpus scan (the (lang, source) cell count, cut);
    * every subsequent frame is dimension-sized (|langs| x |sources|
    * cells), targets broadcast, and each half-round is a histogram
    * aggregate + broadcast join — at 100 TB the iteration cost is
    * independent of corpus size.
    */
  private def x75(s: SparkSession, dir: String): DataFrame = {
    val cells = Checkpoints.cut(t(s, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_docs")))
    val langT = CorpusMix.temperatureAllocation(
      cells.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
        .select(col("lang").as("source"), col("n_docs")),
      MixAlpha, MixBudget)
      .select(col("source").as("lang"), col("alloc").as("lt"))
    val srcT = CorpusMix.temperatureAllocation(
      cells.groupBy(col("source")).agg(sum(col("n_docs")).as("n_docs")),
      MixAlpha, MixBudget)
      .select(col("source"), col("alloc").as("st"))
    def quant(c: Column): Column = c.cast(DecimalType(18, 12)).cast("double")
    // Raking rounds as WINDOW sums (round-20 optimization): each half-round
    // used to aggregate the marginal into a 1-per-key frame and broadcast-
    // join it back — six sequential broadcast builds whose nested subplans
    // Catalyst re-planned per build (the query was ~73% driver planning
    // time, 36 jobs). sum() OVER (PARTITION BY lang/source) attaches the
    // SAME decimal-exact marginal (decimal sums are order-independent, so
    // the window total equals Exact.dsum bit for bit) to every cell in one
    // plan: 6 dimension-sized exchanges chained in a single job, no
    // broadcasts, identical quotas. The oracle's unrolled SQL is untouched.
    def marginal(k: String): Column =
      sum(col("q").cast(DecimalType(18, 12))).over(Window.partitionBy(col(k)))
        .cast("double")
    var q = cells
      .join(broadcast(langT), "lang").join(broadcast(srcT), "source")
      .select(col("lang"), col("source"), col("n_docs"), col("lt"), col("st"),
        col("n_docs").cast("double").as("q"))
    for (_ <- 0 until IpfRounds) {
      q = q.withColumn("q", quant(col("q") * (col("lt").cast("double") / marginal("lang"))))
      q = q.withColumn("q", quant(col("q") * (col("st").cast("double") / marginal("source"))))
    }
    q.select(col("lang"), col("source"), col("n_docs"), col("lt"), col("st"),
      round(col("q"), 6).as("quota"))
      .orderBy(col("lang"), col("source"))
  }

  /** Leakage-safe train/val/test split (x76): x12 splits on a per-doc
    * content-hash coin — correct for i.i.d. corpora, WRONG once
    * near-duplicates exist: two near-dups can land in different splits
    * and the model "generalizes" onto paraphrases of its own training
    * data (the eval-leakage failure decontamination audits like x24
    * detect AFTER the fact; this op prevents it at split time — the
    * group-aware split every serious corpus release runs). The coin is
    * therefore hashed on the duplicate CLUSTER's canonical id (the same
    * exact+LSH label propagation x26/x66 serve), so a whole near-dup
    * cluster moves between splits atomically; singletons hash on their
    * own id, identical in spirit to x12's coin for the i.i.d. majority.
    *
    * Output also reports `torn`: whether the naive per-doc coin would
    * have split this doc away from its cluster — the measured leakage
    * the op prevented (non-zero by construction on the planted-dup
    * corpus; DedupSpec-style invariant pinned in GraftExtensionsSpec:
    * same cluster ⟹ same split, always).
    *
    * Scale shape: the cluster stages are x26's (bucketed candidates,
    * bounded propagation — no quadratic stage); the split itself adds
    * one map-side hash per row and nothing else. At 100 TB the split is
    * as cheap as the dedup pipeline it rides on.
    */
  private def x76(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir))
    val labeled = corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"))
    def coin(c: Column): Column =
      pmod(TextOps.polyHash(concat(lit("split#"), c.cast("string"))), lit(100L))
    def splitOf(b: Column): Column =
      when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test"))
    labeled.select(col("doc_id"), col("cluster"),
      splitOf(coin(col("cluster"))).as("split"),
      (splitOf(coin(col("cluster"))) =!= splitOf(coin(col("doc_id"))))
        .cast("int").as("torn"))
      .orderBy(col("doc_id"))
  }

  /** Curation-funnel accounting (x77): the docs/tokens ledger every
    * corpus release ships — how much each curation stage removes, in
    * both documents and tokens, over the planted-duplicate corpus:
    *
    *   0 ingest → 1 exact dedup (content-hash group min) → 2 near dedup
    *   (x26's exact+LSH cluster labels, keep the cluster's min surviving
    *   id) → 3 quality gate (the x02 score at the ingest threshold 0.5).
    *
    * Each stage's survivors feed the next, and every row reports the
    * docs/tokens REMOVED vs the previous stage — the "where did my
    * corpus go" audit whose absence makes pipeline regressions invisible
    * (a dedup bug shows up as a wrong funnel row long before eval moves).
    * Composes the already-verified kernels (contentKey, dupLabels,
    * wsTokenCount, quality) rather than re-deriving them, so the funnel
    * numbers are consistent-by-construction with x03/x26/x02.
    *
    * Scale shape: the cluster stages are x26's; the ledger adds one
    * window-min per stage key (hash / cluster — both WindowGroupLimit-
    * free but bounded: a partition is one duplicate group) and four
    * dimension-sized aggregate rows. The 4-row lag window partitions on
    * the x63 non-foldable-constant trick.
    */
  private def x77(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir)
      .withColumn("tok", TextOps.wsTokenCount(col("text")))
      .withColumn("q", TextOps.quality(col("text"))))
    val s1 = corpus
      .withColumn("m",
        min(col("doc_id")).over(Window.partitionBy(Dedup.contentKey(col("text")))))
      .filter(col("doc_id") === col("m")).drop("m")
    val s1c = s1
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("label"), col("doc_id")))
    val s2 = s1c
      .withColumn("cm", min(col("doc_id")).over(Window.partitionBy(col("cluster"))))
      .filter(col("doc_id") === col("cm"))
    val s3 = s2.filter(col("q") >= 0.5)
    def stat(df: DataFrame, id: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
        .select(lit(id).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))
    val st = stat(corpus, 0, "ingest")
      .union(stat(s1, 1, "exact_dedup"))
      .union(stat(s2, 2, "near_dedup"))
      .union(stat(s3, 3, "quality_gate"))
    val onePart = pmod(coalesce(col("stage"), lit(0)), lit(1))
    val w = Window.partitionBy(onePart).orderBy(col("stage"))
    st.select(col("stage").cast("long").as("stage"), col("stage_name"),
      col("n_docs"), col("n_tokens"),
      coalesce(lag(col("n_docs"), 1).over(w) - col("n_docs"), lit(0L)).as("removed_docs"),
      coalesce(lag(col("n_tokens"), 1).over(w) - col("n_tokens"), lit(0L)).as("removed_tokens"))
      .orderBy(col("stage"))
  }

  /** Vector budget of the x78 semantic mix — below the fixture corpus
    * size so the per-cell cut binds.
    */
  private val SemMixBudget = 500L

  /** Cluster-balanced semantic corpus selection (x78): the D4 shape
    * (Tirumala et al. 2023 — diversify pretraining data by sampling
    * across EMBEDDING clusters instead of metadata): x63/x69 rebalance
    * by source labels, but label-free corpora (crawls) need the same
    * rebalancing in semantic space. The corpus's trained IVF cells (the
    * same persisted k-means index x13/x25/x47/x68b serve) stand in for
    * sources: per-cell counts get the exact x63 temperature allocation
    * (upweighting small semantic clusters — diversity), and each cell
    * contributes its alloc-many members with the smallest content hash
    * (the x69 deterministic-pick discipline via
    * [[Ranks.groupRowNumber]], so no task sorts more than ~1/1000 of a
    * cell). Cell ids cross the allocation kernel as STRINGS (its source
    * key), so the largest-remainder tiebreak compares identically in
    * both engines.
    *
    * Scale shape: one broadcast-model assignment pass over the corpus
    * (k-row centroid model — nothing data-sized), a cell-count
    * histogram, the dimension-sized allocation, and the bucket-
    * decomposed per-cell pick. At 100 TB the cell count grows with the
    * corpus (the IVF knob), keeping every per-cell stage bounded.
    */
  private def x78(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val assigned = Checkpoints.cut(Similarity.ivfAssign(
      e, trained.select(col("cell_id").as("vec_id"), col("cv").as("v")), EmbDim)
      .select(col("vec_id"), col("cell_id")))
    val counts = assigned.groupBy(col("cell_id")).agg(count(lit(1)).as("n_docs"))
      .select(col("cell_id").cast("string").as("source"), col("n_docs"))
    val allocs = CorpusMix.temperatureAllocation(counts, MixAlpha, SemMixBudget)
      .select(col("source").cast("long").as("cell_id"), col("alloc"))
    val ranked = Ranks.groupRowNumber(
      assigned.withColumn("hd",
        TextOps.polyHash(concat(lit("semmix#"), col("vec_id").cast("string")))
          .cast("double")),
      "cell_id", "hd", "vec_id")
    ranked.join(broadcast(allocs), "cell_id")
      .filter(col("row_num") <= col("alloc"))
      .select(col("vec_id"), col("cell_id"), col("row_num").as("pick_rank"))
      .orderBy(col("vec_id"))
  }

  /** n-gram width of the x79 duplication-rate metric (Lee et al. use
    * 50-token windows on web text; the fixture's short word-salad docs
    * need a width that actually occurs, and 5 matches the suite's
    * shingle/decontamination convention).
    */
  private val DupNgramN = 5

  /** Corpus duplicate-n-gram rate (x79): the corpus-health metric of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better") — the fraction of n-gram POSITIONS whose n-gram
    * occurs more than once corpus-wide, reported per source. Document-
    * level dedup (x03/x06) can pass a corpus whose token stream is
    * still heavily repeated (boilerplate, templates, quotations); this
    * is the number that exposes it, and the one a dedup pipeline
    * reports before/after to prove it worked. Positions are POSITIONAL
    * n-grams (not the distinct shingle set — within-doc repetition
    * counts, per the metric's definition). Duplication is planted
    * (every 7th doc re-added verbatim under a shifted id — 7 is coprime
    * with the fixture's source-assignment period, so the plant spreads
    * across sources instead of saturating those whose ids it divides)
    * since natural 5-gram collisions in word salad are ~zero.
    *
    * Scale shape: one explode to (source, gram-hash) positions — the
    * shuffle key is the 8-byte polyHash, never gram text — cut once for
    * its two consumers (the global occurrence count and the join back),
    * then a map-side-combined count and a source-keyed aggregate. Two
    * corpus-sized hash shuffles, no joins wider than the position
    * stream, at any corpus size.
    */
  private def x79(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val corpus = base.union(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("source"), col("text")))
    val pos = Checkpoints.cut(corpus
      .select(col("source"), TextOps.tokens(col("text")).as("_tk"))
      .select(col("source"),
        explode(TextOps.positionalGramHashesOfTokens(col("_tk"), DupNgramN)).as("gh")))
    val cnt = pos.groupBy(col("gh")).agg(count(lit(1)).as("n"))
    pos.join(cnt, "gh")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_positions"),
        sum((col("n") > 1).cast("long")).as("n_dup_positions"))
      .select(col("source"), col("n_positions"), col("n_dup_positions"),
        round(col("n_dup_positions").cast("double") / col("n_positions").cast("double"), 6)
          .as("dup_rate"))
      .orderBy(col("source"))
  }

  /** x80 knobs: step size on the excess loss, uniform smoothing mass
    * (DoReMi's regularizer toward uniform), kept mass 1-smooth written as
    * an explicit literal so both engines parse the identical constant,
    * and the token budget the final weights apportion.
    */
  private val DoremiEta = 1.0
  private val DoremiSmooth = 0.1
  private val DoremiKeep = 0.9
  private val DoremiBudget = 100000L

  /** Domain reweighting by excess loss (x80) — the DoReMi shape (Xie et
    * al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining"): domains whose own distribution is hardest for the
    * REFERENCE model get upweighted. The full method trains a proxy
    * model; the pipeline-engine reduction uses the engine's own LM
    * kernels: reference = the corpus-wide unigram LM (x22), per-domain
    * model = each source's own unigram LM, and the per-domain excess loss
    * is the token-position mean of (ln p_source - ln p_global) — exactly
    * KL(p_source || p_global), the "how much does the reference underfit
    * this domain" number (nonnegative by Gibbs' inequality). Weights are
    * the exponentiated-gradient update smoothed toward uniform
    * (alpha = 0.9*softmax + 0.1*uniform, DoReMi eq. 2's regularizer),
    * then the budget apportions through the shared largest-remainder
    * kernel ([[CorpusMix.remainderAllocation]] — x63/x75/x78's integer
    * tail), so Σ alloc == budget exactly.
    *
    * Determinism discipline: ln ratios ride as doubles but every
    * cross-engine sum quantizes per-row at scale 6 before a decimal-exact
    * aggregate (the x22/x62 rule); `excess` is served un-rounded (exact
    * decimal / long — bit-identical by construction, and rounding a
    * decimal-exact mean lands on .5 ties, the x22 lesson); exp's libm
    * noise is rounded at 6 before the weight floor, far from knife edges.
    *
    * Scale shape: ONE corpus-sized shuffle (the (source, token) count);
    * everything downstream is vocab-sized (the token join) or
    * dimension-sized (sources). The decimal(18,6) position sums hold
    * ~1e12 magnitude — 1e11 tokens x |d| <= 15 at 100 TB fits the
    * internal decimal(28,6) accumulator with headroom.
    */
  private def x80(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
    val st = Checkpoints.cut(
      tok.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("sc")))
    val g = st.groupBy(col("tok")).agg(sum(col("sc")).as("gc"))
    val stot = st.groupBy(col("source")).agg(sum(col("sc")).as("stot"))
    val gt = g.agg(sum(col("gc")).cast("long").as("gt"))
    val d = st.join(g, "tok").join(broadcast(stot), "source").crossJoin(broadcast(gt))
      .select(col("source"), col("sc"),
        (log(col("sc").cast("double") / col("stot").cast("double"))
          - log(col("gc").cast("double") / col("gt").cast("double"))).as("d"))
    val ex = d.groupBy(col("source")).agg(
      (sum((col("d") * col("sc").cast("double")).cast(DecimalType(18, 6))).cast("double")
        / sum(col("sc")).cast("double")).as("excess"))
    val u = ex.select(col("source"), col("excess"),
      round(exp(lit(DoremiEta) * col("excess")), 6).as("u"))
    val uu = u.agg(
      sum(col("u").cast(DecimalType(18, 6))).cast("double").as("usum"),
      count(lit(1)).as("k"))
    val weighted = u.crossJoin(broadcast(uu)).select(
      col("source"), col("excess"),
      floor((lit(DoremiKeep) * col("u") / col("usum")
        + lit(DoremiSmooth) / col("k").cast("double")) * lit(1e9)).cast("long").as("w"))
    val nd = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    CorpusMix.remainderAllocation(
      Checkpoints.cut(weighted.join(nd, "source")), DoremiBudget)
      .select(col("source"), col("n_docs"), col("excess"), col("w"), col("alloc"))
      .orderBy(col("source"))
  }

  /** Tokenizer-fertility audit per language (x81): tokens-per-word
    * (fertility) and bytes-per-token under the SAME persisted BPE
    * vocabulary x45/x46 train/serve ([[bpeMergedVocab]]) — the tokenizer-
    * equity table every multilingual corpus release ships (a language
    * with 2x fertility burns 2x context budget per word, so its
    * effective token quota is half of what the mix design says; this is
    * the number that feeds back into x63/x75's budgets). n_bytes counts
    * UTF-8 bytes (Spark `octet_length` == DuckDB `strlen`); the ratios
    * are integer/integer double divisions — bit-identical cross-engine,
    * served un-rounded (the davg rule: rounding exact ratios lands on
    * .5 ties).
    *
    * Scale shape: one corpus-sized (lang, word) explode into a
    * vocab-keyed equi-join against the persisted merge table (vocab-
    * sized, broadcastable at real scale), then a dimension-sized
    * aggregate. No window, no pair space.
    */
  private def x81(s: SparkSession, dir: String): DataFrame = {
    val docWords = t(s, dir, "documents")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
    val tokCounts = bpeMergedVocab(s, dir).select(
      col("w"),
      size(filter(split(trim(col("sym")), " "), c => c =!= "")).cast("long").as("ntok"))
    docWords.join(tokCounts, "w")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("ntok")).as("bpe_tokens"),
        sum(octet_length(col("w"))).cast("long").as("n_bytes"))
      .select(col("lang"), col("n_words"), col("bpe_tokens"), col("n_bytes"),
        (col("bpe_tokens").cast("double") / col("n_words").cast("double")).as("fertility"),
        (col("n_bytes").cast("double") / col("bpe_tokens").cast("double")).as("bytes_per_token"))
      .orderBy(col("lang"))
  }

  /** Zipf fit rank depth: the head of the rank-frequency curve both
    * engines regress over (top-k per source by term frequency).
    */
  private val ZipfTopK = 500

  /** Corpus-health statistics per source (x82): type-token ratio and the
    * Zipf slope — the least-squares slope of ln(frequency) on ln(rank)
    * over the top-[[ZipfTopK]] vocabulary. Natural text tracks Zipf's law
    * (slope ~ -1); templated/boilerplate-heavy or synthetic sources bend
    * the curve, so the slope is the one-number "does this source look
    * like language" screen (x79's positional dup rate catches verbatim
    * repetition; this catches distributional weirdness).
    *
    * Determinism discipline: ln outputs (the only libm values) are
    * rounded at 12 and quantized to decimal(18,12) per row; every
    * regression sum is then decimal-exact (products at scale 24, within
    * Spark's exact decimal(37,24) and DuckDB's (36,24)); the slope
    * assembles from those identical doubles but is served ROUNDED at 6 —
    * the multiply-subtract chain is genuine cross-engine noise (DuckDB
    * contracts it, Java doesn't; measured 1e-14 apart). ttr is an
    * integer/integer double division, served un-rounded.
    *
    * Scale shape: one (source, token) count (corpus-sized shuffle,
    * map-side combined), then the per-source top-k window — rank <= k
    * over frequency, which WindowGroupLimit bounds to k rows per
    * partition map-side before the shuffle — and dimension-sized sums.
    */
  private def x82(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
    val tf = Checkpoints.cut(
      tok.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("f")))
    val totals = tf.groupBy(col("source")).agg(
      count(lit(1)).as("n_types"), sum(col("f")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("f").desc, col("tok"))
    val top = tf.withColumn("r", row_number().over(w)).filter(col("r") <= ZipfTopK)
    val xy = top.select(col("source"),
      round(log(col("r").cast("double")), 12).cast(DecimalType(18, 12)).as("x"),
      round(log(col("f").cast("double")), 12).cast(DecimalType(18, 12)).as("y"))
    val sums = xy.groupBy(col("source")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    sums.join(totals, "source").select(
      col("source"), col("n_types"), col("n_tokens"),
      (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"),
      // rounded: the assembly arithmetic is genuine cross-engine noise
      // (DuckDB contracts the multiply-subtract chain, Java doesn't —
      // measured 1e-14 apart at sf0.01), the sanctioned rounding case
      round((col("n") * col("sxy") - col("sx") * col("sy"))
        / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"))
      .orderBy(col("source"))
  }

  /** Duplicate-cluster size ledger (x83): the distribution behind x26's
    * dedup — for each cluster size k, how many clusters and how many
    * documents sit in clusters of that size, plus each row's share of
    * the corpus. The dedup-health twin of the x77 funnel: x77 says how
    * many docs the near-dedup stage removed, this says HOW they clump
    * (one mega-cluster of boilerplate vs many pairs needs a different
    * fix), and a dedup regression shows up as mass moving between rows.
    * Reuses the x26/x66/x76 cluster labels verbatim, so the ledger is
    * consistent-by-construction with the pipeline it audits.
    *
    * Scale shape: x26's label propagation plus two hash aggregates
    * (cluster -> size, size -> histogram); output is bounded by the
    * largest cluster size.
    */
  private def x83(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir))
    val labeled = corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"))
    val sizes = labeled.groupBy(col("cluster")).agg(count(lit(1)).as("k"))
    // materialized: the histogram feeds BOTH the total and the join —
    // uncut, the label-propagation DAG above would execute twice
    // (measured 4.3 s -> 2.4 s at sf0.1, and 4x worse at 200 partitions)
    val hist = Checkpoints.cut(sizes.groupBy(col("k"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("k")).as("n_docs")))
    val tot = hist.agg(sum(col("n_docs")).cast("long").as("total"))
    hist.crossJoin(broadcast(tot))
      .select(col("k").as("cluster_size"), col("n_clusters"), col("n_docs"),
        (col("n_docs").cast("double") / col("total").cast("double")).as("pct_of_corpus"))
      .orderBy(col("cluster_size"))
  }

  /** CCNet perplexity buckets (x84) — the Wenzek et al. 2020 shape: rank
    * every document by language-model score WITHIN its language and cut
    * head/middle/tail terciles. CCNet ranks by KenLM perplexity; the
    * engine reduction ranks by x22's exact unigram avg-logprob (higher =
    * head), and the per-language percent rank is the hardened bucket
    * decomposition ([[Ranks.groupPercentRank]] — x64's machinery), so no
    * language becomes a single straggler window partition at 100 TB.
    * The tercile cuts compare the deterministic pct_rank against
    * 2.0/3.0 and 1.0/3.0, literal double divisions both engines compute
    * identically. Docs whose language LM score is tied bucket together
    * (percent_rank tie semantics match cross-engine by x64 precedent).
    *
    * Scale shape: x22's LM join (corpus-sized tokenize + vocab join) +
    * the bucket-decomposed ranks — the widest shuffle key is
    * (lang, bucket), 1000x finer than the language.
    */
  private def x84(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("tc"))
    val total = vocab.agg(sum(col("tc")).as("tt"))
    val lp = tok.join(vocab, "tok").crossJoin(broadcast(total))
      .select(col("doc_id"),
        log(col("tc").cast("double") / col("tt").cast("double")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(graft.util.Exact.davg(col("lp"), 6).as("avg_logprob"))
    // materialized: Ranks' bucket decomposition reads its input several
    // times (stats, bucketing, histogram); x64's input is a cheap map so
    // replay is free there, but this one is the whole LM join DAG
    val d = Checkpoints.cut(
      docs.select(col("doc_id"), col("lang")).join(lp, "doc_id"))
    Ranks.groupPercentRank(d, "lang", "avg_logprob")
      .select(col("doc_id"), col("lang"), col("avg_logprob"), col("pct_rank"),
        when(col("pct_rank") >= lit(2.0) / lit(3.0), lit("head"))
          .when(col("pct_rank") >= lit(1.0) / lit(3.0), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing window: over [[DupNgramN]]-token gram hashes, guarantee
    * one fingerprint per [[WinnowW]] consecutive grams.
    */
  private val WinnowW = 4

  /** Winnowing document fingerprints (x85) — Schleimer et al. 2003 (the
    * MOSS algorithm): slide a [[WinnowW]]-gram window over each
    * document's positional [[DupNgramN]]-gram hashes and keep the
    * window's minimum hash, rightmost position on ties; recording each
    * selected position once gives a fingerprint set with density
    * ~2/(w+1) and the guarantee that any shared run of
    * w + ngram - 1 tokens yields at least one MATCHING fingerprint —
    * the bounded-size sketch for passage-level overlap that x44's exact
    * span join detects in full. Fingerprints are (doc_id, pos, gh), so
    * downstream dedup joins on gh exactly like the x06/x42 band buckets.
    *
    * Both engines compute the window argmin as scalar expressions over
    * `lead` columns (w is a small constant), so selection — including
    * the rightmost-tie rule — is deterministic and hash-checked; docs
    * with fewer than w grams yield no fingerprints (documented MOSS
    * edge). Scale shape: per-document ordered windows (a doc bounds the
    * partition), one distinct on (doc, pos) — no pair space, no
    * corpus-sized window.
    */
  private def x85(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text", DupNgramN, WinnowW)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("pos"))

  /** Gopher-rule thresholds (Rae et al. 2021, MassiveText filtering,
    * table A1): word-count bounds, mean-word-length band, symbol- and
    * bullet-density caps, alphabetic-word floor, stopword floor.
    */
  private val GopherMinWords = 50L
  private val GopherMaxWords = 100000L

  /** Planted rule violations (one per rule, ids 500001+): the fixture is
    * uniform word salad, so without plants several rules would never
    * fire and a broken comparison would pass vacuously. Built from
    * repeat/concat algebra so the oracle synthesizes identical bytes.
    */
  private val GopherShort = "tiny doc with too few words to pass the gate"
  private val GopherSymbols = ("#### " * 60).trim
  private val GopherLongWords =
    ("pneumonoultramicroscopicsilicovolcanoconiosis " * 60).trim
  private val GopherBullets =
    "- item alpha beta gamma delta epsilon zeta eta theta iota\n" * 60
  private val GopherNoStop = ("zebra quokka wombat capybara axolotl " * 12).trim
  private val GopherEllipsis =
    "the quick brown fox jumps over something here today ...\n" * 10

  /** Gopher quality-rule filter (x86): the published MassiveText rule
    * set as one map-only decision surface — per document, every rule's
    * measurement, its violation flag, and the final keep bit, so the
    * DECISION (not just a score) is hash-checked. Rules: word count in
    * [[[GopherMinWords]], [[GopherMaxWords]]]; mean word length in
    * [3, 10]; symbol-to-word ratio (# chars + '...' runs) <= 0.1;
    * alphabetic-word ratio >= 0.8; bullet-line ratio <= 0.9;
    * ellipsis-ending-line ratio <= 0.3; >= 2 English stopword hits.
    *
    * Every measurement is integer counting (regexp/list algebra shared
    * byte-identically with the oracle — whitespace removal uses the
    * explicit [[TextOps.WsClassRe]] class, the x72 lesson); ratios are
    * integer/integer double divisions served un-rounded; thresholds are
    * identical double literals. Map-only — no shuffle at all until the
    * final ORDER BY.
    */
  private def x86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      500001L -> GopherShort, 500002L -> GopherSymbols,
      500003L -> GopherLongWords, 500004L -> GopherBullets,
      500005L -> GopherNoStop, 500006L -> GopherEllipsis)
    val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .union(planted.toDF("doc_id", "text"))
    val tk = TextOps.tokens(col("text"))
    val nWords = size(tk).cast("long")
    val nChars = length(regexp_replace(col("text"), TextOps.WsClassRe, "")).cast("long")
    val nAlpha = size(filter(tk, t => t.rlike("[a-z]"))).cast("long")
    val nSym = (regexp_count(col("text"), lit("#"))
      + regexp_count(col("text"), lit("\\.\\.\\."))).cast("long")
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^- "))).cast("long")
    val nEllip = size(filter(lines, l => l.rlike("\\.\\.\\.$"))).cast("long")
    val nStop = TextOps.stopHits(col("text"), TextOps.StopwordPatterns.head._2)
    val m = corpus.select(col("doc_id"), nWords.as("n_words"),
      (nChars.cast("double") / nWords.cast("double")).as("mean_wlen"),
      (nSym.cast("double") / nWords.cast("double")).as("sym_ratio"),
      (nAlpha.cast("double") / nWords.cast("double")).as("alpha_ratio"),
      (nBullet.cast("double") / nLines.cast("double")).as("bullet_ratio"),
      (nEllip.cast("double") / nLines.cast("double")).as("ellipsis_ratio"),
      nStop.as("n_stop"))
    val rules = Seq(
      "r_words" -> (col("n_words") < GopherMinWords || col("n_words") > GopherMaxWords),
      "r_wlen" -> (col("mean_wlen") < 3.0 || col("mean_wlen") > 10.0),
      "r_symbol" -> (col("sym_ratio") > 0.1),
      "r_alpha" -> (col("alpha_ratio") < 0.8),
      "r_bullet" -> (col("bullet_ratio") > 0.9),
      "r_ellipsis" -> (col("ellipsis_ratio") > 0.3),
      "r_stop" -> (col("n_stop") < 2))
    m.select(col("*") +: rules.map { case (n, c) => c.cast("int").as(n) }: _*)
      .withColumn("keep",
        rules.map(r => col(r._1)).reduce(_ + _).equalTo(0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** C4 cleaning rules (x87) — the Raffel et al. 2020 line+page filter:
    * keep lines that end in terminal punctuation, have >= 5 words, and
    * don't mention javascript; then drop pages with < 3 sentences (on
    * the RETAINED lines), or containing "lorem ipsum" or a curly brace
    * anywhere. The complement to x86's Gopher rules (statistical gates)
    * — C4 is the structural gate, and together they're the two published
    * stage-1 web filters every pipeline starts from.
    *
    * The fixture is single-line punctuation-free word salad (no rule
    * would ever fire), so each document is deterministically WRAPPED
    * into a multi-line page (identical concat algebra both engines):
    * a kept line built from its text, a too-short line, a javascript
    * line, the raw salad line (no terminal punct), plus id-keyed lorem /
    * brace / few-sentence plants on coprime moduli. Every rule fires,
    * every measurement + flag + the kept-text fingerprint is
    * hash-checked, and the whole decision is map-only (the x72/x86
    * shape: no shuffle but the final sort).
    */
  private def x87(s: SparkSession, dir: String): DataFrame = {
    val nl = lit("\n")
    // three sentences on the kept line so clean pages PASS the few-
    // sentence gate; the %13 variant keeps a one-sentence line instead,
    // so p_fewsent fires there and only there
    val line1 = concat(col("text"),
      lit(" one more. two more lines here. three sentences total here."))
    val line1Short = concat(col("text"), lit(" one."))
    val line2 = lit("too short.")
    val line3 = lit("this javascript line has at least five words.")
    val line4 = col("text")
    val page = concat(
      when(col("doc_id") % 13 === 0, concat(line1Short, nl, line4))
        .otherwise(concat(line1, nl, line2, nl, line3, nl, line4)),
      when(col("doc_id") % 9 === 0, concat(nl, lit("lorem ipsum dolor sit amet.")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0, concat(nl, lit("a line with a { brace and five words.")))
        .otherwise(lit("")))
    val lines = split(col("page"), "\n")
    def lineWords(l: Column): Column =
      size(filter(split(trim(l), "\\s+"), w => w =!= ""))
    val keptLines = filter(lines, l =>
      l.rlike("[.!?\"]$") && lineWords(l) >= 5 && !lower(l).contains("javascript"))
    val keptText = array_join(keptLines, "\n")
    t(s, dir, "documents").select(col("doc_id"), page.as("page"))
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(keptLines).cast("long").as("n_kept"),
        regexp_count(keptText, lit("[.!?]")).cast("long").as("n_sentences"),
        TextOps.polyHash(keptText).as("clean_fp"),
        lower(col("page")).contains("lorem ipsum").cast("int").as("p_lorem"),
        col("page").contains("{").cast("int").as("p_brace"))
      .withColumn("p_fewsent", (col("n_sentences") < 3).cast("int"))
      .withColumn("keep",
        (col("p_fewsent") + col("p_lorem") + col("p_brace") === 0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID confusion matrix (x88): the labeled `lang` column vs
    * the engine's own [[TextOps.langGuess]] heuristic, as (label, guess)
    * counts with each row's share of its label — the QA table that says
    * WHERE the classifier confuses (es->fr, de->en, ...) rather than one
    * accuracy number; feeding x63/x75's language budgets with a biased
    * classifier silently reallocates whole languages, and this is the
    * audit that catches it. Share = count/label-total, integer/integer
    * double division served un-rounded.
    *
    * Scale shape: map-only scoring into one (lang, guess) aggregate
    * (<= 16 cells) plus a dimension-sized broadcast for the totals.
    */
  private def x88(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the fixture is stopword-free word salad (everything ties to 'en'),
    // so stopword-rich plants make the diagonal AND an off-diagonal
    // (mislabeled zh->es) observable — the x86 planting discipline
    val planted = Seq(
      "en" -> ("the cat and the dog is in a house of hats " * 5).trim,
      "es" -> ("el perro la casa de que y en los campos " * 5).trim,
      "de" -> ("der hund die katze und das haus ist von mit " * 5).trim,
      "fr" -> ("le chien la maison les champs de et un que " * 5).trim,
      "zh" -> ("el gato de la casa que y en los " * 5).trim)
    val corpus = t(s, dir, "documents").select(col("lang"), col("text"))
      .union(planted.toDF("lang", "text"))
    val g = corpus
      .select(col("lang"), TextOps.langGuess(col("text")).as("guess"))
      .groupBy(col("lang"), col("guess")).agg(count(lit(1)).as("n"))
    val tot = g.groupBy(col("lang")).agg(sum(col("n")).as("lt"))
    g.join(broadcast(tot), "lang")
      .select(col("lang"), col("guess"), col("n"),
        (col("n").cast("double") / col("lt").cast("double")).as("share"),
        (col("lang") === col("guess")).cast("int").as("is_correct"))
      .orderBy(col("lang"), col("guess"))
  }

  /** Bottom-percentile cut for x89: vectors in their cell's lowest
    * decile of centroid cosine are outlier candidates.
    */
  private val OutlierCut = 0.1

  /** Semantic outlier detection (x89): each embedding's cosine to its
    * OWN trained IVF centroid, percent-ranked WITHIN its cell, flagging
    * the bottom [[OutlierCut]] — the embedding-space analogue of x64's
    * per-source quality calibration: a global distance cut would gut
    * naturally-diffuse clusters, the per-cell rank finds what's far from
    * its own neighborhood (OOD docs, encoder glitches, mislabels — the
    * candidates x67's kNN vote then adjudicates). Serves from the SAME
    * persisted index as x13/x25/x47/x68b/x78, so "outlier" means outlier
    * under the index the corpus actually ships.
    *
    * Scale shape: assignment is the broadcast-centroid map (model = k
    * rows at any scale); the per-cell ranks are the hardened bucket
    * decomposition (no cell-sized window partition); cosine rounded at 6
    * (libm noise) before ranking so both engines rank identical values.
    */
  private def x89(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val assigned = Similarity.ivfAssign(e, cents, EmbDim)
    val scored = assigned.join(broadcast(trained), "cell_id")
      .select(col("vec_id"), col("cell_id"),
        round(Similarity.cosineStatic(col("v"), col("cv"),
          Similarity.norm(col("v"), EmbDim), Similarity.norm(col("cv"), EmbDim),
          EmbDim), 6).as("cos_c"))
    // materialize=true (round-21 A/B 1.45x): the scored frame replays
    // the centroid-scoring join per rank branch without the cut.
    Ranks.groupPercentRank(scored, "cell_id", "cos_c", materialize = true)
      .select(col("vec_id"), col("cell_id"), col("cos_c"), col("pct_rank"),
        (col("pct_rank") < OutlierCut).cast("int").as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** Document novelty score (x90): the share of a document's DISTINCT
    * 5-gram hashes that appear in no other document — the doc-level
    * complement of x79's corpus-wide positional dup rate, and the
    * standard admission filter for synthetic/generated data (a generator
    * that paraphrases its prompt set produces low-novelty docs long
    * before exact dedup catches anything). Planted verbatim duplicates
    * (the x79 modulus) drive their own AND their originals' novelty to
    * zero — the detection is observable from both sides.
    *
    * Distinctness is over gram HASHES on both engines (array_distinct of
    * the hash array == DISTINCT (doc, gh)), so hash collisions —
    * harmless at the df-counting level — cannot diverge the engines.
    * Scale shape: x79's (one gram explode, hash-keyed df aggregate,
    * hash-keyed join back) — shuffle keys are 8-byte hashes, never gram
    * text; both aggregates combine map-side.
    */
  private def x90(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = base.union(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val dg = Checkpoints.cut(corpus
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_tk"))
      .select(col("doc_id"),
        explode(array_distinct(
          TextOps.positionalGramHashesOfTokens(col("_tk"), DupNgramN))).as("gh")))
    val dfreq = dg.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    dg.join(dfreq, "gh").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("df") === 1).cast("long")).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams").cast("double")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Semantic drift between corpus versions (x91): assign v1 (the base
    * embeddings) and a planted v2 (every 5th vector dropped, every 7th
    * duplicated — a real composition shift) to the SAME trained IVF
    * cells, and report the per-cell count distributions plus their
    * Jensen-Shannon divergence. x70 diffs releases by content hash (WHICH
    * docs changed); this is the SHAPE signal — two releases can differ in
    * millions of hashes while semantically identical (re-crawls), or
    * share most hashes while the topic mix quietly collapses, and only
    * the cell-distribution divergence separates the two. The x62 JS
    * discipline at cell granularity: p/q are integer/integer doubles,
    * ln terms rounded at 6 per cell (libm), the total a decimal-exact
    * sum of the rounded contributions.
    *
    * Scale shape: two broadcast-centroid assignment maps + two cell
    * counts (map-side combined); everything after is <= k rows.
    */
  private def x91(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val v2 = e.filter(col("vec_id") % 5 =!= 0).union(
      e.filter(col("vec_id") % 7 === 0).select((col("vec_id") + 100000).as("vec_id"), col("v")))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val n1 = Similarity.ivfAssign(e, cents, EmbDim)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_v1"))
    val n2 = Similarity.ivfAssign(v2, cents, EmbDim)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_v2"))
    val j = n1.join(n2, Seq("cell_id"), "full")
      .select(col("cell_id"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"))
    val tot = j.agg(sum(col("n_v1")).cast("long").as("t1"),
      sum(col("n_v2")).cast("long").as("t2"))
    val pq = j.crossJoin(broadcast(tot)).select(
      col("cell_id"), col("n_v1"), col("n_v2"),
      (col("n_v1").cast("double") / col("t1").cast("double")).as("p"),
      (col("n_v2").cast("double") / col("t2").cast("double")).as("q"))
    val m = (col("p") + col("q")) / 2
    val ct = pq.withColumn("js_contrib", round(
      lit(0.5) * when(col("p") > 0, col("p") * log(col("p") / m)).otherwise(0.0)
        + lit(0.5) * when(col("q") > 0, col("q") * log(col("q") / m)).otherwise(0.0), 6))
    val jsTot = ct.agg(
      sum(col("js_contrib").cast(DecimalType(18, 6))).cast("double").as("js_total"))
    ct.crossJoin(broadcast(jsTot)).orderBy(col("cell_id"))
  }

  /** Taint propagation through duplicate clusters (x92): an ingest-time
    * flag (PII hit, takedown, license restriction — planted here on
    * every 11th doc) must bind to CONTENT, not to the row that happened
    * to get flagged: a near-duplicate of a flagged document carries the
    * same risk, and dropping only the flagged copy silently ships the
    * clone. Effective flag = max over the x26/x66/x76 duplicate cluster;
    * `tainted_by_dup` isolates the docs whose own flag was clean but
    * whose cluster was not — the measured "how much did propagation
    * actually catch" number (0 would mean the plant modulus and the
    * cluster structure never met, i.e. an unobservable rule).
    *
    * Scale shape: x26's propagation plus one cluster-keyed max and one
    * join back — both on the 8-byte cluster key.
    */
  private def x92(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir))
    // Cut: two consumers (the cluster-flag aggregate and the serve join)
    // would otherwise each replay the corpus-to-labels join — the x83/x26
    // multi-consumer lesson. The frame is 3 numeric columns per doc, no
    // text (round-14 conf probe: 200-partition ratio 2.08 before the cut).
    val labeled = Checkpoints.cut(corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"),
        (col("doc_id") % 11 === 0).cast("int").as("own_flag")))
    val cflag = labeled.groupBy(col("cluster"))
      .agg(max(col("own_flag")).as("effective_flag"))
    labeled.join(cflag.hint("SHUFFLE_HASH"), "cluster")
      .select(col("doc_id"), col("cluster"), col("own_flag"), col("effective_flag"),
        ((col("effective_flag") === 1) && (col("own_flag") === 0))
          .cast("int").as("tainted_by_dup"))
      .orderBy(col("doc_id"))
  }

  /** x93 epoch-capped mix knobs. Alpha 0.5 (not [[MixAlpha]]'s 0.3) so
    * the temperature upweighting is strong enough that small sources
    * demand more than [[EpochCap]] epochs of their unique supply — the
    * data-constrained regime the query exists to exercise. Budget
    * 9N/5 = 1.8 epochs of the WHOLE corpus sits between the waterfall's
    * interesting thresholds at every fixture scale (simulated: a 4-round
    * cascade at 25 docs/source, 2 rounds at 250+, always within the
    * oracle's [[CapMixRounds]] unroll) and below the Σ cap capacity.
    */
  private val EpochCap = 4L
  private val CapAlpha = 0.5
  private val CapMixRounds = 6

  /** Epoch-capped (data-constrained) temperature mix: x63's alpha-
    * temperature apportionment with the published ~4-epoch repetition
    * cap (Muennighoff et al. 2023) — when the budget exceeds a source's
    * unique supply x cap, the overflow redistributes to uncapped sources
    * by the same largest-remainder discipline
    * ([[CorpusMix.epochCappedAllocation]]'s waterfall).
    *
    * Unique supply is PLANTED in three tiers (full / half / fifth of the
    * source's docs, by source-hash) because the fixture's sources are
    * uniform — real corpora aren't, and uniform supplies would never
    * bind a cap. The budget derives from the corpus (9N/5), so cap
    * binding survives fixture replication.
    *
    * Scale shape: one corpus count + one (source) count aggregate; the
    * waterfall itself is dimension-sized per round with two driver
    * scalars per round. The oracle unrolls [[CapMixRounds]] waterfall
    * rounds in SQL (converged rounds are no-ops — the x26 unroll trick);
    * the engine's measured round count is pinned <= the unroll by
    * CorpusMixSpec.
    */
  /** Shared x93/x97 epoch-capped allocation: the planted-supply weight
    * frame through [[CorpusMix.epochCappedAllocationWithRounds]], with
    * the rounds guard (round-14 ADVICE) — the oracle unrolls a FIXED
    * [[CapMixRounds]]-deep waterfall, so a fixture/scale shape needing
    * more rounds fails loudly in the ENGINE (naming the knob to raise)
    * instead of surfacing as a confusing oracle parity diff.
    *
    * @return allocation frame (source, n_docs, u, w, cap, alloc, capped)
    */
  private def capMixAllocation(s: SparkSession, dir: String): (DataFrame, Long) = {
    val d = t(s, dir, "documents")
    // Corpus-derived budget: a Long at the API boundary (the same
    // dimension-scalar collect x63's MixBudget avoids only because its
    // budget is a constant).
    val budget = 9L * d.count() / 5L
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val weighted = counts
      .withColumn("u",
        when(pmod(TextOps.polyHash(col("source")), lit(3L)) === 0, col("n_docs"))
          .when(pmod(TextOps.polyHash(col("source")), lit(3L)) === 1,
            expr("n_docs div 2"))
          .otherwise(expr("n_docs div 5")))
      .select(col("source"), col("n_docs"), col("u"),
        floor(pow(col("u").cast("double"), lit(CapAlpha)) * 1e6)
          .cast("long").as("w"),
        (col("u") * EpochCap).as("cap"))
    val (alloc, rounds) = CorpusMix.epochCappedAllocationWithRounds(weighted, budget)
    require(rounds <= CapMixRounds,
      s"x93 waterfall needed $rounds rounds but the SQL oracle unrolls only " +
        s"$CapMixRounds (CapMixRounds) — raise the unroll before trusting the oracle")
    (alloc, budget)
  }

  private def x93(s: SparkSession, dir: String): DataFrame = {
    val (alloc, _) = capMixAllocation(s, dir)
    alloc
      .select(col("source"), col("n_docs"), col("u"), col("w"), col("cap"),
        col("alloc"), col("capped"),
        expr("(alloc * 1000) div greatest(u, 1)").as("epochs_milli"))
      .orderBy(col("source"))
  }

  /** x94's planted blocklist — the RefinedWeb/FineWeb stage-0 domain
    * reputation gate's deny side. One .net and one .co.uk entry so the
    * blocklist join is exercised on BOTH registrable-domain shapes.
    */
  private val BadDomains = Seq("trackerfarm.net", "linkmill.co.uk")
  private val DomainQualityFloor = 0.5

  /** Domain-level reputation gate (x94): the stage-0 filter every web
    * corpus runs before per-document quality — aggregate to REGISTRABLE
    * domain (per-domain doc count, distinct canonical URLs -> dup rate,
    * mean quality) and join a domain blocklist; a domain is kept iff it
    * is not blocklisted and its mean quality clears the floor.
    *
    * URLs are synthesized domain-diverse (per-source .com and .co.uk
    * registrable domains, www./news. subdomains, utm noise, two planted
    * bad domains, plus residues that exercise every PSL RULE SHAPE:
    * `m.srcN.ck` under the wildcard `*.ck`, `city.kawasaki.jp` under a
    * wildcard + exception pair, and `srcN.github.io` under a
    * private-section platform suffix) and pushed through the SAME
    * canonicalization algebra as x73 ([[graft.ops.UrlOps.canonCols]]).
    * Registrable domain resolves the embedded real-format PSL snapshot
    * per the publicsuffix.org algorithm ([[graft.ops.Psl]], codegen'd
    * O(labels) probes — [[graft.functions.UrlExprs]]); the oracle
    * re-resolves the SAME rule rows (generated from [[graft.ops.Psl.default]],
    * so the mirrors cannot desync) via a candidate-suffix equi-join over
    * DISTINCT hosts.
    *
    * Scale shape: everything per-row is map-only Column work fused into
    * the scan; the aggregation is two-level — (domain, canon_url) with
    * map-side combine (collapses URL-variant floods AT the mappers),
    * then (domain) — so exactly two corpus-sized hash shuffles, both on
    * small keys. The blocklist is a broadcast left join (domains are a
    * catalog; the real ~9k-entry PSL+blocklist broadcasts the same way).
    * PlanSpec pins <= 2 hash exchanges and the broadcast-only blocklist.
    */
  private def x94(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val id = col("doc_id")
    val url = concat(
      lit("https://"),
      when(id % 2 === 0, lit("www.")).when(id % 3 === 0, lit("news.")).otherwise(lit("")),
      when(id % 17 === 0, lit(BadDomains(0)))
        .when(id % 23 === 0, lit(BadDomains(1)))
        .when(id % 31 === 0, concat(lit("m."), col("source"), lit(".ck")))
        .when(id % 37 === 0, lit("city.kawasaki.jp"))
        .when(id % 41 === 0, concat(col("source"), lit(".github.io")))
        // trailing-dot FQDN form (plus case noise): must canonicalize
        // into the SAME registrable domain as the plain '.com' arm —
        // pins the Psl/oracle host-canonicalization parity in the gate
        .when(id % 43 === 0, concat(col("source"), lit(".COM.")))
        .otherwise(concat(col("source"),
          when(id % 5 === 0, lit(".co.uk")).otherwise(lit(".com")))),
      lit("/docs/"), (id % 50).cast("string"),
      lit("?id="), (id % 20).cast("string"),
      when(id % 9 === 0, lit("&utm_source=feed")).otherwise(lit("")))
    val u = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), TextOps.quality(col("text")).as("q"))
      .withColumn("url", url)
    val (canon, host) = UrlOps.canonCols(col("url"))
    val domain = UrlOps.registrableDomain(host)
    val perUrl = u
      .select(domain.as("domain"), canon.as("canon_url"), col("q"))
      .groupBy(col("domain"), col("canon_url"))
      .agg(count(lit(1)).as("n"), sum(col("q").cast("decimal(18,6)")).as("qs"))
    val blk = broadcast(BadDomains.toDF("domain").withColumn("blocked", lit(1)))
    perUrl
      .groupBy(col("domain"))
      .agg(
        sum(col("n")).as("n_docs"), count(lit(1)).as("n_urls"),
        (sum(col("qs")).cast("double") / sum(col("n"))).as("mean_quality"))
      .join(blk, Seq("domain"), "left")
      .select(col("domain"), col("n_docs").cast("long").as("n_docs"),
        col("n_urls").cast("long").as("n_urls"), col("mean_quality"),
        round(lit(1.0) - col("n_urls").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        coalesce(col("blocked"), lit(0)).as("blocked"),
        (coalesce(col("blocked"), lit(0)) === 0 &&
          col("mean_quality") >= DomainQualityFloor).cast("int").as("keep"))
      .orderBy(col("domain"))
  }

  /** x95 knobs: one mutation per [[MutEvery]] tokens leaves intact runs
    * of MutEvery-1 = 9 >= w + n - 1 = 8 tokens, so the winnowing
    * no-lost-passage theorem still guarantees shared fingerprints inside
    * every intact run of a mutated plant; the containment floor sits
    * well under the ~0.5 fingerprint survival that mutation rate
    * produces and far above word-salad background (~0).
    */
  private val MutEvery = 10
  private val FpContainFloor = 0.3

  /** Fuzzy decontamination (x95): the winnowing-fingerprint form of
    * x24's exact 5-gram benchmark-leakage sweep — catches PARAPHRASED /
    * partially edited eval contamination that exact verbatim-threshold
    * containment misses, at 2/(w+1) of the n-gram index size
    * ([[Dedup.winnowFingerprints]]'s density bound).
    *
    * Same content-hash split as x24 (train < 80, benchmark >= 90); two
    * plant families: VERBATIM train docs at +200000 (x24's plant —
    * containment 1.0 by the no-lost-passage theorem) and MUTATED train
    * docs at +400000 with every [[MutEvery]]-th token replaced (the
    * paraphrase simulation — exact x24-style matching at a verbatim
    * threshold misses these; winnowing's self-synchronizing selection
    * keeps fingerprint containment high inside the intact runs).
    * Containment = |doc fingerprints ∩ train fingerprint set| /
    * |doc fingerprints| over DISTINCT hashes.
    *
    * Scale shape: fingerprinting is per-document map work; the train
    * index is a DISTINCT on the 8-byte hash (map-side combined); the
    * sweep is one hash equi-join on gh + one per-doc aggregate — the
    * x24 shape with a 60% smaller index and no document-pair space. The
    * bench frame is deliberately NOT checkpointed: it is consumed twice
    * (fingerprints + the class join) but its build is map-only scan
    * work, and materializing a text-bearing corpus frame is exactly
    * what a 100 TB run must avoid.
    */
  /** Shared x95/x96 corpora: the content-hash train/bench split with
    * the verbatim (+200000) and mutated (+400000) plant families —
    * factored so the sweep (x95) and the span localizer (x96) can never
    * desync on the fixture they share.
    *
    * @return (train(doc_id, text), bench(doc_id, text, class))
    */
  private[graft] def decontFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "documents").select(
      col("doc_id"), col("text"), (TextOps.polyHash(col("text")) % 100).as("bucket"))
    val train = base.filter(col("bucket") < 80).select(col("doc_id"), col("text"))
    val verbatim = base.filter(col("bucket") < 80 && col("doc_id") % 13 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"),
        lit("verbatim").as("class"))
    // Tokens materialize as their own column BEFORE the positional
    // lambda (the round-13 interpreted-HOF rule): element_at indexes an
    // attribute, not a re-run of the tokenizer.
    val mutated = base.filter(col("bucket") < 80 && col("doc_id") % 11 === 0)
      .select((col("doc_id") + 400000).as("doc_id"), TextOps.tokens(col("text")).as("_t"))
      .select(col("doc_id"),
        array_join(
          // size guard: Spark's sequence(1, 0) DESCENDS instead of
          // emitting empty — an empty token list must stay empty
          when(size(col("_t")) > 0,
            transform(sequence(lit(1), size(col("_t"))), i =>
              when(pmod(i - 1, lit(MutEvery)) === 0,
                concat(lit("zzmut"), i.cast("string")))
                .otherwise(element_at(col("_t"), i))))
            .otherwise(array().cast("array<string>")), " ").as("text"),
        lit("mutated").as("class"))
    val bench = base.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("text"), lit("natural").as("class"))
      .union(verbatim).union(mutated)
    (train, bench)
  }

  private def x95(s: SparkSession, dir: String): DataFrame = {
    val (train, bench) = decontFrames(s, dir)
    val trainFp = Dedup.winnowFingerprints(train, "doc_id", "text", DupNgramN, WinnowW)
      .select(col("gh")).distinct()
    val benchFp = Dedup.winnowFingerprints(
        bench.select(col("doc_id"), col("text")), "doc_id", "text", DupNgramN, WinnowW)
      .select(col("id").as("doc_id"), col("gh")).distinct()
    benchFp
      .join(trainFp.withColumn("hit", lit(1)), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .join(bench.select(col("doc_id"), col("class")), "doc_id")
      .withColumn("containment",
        round(col("n_hit").cast("double") / col("n_fp").cast("double"), 6))
      .select(col("doc_id"), col("class"), col("n_fp"), col("n_hit"),
        col("containment"),
        (col("containment") >= FpContainFloor).cast("int").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** x96 knobs. SpanMergeGap: inside one shared passage, consecutive
    * MATCHED fingerprint gram positions are <= [[WinnowW]] apart
    * (winnowing selects >= 1 per w-window) and a single edited token
    * voids the [[DupNgramN]] gram positions covering it, with up to
    * w - 1 selection slack on each side — so gaps up to
    * n + 2(w - 1) = 11 gram positions are bridged (one x95 mutated
    * plant's intact runs localize as ONE span, not dozens) and
    * anything larger starts a new span. SpanMinFp suppresses
    * single-fingerprint background coincidences (real shared passages
    * produce runs of matches; one stray 8-byte hash collision or a
    * common phrase is not a leak). GhTrainDfCap drops fingerprints
    * present in more than this many DISTINCT train docs from the index:
    * boilerplate that common is duplication evidence (x79's business),
    * not contamination evidence, and the cap bounds the per-fingerprint
    * join fan-out at any corpus scale.
    */
  private val SpanMergeGap = DupNgramN + 2 * (WinnowW - 1)
  private val SpanMinFp = 2L
  private val GhTrainDfCap = 64L

  /** Contamination span localization (x96): x95 says WHICH bench docs
    * leak; this says WHERE — per (bench doc, train doc) pair, the
    * merged token intervals whose winnowing fingerprints match, i.e.
    * the passage to strip from train (or the benchmark item to cite).
    * Positions ride the fingerprints for free
    * ([[Dedup.winnowFingerprints]] returns them); localization is the
    * x95 sweep with train_id + pos kept, then classic gaps-and-islands
    * interval merging.
    *
    * Scale shape: both fingerprint frames are map-only per document;
    * the sweep is the same 8-byte gh equi-join as x95 with per-hash
    * fan-out bounded by [[GhTrainDfCap]]; the islands window partitions
    * by (bench_doc, train_doc) — pairs sharing >= 1 fingerprint, a
    * sparse candidate set, never the doc-pair cross space; output is
    * interval-count-sized. Nothing text-bearing shuffles past the
    * fingerprint step.
    */
  private def x96(s: SparkSession, dir: String): DataFrame = {
    val (train, bench) = decontFrames(s, dir)
    Dedup.fingerprintSpans(
        bench.select(col("doc_id"), col("text")), train, "doc_id", "text",
        DupNgramN, WinnowW, SpanMergeGap, SpanMinFp, GhTrainDfCap)
      .select(col("id").as("doc_id"), col("train_id"), col("span_start"),
        col("span_end"), col("span_tokens"), col("n_fp"))
      .orderBy(col("doc_id"), col("train_id"), col("span_start"))
  }

  /** Epoch-capped mix MATERIALIZATION (x97): x93 decides how many
    * samples each source contributes under the repetition cap; this
    * turns that allocation table into an actual doc-level sampling plan
    * — per source, the top-`u` docs by deterministic content-hash rank
    * are the unique-supply slice, each repeating `alloc div u` full
    * epochs, with the `alloc mod u` top-ranked docs repeating once more
    * (x69's hash-threshold materialization extended with repeats — the
    * uncapped x63 mix never needs n_repeats > 1, the data-constrained
    * x93 mix is ABOUT them). Invariants the spec pins: per-source
    * sum(n_repeats) == alloc exactly, global sum == budget, and
    * n_repeats <= EpochCap everywhere (alloc <= cap = u * EpochCap, so
    * no doc can exceed the published ~4-epoch repetition bound).
    *
    * Scale shape: the allocation is dimension-sized (x93's waterfall);
    * ranking is [[Ranks.groupRowNumber]]'s bucket decomposition (no
    * per-source global sort); the repeat arithmetic is a broadcast join
    * + map-only projection. Output is one row per SELECTED unique doc
    * with its repeat factor — the 100 TB form (an exploded
    * budget-sized corpus materializes downstream per epoch; emitting it
    * here would multiply the output by ~1.8 for no information).
    */
  private def x97(s: SparkSession, dir: String): DataFrame = {
    val (alloc, _) = capMixAllocation(s, dir)
    val allocs = alloc.select(col("source"), col("u"), col("alloc"))
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
      TextOps.polyHash(concat(lit("mix#"), col("text"))).as("hd"))
    Ranks.groupRowNumber(docs, "source", "hd", "doc_id")
      .join(broadcast(allocs), "source")
      // the unique-supply slice (u = 0 sources contribute nothing, and
      // the filter runs before the division below can see them)
      .filter(col("row_num") <= col("u"))
      .select(col("doc_id"), col("source"), col("row_num").as("pick_rank"),
        (expr("alloc div u") +
          when(col("row_num") <= expr("alloc % u"), 1L).otherwise(0L))
          .cast("long").as("n_repeats"))
      .filter(col("n_repeats") > 0)
      .orderBy(col("doc_id"))
  }

  /** Decontamination rewrite (x98): the REMOVAL step x95/x96 stop short
    * of — sweep the TRAIN side against the benchmark fingerprint set,
    * merge each train doc's matched-token intervals (the x96
    * gaps-and-islands with the same theorem-derived gap, no pair key:
    * removal doesn't care WHICH benchmark item leaked), and emit the
    * scrubbed document with the leaked spans cut out, plus the audit
    * counts (spans, tokens removed, original length). Output is only
    * the implicated docs; text is the lowercased token stream rejoined
    * (the fingerprint tokenization — the form a training pipeline
    * tokenizes anyway).
    *
    * Scale shape: fingerprint frames are map-only; the sweep is the gh
    * equi-join (NOT a forced broadcast — at real scale the benchmark
    * index is MBs and AQE broadcasts it on its own, but nothing breaks
    * if it doesn't); token marking is a doc_id-keyed equi-join with a
    * BETWEEN residual against the doc's own (non-overlapping) spans;
    * the rebuild aggregates tokens per implicated doc only —
    * [[graft.ops.Dedup.scrubSpans]] left_semi-joins the corpus against
    * the span doc ids BEFORE tokenizing, so the posexplode/mark/rebuild
    * run over the implicated slice and the full corpus token stream
    * never shuffles (the final inner join cannot be pushed below the
    * groupBy by Catalyst; the prune does it by construction).
    * Consecutive islands are > mergeGap >= n apart, so spans never
    * overlap and the BETWEEN mark is unambiguous — and scrubSpans now
    * asserts that invariant rather than assuming it.
    */
  /** Shared x98/x100/x101 front half: the train corpus and its merged
    * matched-token intervals against the benchmark fingerprint SET (no
    * pair key — removal doesn't care which benchmark item leaked). One
    * definition so the three scrub-family queries can never desync on
    * the sweep.
    */
  private def decontTrainSpans(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (train, bench) = decontFrames(s, dir)
    val benchFp = Dedup.winnowFingerprints(
        bench.select(col("doc_id"), col("text")), "doc_id", "text", DupNgramN, WinnowW)
      .select(col("gh")).distinct()
    val spans = Dedup.fingerprintSpansAgainst(
      train, benchFp, "doc_id", "text", DupNgramN, WinnowW, SpanMergeGap, SpanMinFp)
    (train, spans)
  }

  private def x98(s: SparkSession, dir: String): DataFrame = {
    val (train, spans) = decontTrainSpans(s, dir)
    Dedup.scrubSpans(train, spans, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_spans"), col("n_tokens"),
        col("tokens_removed"), col("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Shards for the x99 epoch plan — a fixed fan-out stand-in for the
    * writer parallelism a real export chooses per corpus size.
    */
  private val PlanShards = 8

  /** Epoch/shard training plan (x99): the final step of the mix chain
    * (x63 weights -> x93 caps -> x97 picks + repeat factors -> THIS) —
    * explode each selected doc's n_repeats into per-epoch rows and
    * assign each (doc, epoch) copy a deterministic shard by content
    * hash, producing the exact budget-sized plan a shard writer
    * materializes. Epoch semantics: a doc with n_repeats = r appears in
    * epochs 0..r-1, so epoch e's corpus is precisely the docs with
    * n_repeats > e — repeats are spread ACROSS epochs, never duplicated
    * within one (the data-constrained training loop's contract).
    *
    * Scale shape: everything after x97's dimension-sized allocation is
    * map-only (explode fan-out <= EpochCap per doc, hash shard
    * assignment fused into the scan); output is budget-sized (~1.8x the
    * corpus row COUNT, ids only — never text). The final ORDER BY is
    * the determinism contract; a real export would write
    * partitionBy(epoch, shard) instead.
    */
  private def x99(s: SparkSession, dir: String): DataFrame =
    x97(s, dir)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), col("n_repeats") - 1)).as("epoch"))
      .select(col("doc_id"), col("source"), col("epoch"),
        pmod(TextOps.polyHash(concat(col("doc_id").cast("string"), lit("#"),
          col("epoch").cast("string"))), lit(PlanShards.toLong))
          .cast("int").as("shard"))
      .orderBy(col("doc_id"), col("epoch"))

  /** Byte-original decontamination scrub (x100): x98's removal with the
    * ORIGINAL bytes preserved — a real pipeline scrubbing a corpus must
    * cut spans from the original text (casing, punctuation, newlines
    * intact) or every downstream dedup/quality signal shifts on every
    * implicated doc. Same sweep as x98 ([[decontTrainSpans]], one
    * definition); the rebuild is [[graft.ops.Dedup.scrubSpansBytes]]:
    * byte-preserving whitespace/token segmentation, the removed span
    * taking its tokens plus the whitespace run after each (the seam
    * rule, documented there), everything kept byte-identical.
    *
    * Scale shape: identical to x98 — corpus prunes to implicated docs
    * via left_semi BEFORE the segment explode; the mark is a doc-keyed
    * equi-join with a BETWEEN residual; the rebuild aggregate sorts
    * inside collect_list. chars_removed audits the byte-level cut the
    * token count can't see.
    */
  private def x100(s: SparkSession, dir: String): DataFrame = {
    val (train, spans) = decontTrainSpans(s, dir)
    Dedup.scrubSpansBytes(train, spans, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_spans"), col("n_tokens"),
        col("tokens_removed"), col("chars_removed"), col("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Contamination span character offsets (x101): each merged leaked
    * span of x98/x100 located in the ORIGINAL string —
    * (char_start, char_end) 0-based inclusive plus the span's original
    * bytes, the audit record a human (or a downstream byte-level
    * scrubber) needs to SEE what leaked without re-deriving token
    * arithmetic. span_text is `substr(text, char_start + 1, len)`, so
    * the oracle cross-checks the offsets against the actual bytes, not
    * just against its own offset arithmetic.
    *
    * Scale shape: [[graft.ops.Dedup.spanCharOffsets]] — prune-then-
    * segment, two id+token-index equi-joins over the implicated slice's
    * token segments, then one doc-keyed join back to the implicated
    * docs for the substring; output is span-count-sized.
    */
  private def x101(s: SparkSession, dir: String): DataFrame = {
    val (train, spans) = decontTrainSpans(s, dir)
    val offs = Dedup.spanCharOffsets(train, spans, "doc_id", "text")
    val implicated = train
      .join(offs.select(col("id").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("_tid"), col("text"))
    offs
      .join(implicated, col("id") === col("_tid"))
      .select(col("id").as("doc_id"), col("s"), col("e"),
        col("char_start"), col("char_end"),
        col("text").substr(
          (col("char_start") + 1).cast("int"),
          (col("char_end") - col("char_start") + 1).cast("int")).as("span_text"))
      .orderBy(col("doc_id"), col("s"))
  }

  /** Certification-sample size and truth depth for the x102 recall audit:
    * the sample is a FIXED count (never corpus-proportional — the brute
    * pass must stay one broadcast-sample scan at any corpus size).
    */
  private[graft] val RecallQ = 50
  private[graft] val RecallK = 10

  /** ANN recall certification (x102): measured recall@k of the trained
    * IVF index — the x13/x25 production retrieval path — against exact
    * brute-force ground truth on a fixed query sample, at nprobe = 1 AND
    * nprobe = 2, so the recall/cost curve of the probing knob is a
    * MEASURED artifact, not an assumption. This is the quality gate an
    * approximate index must pass before it serves a corpus-scale
    * retrieval pass: a 100 TB dedup/search built on an index with
    * unmeasured recall is silently lossy.
    *
    * Scale shape: ground truth is the standard certification cost — one
    * corpus scan against the BROADCAST fixed-size sample (x08's shape,
    * never corpus x corpus); the approx side is exactly x13/x25's
    * broadcast cell equi-join over the assignment (computed once, cut,
    * shared by both nprobe arms); the hit join is an 8-byte (qid,
    * vec_id) equi-join between two k*|Q|-row frames. Nothing here grows
    * faster than one corpus scan per arm.
    */
  private def x102(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
    val truth = Similarity.bruteForceTopK(e, q, RecallK, dim = EmbDim)
      .select(col("qid"), col("vec_id"))
    val trained = AnnModels.ivfCentroids(s, dir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    // the corpus assignment feeds both nprobe arms — cut so it computes once
    val assigned = Checkpoints.cut(Similarity.ivfAssign(e, cents, EmbDim))
    def approxTopK(nprobe: Int): DataFrame = {
      val probed = Similarity.ivfProbe(q, cents, EmbDim, nprobe)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell_id").as("qcell"))
      val scored = assigned.join(broadcast(probed),
          col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineStatic(col("qv"), col("v"),
            Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim), EmbDim), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= RecallK)
        .select(lit(nprobe.toLong).as("nprobe"), col("qid"), col("vec_id"))
    }
    val hits = approxTopK(1).union(approxTopK(2))
      .join(truth, Seq("qid", "vec_id"))
      .groupBy(col("nprobe"), col("qid"))
      .agg(count(lit(1)).as("n_hit"))
    // left-join the full (nprobe x sample) universe so a query whose
    // probed cells hold NO truth member still reports recall 0, not a
    // silently missing row
    q.select(col("vec_id").as("qid"))
      .withColumn("nprobe", explode(array(lit(1L), lit(2L))))
      .join(hits, Seq("nprobe", "qid"), "left")
      .select(col("nprobe"), col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(RecallK.toDouble), 4).as("recall"))
      .orderBy(col("nprobe"), col("qid"))
  }

  /** MinHash estimator calibration (x103): for every LSH candidate pair,
    * the signature-agreement Jaccard ESTIMATE (matching components / K)
    * next to the EXACT shingle-set Jaccard — the measured-error audit of
    * the x05/x06/x26 near-dup family. x102 certifies the ANN index;
    * this certifies the sketch the text dedup threshold sits on: with
    * K = 8 components the estimate is ±1/8-granular, and the per-pair
    * abs_err column is exactly the evidence needed to size K before a
    * 100 TB dedup commits to a 0.5 cutoff.
    *
    * Scale shape: candidates come from the banded equi-join (never
    * all-pairs); the component-match count is K codegen'd integer
    * comparisons per candidate row (no HOF in the hot path); exact
    * Jaccard joins the shingle sets back by id — the same two
    * broadcast-able id joins x06 already does.
    */
  private def x103(s: SparkSession, dir: String): DataFrame = {
    val sh = Checkpoints.cut(
      plantedDocs(s, dir).select(col("doc_id"), Dedup.shingles(col("text")).as("s")))
    val sigs = sh.select(
      (col("doc_id") +:
        (0 until Dedup.MinHashK).map(i =>
          Dedup.minhashComponent(transform(col("s"), x => TextOps.polyHash(x)), i).as(s"mh$i"))): _*)
      // shingle-less docs (< 3 tokens) have all-null signatures; without
      // this guard concat_ws-built band keys collapse them into ONE
      // shared band and they weld into candidate pairs with NaN Jaccard
      // (0/0) — x06 is shielded by its jac >= 0.5 cut (NaN compares
      // false), but calibration keeps the WHOLE candidate set, and the
      // oracle's NULL band never equi-joins, so the engine must drop
      // them the same way
      .filter(col("mh0").isNotNull)
    val cands = Dedup.lshCandidates(sigs, "doc_id")
    val a = sigs.select(
      col("doc_id").as("id1") +: (0 until Dedup.MinHashK).map(i => col(s"mh$i").as(s"a$i")): _*)
    val b = sigs.select(
      col("doc_id").as("id2") +: (0 until Dedup.MinHashK).map(i => col(s"mh$i").as(s"b$i")): _*)
    val withSigs = cands.join(a, "id1").join(b, "id2")
    val matches = (0 until Dedup.MinHashK)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val withSets = withSigs
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("s", "s1"), "id1")
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("s", "s2"), "id2")
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val union = (size(col("s1")) + size(col("s2"))).cast("double") - inter
    val est = matches.cast("double") / lit(Dedup.MinHashK.toDouble)
    withSets
      .select(col("id1"), col("id2"), est.as("est_j"), (inter / union).as("jac"),
        round(abs(est - inter / union), 6).as("abs_err"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Soft dedup via cluster-multiplicity weights (x104): instead of
    * DROPPING near-duplicates (x26/x66's hard dedup), keep each
    * cluster's best copy ONCE carrying weight = cluster size — the
    * reweighting form of dedup used when duplication frequency is
    * itself signal (loss weighting, sampling temperature) and the
    * corpus must shrink without losing the multiplicity distribution.
    * Output per representative: its weight, its own token count, and
    * weight * tokens (the effective token mass the rep stands in for).
    *
    * Scale shape: inherits x26/x66's cluster machinery wholesale
    * (banded LSH equi-joins, O(diameter) label propagation); the
    * additions are two primitive hash aggregates on the cluster key
    * (size, then the x66 two-phase argmax) and one id equi-join to pull
    * the rep's token count. No window over members, no text shuffle.
    */
  private def x104(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir)
      .withColumn("quality", TextOps.quality(col("text")))
      .withColumn("n_tokens", TextOps.wsTokenCount(col("text"))))
    // labels feed the size agg, the argmax, and the rep-token join — cut
    val labeled = Checkpoints.cut(corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"), col("quality"), col("n_tokens")))
    // null-safe two-phase argmax fused with the size aggregate
    // (Dedup.clusterRepsWeighted, round-20): one pass elects the rep AND
    // carries the cluster weight — the separate sizes aggregate + join is
    // gone; values identical (DedupSpec pins the fusion).
    val repW = Dedup.clusterRepsWeighted(
      labeled.select(col("doc_id").as("id"), col("cluster"), col("quality")))
    repW
      .join(labeled.select(col("doc_id").as("rep_id"), col("n_tokens")), "rep_id")
      .select(col("rep_id"), col("weight"), col("n_tokens"),
        (col("weight") * col("n_tokens")).as("weighted_tokens"))
      .orderBy(col("rep_id"))
  }

  /** RRF constant and per-arm candidate depth for hybrid fusion. */
  private val RrfK = 60.0
  private val RrfDepth = 50

  /** Hybrid retrieval via reciprocal-rank fusion (x105): the standard
    * production shape for combining a LEXICAL ranking (x31's BM25 over
    * the fixed query terms) with a SEMANTIC ranking (exact cosine to a
    * fixed query vector) — each arm contributes 1/(k + rank) with
    * k = 60, so neither arm's raw score scale matters and a document
    * ranked well by BOTH arms dominates either alone. Arms are
    * depth-capped at 50 (the re-rank window), fused with a full-outer
    * id join (a doc in one list only still scores), top-20 out.
    *
    * Scale shape: the lexical arm is x31's (term-filtered explode,
    * broadcast df/totals — the posting-list slice of the query terms,
    * never the full corpus index); the semantic arm is one broadcast
    * scalar-vector scan (x08's certification shape with |Q| = 1); each
    * arm ends in a TakeOrdered top-50 (never a full sort), and the
    * fusion join is two 50-row frames. Rank-window work after the
    * depth cap is constant-size at any corpus scale.
    */
  private def x105(s: SparkSession, dir: String): DataFrame = {
    val lexTop = bm25Scores(s, dir)
      .orderBy(col("score").desc, col("doc_id")).limit(RrfDepth)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val qv = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val semTop = e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosineStatic(col("qv"), col("v"),
          Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim), EmbDim), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(RrfDepth)
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("sem_rank"))
    lexTop.join(semTop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Production IVF profile certified by x106: corpus vectors spill into
    * their [[ProdSpill]] nearest cells, queries probe the arms in
    * [[ProdNprobes]] (both measured; the larger is the >= 0.9 operating
    * point on the isotropic fixture — see tools.AnnSweep).
    */
  private[graft] val ProdSpill = 2
  private[graft] val ProdNprobes = Seq(2, 4)

  /** Production-profile ANN recall certification (x106): round 16's x102
    * measured the FIXED 16-cell index honestly at recall@10 = 0.49
    * (nprobe 2) on the unreplicated fixture; this query certifies the
    * PRODUCTION profile chosen from the tools.AnnSweep measurement
    * table: cells = ceil(sqrt(N)) (the standard IVF sizing — candidate
    * fraction per probe shrinks as 1/sqrt(N)), corpus vectors
    * multi-assigned ("spilled") to their 2 nearest cells (the measured
    * dominant lever: at EQUAL candidate volume spill-2 beats every
    * single-assignment arm — it converts Voronoi-boundary misses, which
    * is where isotropic data loses its neighbors), queries probing 2
    * and 4 cells. Measured on this worst-case fixture (isotropic
    * embeddings — within-label and cross-label cosine both ~0, no
    * cluster structure to exploit): recall@10 = 0.93 mean at ~17% of
    * corpus scanned (nprobe 4, sf0.1), 0.90 at ~9% (nprobe 2). The
    * per-query candidate count rides in the output as n_cands, so the
    * recall/COST trade is the certified artifact itself, not a claim.
    *
    * Scale shape: identical to x102 — truth is one corpus scan against
    * the broadcast fixed sample; training cost is the k-means build
    * (persisted via AnnModels, amortized across queries); the serve
    * join is a cell-keyed equi-join whose volume is
    * spill * nprobe * N / sqrt(N) rows per query — sublinear fraction,
    * measured in-artifact. Nothing is ever corpus x corpus.
    */
  private def x106(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
    val truth = Similarity.bruteForceTopK(e, q, RecallK, dim = EmbDim)
      .select(col("qid"), col("vec_id"))
    // index-BUILD step (one count + persisted k-means training): cell
    // count is a function of corpus size, so the profile tracks growth;
    // training runs on the deterministic ~50-per-cell sample (mod 1 =
    // full corpus at fixture scales, 28x fewer training vectors at sf100
    // — the standard train-on-sample / assign-everything IVF build)
    val nCorpus = e.count()
    val cells = Similarity.sqrtCells(nCorpus)
    val trainMod = Similarity.trainSampleMod(nCorpus, cells)
    // mod 1 = the full corpus: pass train = None so the model artifact is
    // SHARED with full-train callers instead of persisting a bit-identical
    // duplicate under a _t descriptor (r17 ADVICE)
    val train =
      if (trainMod == 1L) None
      else Some(e.filter(pmod(col("vec_id"), lit(trainMod)) === 0))
    val trained = AnnModels.ivfCentroids(
      s, dir, e, cells, KmIters, EmbDim, train = train)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    // spill assignment: each corpus vector lives in its 2 nearest cells
    val assigned = Checkpoints.cut(Similarity.ivfProbe(e, cents, EmbDim, ProdSpill))
    def arm(nprobe: Int): DataFrame = {
      // the certified surface IS the serve API: the same ivfCandidates
      // frame feeds production ivfSearchTopK and this audit
      val scored = Similarity.ivfCandidates(assigned, q, cents, EmbDim, nprobe)
      val nc = scored.groupBy(col("qid")).agg(count(lit(1)).as("n_cands"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val hits = scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= RecallK)
        .join(truth, Seq("qid", "vec_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
      q.select(col("vec_id").as("qid"))
        .join(nc, Seq("qid"), "left")
        .join(hits, Seq("qid"), "left")
        .select(lit(nprobe.toLong).as("nprobe"), col("qid"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") /
            lit(RecallK.toDouble), 4).as("recall"))
    }
    ProdNprobes.map(arm).reduce(_.union(_)).orderBy(col("nprobe"), col("qid"))
  }

  /** Query-sample size, per-query term budget, and fused output depth
    * for the x107 multi-query fusion certification. The sample is a
    * FIXED count (x102's discipline — the per-query frames must stay
    * broadcast-able at any corpus size); the term budget bounds the
    * posting-list slice each lexical query drags in.
    */
  private[graft] val RrfQ = 25
  private[graft] val RrfQTerms = 8
  private[graft] val RrfOut = 10

  /** Multi-query RRF certification (x107): the x102 discipline — a fixed
    * query sample, per-query measurement, engine-reproducible output —
    * applied to x105's hybrid fusion, which certifies RRF at ONE point
    * (query vec 0 + a fixed term set). Here every sample doc is a query:
    * its lexical arm is BM25 over its own [[RrfQTerms]] RAREST distinct
    * tokens (rarest-first term selection is the standard bounded-cost
    * query form — it minimizes the dragged posting lists; ties break on
    * the token), its semantic arm is exact cosine from its embedding,
    * both arms depth-[[RrfDepth]], fused per query with 1/(k + rank)
    * and the top [[RrfOut]] kept. Self-retrieval is excluded in both
    * arms. This certifies fusion over a query DISTRIBUTION instead of a
    * point: 25 queries x 10 fused rows, each carrying both arm ranks.
    *
    * Scale shape: document frequency is one distinct+count aggregate
    * (vocabulary-sized output, broadcast); the posting slice is
    * semi-joined to the <= RrfQ * RrfQTerms selected terms BEFORE the tf
    * shuffle (O(matching postings), never the corpus token stream); the
    * semantic arm is one corpus scan against the broadcast sample
    * (x08's certification shape). Every rank window partitions by qid
    * over candidate-bounded sets only — the groupBy-qid form that keeps
    * per-query top-k scale-safe — and the fusion join holds at most
    * 2 * RrfDepth rows per query.
    */
  private def x107(s: SparkSession, dir: String): DataFrame = {
    // Tokenize ONCE, wide, materialized (round-20): three consumers (dl,
    // document frequency, the postings slice) each re-ran the tokenizer
    // over the single-split corpus scan — profiled as back-to-back
    // single-task ~1 s jobs. The cut token frame is read as blocks by
    // all three; Width.atLeastCores spreads the one tokenize pass and is
    // a no-op at real corpus width.
    val docs = Checkpoints.cut(
      graft.util.Width.atLeastCores(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("tk")))
    val dl = docs.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    // document frequency with the dedup MAP-SIDE: array_distinct inside
    // each row before the explode guarantees (doc, tok) uniqueness
    // without shuffling the token stream, and the groupBy(tok) then
    // partial-aggregates to vocabulary size per partition — a
    // corpus-wide `.distinct()` here instead shuffles every (doc, tok)
    // pair at full width (measured 126 s at 500k docs, ~5x this shape)
    val distinctToks = docs
      .select(col("doc_id"), explode(array_distinct(col("tk"))).as("tok"))
    val dft = distinctToks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val byRarity = Window.partitionBy(col("qid")).orderBy(col("df"), col("tok"))
    val qterms = distinctToks.filter(col("doc_id") < RrfQ)
      .select(col("doc_id").as("qid"), col("tok"))
      .join(broadcast(dft), "tok")
      .withColumn("trnk", row_number().over(byRarity))
      .filter(col("trnk") <= RrfQTerms)
      .select(col("qid"), col("tok"), col("df"))
    // postings slice: the explode is map-side and the broadcast semi-join
    // drops non-query tokens BEFORE the (doc, tok) tf shuffle
    val tf = docs.select(col("doc_id"), explode(col("tk")).as("tok"))
      .join(broadcast(qterms.select(col("tok")).distinct()), Seq("tok"), "left_semi")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5))
    val num = col("tf").cast("double") * lit(Bm25K1 + 1.0)
    val den = col("tf").cast("double") +
      lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl)
    val lexScore = tf
      .join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("qid"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("qid"), col("doc_id"), (idf * (num / den)).as("contrib"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(graft.util.Exact.dsum(col("contrib"), 8), 6).as("score"))
    val byLex = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val lexTop = lexScore
      .withColumn("lex_rank", row_number().over(byLex).cast("long"))
      .filter(col("lex_rank") <= RrfDepth)
      .select(col("qid"), col("doc_id"), col("lex_rank"))
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    // Norms factored out of the pair fan-out (round-20, same as ivfProbe):
    // inline they were recomputed once per (corpus, query) pair — a full
    // extra dot product each. Same expressions, same IEEE doubles.
    val qv = e.filter(col("vec_id") < RrfQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        Similarity.norm(col("v"), EmbDim).as("qn"))
    val bySem = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("doc_id"))
    // Widened like bruteForceTopK's corpus side (round-21): the exact
    // cosine pass over corpus x RrfQ queries ran as one task on the
    // single-split embeddings scan (profiled: a 2 s single-task job —
    // the query's longest). No-op at real corpus width.
    val semTop = graft.util.Width.atLeastCores(e)
      .select(col("vec_id"), col("v"), Similarity.norm(col("v"), EmbDim).as("vn"))
      .crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("doc_id"),
        round(Similarity.cosineStatic(col("qv"), col("v"),
          col("qn"), col("vn"), EmbDim), 6).as("cos"))
      .withColumn("sem_rank", row_number().over(bySem).cast("long"))
      .filter(col("sem_rank") <= RrfDepth)
      .select(col("qid"), col("doc_id"), col("sem_rank"))
    val byRrf = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id"))
    lexTop.join(semTop, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)), 6).as("rrf"))
      .withColumn("frnk", row_number().over(byRrf).cast("long"))
      .filter(col("frnk") <= RrfOut)
      .orderBy(col("qid"), col("frnk"))
  }

  /** Signature widths measured by the x108 calibration (nested-prefix
    * family: width k uses components 0..k-1, so one 16-wide signature
    * computation calibrates every row).
    */
  private[graft] val CalibKs = Seq(4, 8, 16)

  /** Calibrated width selection (x108): closes the x103 loop — x103
    * MEASURES per-pair signature error at the default width; this query
    * turns the measurement into the WIDTH DECISION. For k in
    * [[CalibKs]] (nested prefixes of one 16-component signature), every
    * LSH candidate pair's |estimate - exact Jaccard| is aggregated to
    * (n_pairs, mean_err, p99_err) — the p99 TAIL is the deciding
    * statistic, because a single band collision can hand a
    * near-zero-Jaccard pair a high estimate and the mean hides exactly
    * that pair (x103's measured max_err = 0.86 outlier). chosen_k =
    * the narrowest width whose p99 meets [[Dedup.CalibTargetP99]]
    * (sketch cost is linear in k), else the widest measured.
    * [[Dedup.suggestWidthsMeasured]] is the same decision as a function
    * — the certification spec pins the two agreeing on this table.
    *
    * Scale shape: candidates from the banded equi-join (never
    * all-pairs, df-capped); per pair the three estimates are <= 16
    * codegen'd integer comparisons; the p99 is a DISCRETE rank statistic
    * (row ceil(0.99 n) of the (abs_err, id1, id2) order — deterministic
    * on any engine, no interpolated percentile), one rank window per k
    * over the candidate-bounded error table.
    */
  private def x108(s: SparkSession, dir: String): DataFrame = {
    val sh = Checkpoints.cut(
      plantedDocs(s, dir).select(col("doc_id"), Dedup.shingles(col("text")).as("s")))
    val wide = CalibKs.max
    val sigs = sh.select(
      (col("doc_id") +:
        (0 until wide).map(i =>
          Dedup.minhashComponent(transform(col("s"), x => TextOps.polyHash(x)), i).as(s"mh$i"))): _*)
      // shingle-less docs drop before banding (x103's NaN-Jaccard weld)
      .filter(col("mh0").isNotNull)
    // candidates from the DEFAULT production banding (first 8 components,
    // 4 bands x 2 rows) — one fixed pair set so the per-k error columns
    // are measured on identical pairs
    val cands = Dedup.lshCandidates(sigs, "doc_id")
    val a = sigs.select(
      col("doc_id").as("id1") +: (0 until wide).map(i => col(s"mh$i").as(s"a$i")): _*)
    val b = sigs.select(
      col("doc_id").as("id2") +: (0 until wide).map(i => col(s"mh$i").as(s"b$i")): _*)
    val withSets = cands.join(a, "id1").join(b, "id2")
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("s", "s1"), "id1")
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("s", "s2"), "id2")
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val union = (size(col("s1")) + size(col("s2"))).cast("double") - inter
    val jac = inter / union
    val perK = CalibKs.map { k =>
      val m = (0 until k)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      struct(lit(k.toLong).as("k"),
        round(abs(m.cast("double") / lit(k.toDouble) - jac), 6).as("abs_err"))
    }
    val errs = Checkpoints.cut(withSets
      .select(col("id1"), col("id2"), explode(array(perK: _*)).as("e"))
      .select(col("e.k").as("k"), col("id1"), col("id2"), col("e.abs_err").as("abs_err")))
    val st = errs.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        round(graft.util.Exact.dsum(col("abs_err"), 8) / count(lit(1)), 6).as("mean_err"))
    val byErr = Window.partitionBy(col("k")).orderBy(col("abs_err"), col("id1"), col("id2"))
    val p99 = errs.withColumn("rn", row_number().over(byErr).cast("long"))
      .join(st.select(col("k"), col("n_pairs")), "k")
      .filter(col("rn") === ceil(lit(0.99) * col("n_pairs")).cast("long"))
      .select(col("k"), col("abs_err").as("p99_err"))
    val table = st.join(p99, "k")
    val chosen = table.agg(coalesce(
      min(when(col("p99_err") <= Dedup.CalibTargetP99, col("k"))),
      max(col("k"))).as("chosen_k"))
    table.crossJoin(broadcast(chosen)).orderBy(col("k"))
  }

  /** Index-feasibility audit (x109): measures whether the embedding
    * corpus has the cluster structure an ANN index needs to be
    * SUBLINEAR — the decision a 100 TB pipeline must make BEFORE paying
    * for an index build. This round's own ANN work is the motivation:
    * the fixture measured isotropic (within-label and cross-label cosine
    * both ~0), which is exactly the regime where recall/cost goes
    * near-linear for ANY partitioning index, and that fact should be an
    * operator's measured output, not a post-hoc diagnosis.
    *
    * Per sample query (the fixed [[RecallQ]] ids): its top-1 and mean
    * top-10 exact cosine to the corpus. Next to them, the ISOTROPIC
    * BASELINE E[max cos] ~ sqrt(2 ln N / d) (the extreme-value estimate
    * for N random directions in d dims — what "nearest neighbour"
    * scores when there are no real neighbours), the sample's DISCRETE
    * median top-1 (rank statistic, engine-reproducible), and the
    * verdict: indexable = median top-1 >= baseline +
    * [[graft.ops.Similarity.FeasibilityExcess]] (real cluster
    * structure puts nearest neighbours above the random-match line; a
    * corpus failing this gate should budget for the measured x106
    * linear-fraction costs instead of assuming index speedups). The
    * threshold is additive and itself measured — the line grows as
    * sqrt(ln N) while cluster top-1 cosine is N-independent, so a
    * ratio gate drifts with scale; 0.15 separates the isotropic
    * fixtures (excess -0.07 to -0.08 at N=500, 2k, and 20k) from the
    * r18 planted-cluster fixture (+0.29 at N=2k, +0.23 at N=20k, both
    * served at recall 1.000) — see the constant's doc for the full
    * calibration table.
    *
    * Scale shape: one corpus scan against the broadcast sample (x08's
    * certification cost), one RecallK-deep rank window per query, and
    * sample-sized aggregates. Output is sample-sized at any corpus
    * scale.
    */
  private def x109(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
    val top = Similarity.bruteForceTopK(e, q, RecallK, dim = EmbDim)
    val perQ = Checkpoints.cut(top.groupBy(col("qid")).agg(
      max(when(col("rnk") === 1L, col("cos"))).as("top1_cos"),
      round(graft.util.Exact.dsum(col("cos"), 8) / count(lit(1)), 6).as("mean10_cos")))
    val n = e.agg(count(lit(1)).as("n_corpus"))
    val byTop1 = Window.orderBy(col("top1_cos"), col("qid"))
    // median = the majority vote; p10 = the minority-tail rank twin the
    // r19 gray-zone sweep motivated (a mixed corpus's minority lives in
    // the other regime — see Similarity.FeasibilityExcess). Same
    // window, two discrete rank picks, one aggregate row.
    val stats = perQ
      .withColumn("rn", row_number().over(byTop1).cast("long"))
      .crossJoin(broadcast(perQ.agg(count(lit(1)).as("n_q"))))
      .agg(
        max(when(col("rn") === ceil(lit(0.5) * col("n_q")).cast("long"), col("top1_cos")))
          .as("median_top1"),
        max(when(col("rn") === ceil(lit(0.1) * col("n_q")).cast("long"), col("top1_cos")))
          .as("p10_top1"))
    perQ
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("top1_cos"), col("mean10_cos"), col("n_corpus"),
        round(sqrt(lit(2.0) * log(col("n_corpus").cast("double")) / lit(EmbDim.toDouble)), 6)
          .as("iso_baseline"),
        col("median_top1"), col("p10_top1"))
      .withColumn("indexable",
        (col("median_top1") >= col("iso_baseline") + lit(Similarity.FeasibilityExcess))
          .cast("int"))
      .withColumn("tail_indexable",
        (col("p10_top1") >= col("iso_baseline") + lit(Similarity.FeasibilityExcess))
          .cast("int"))
      .orderBy(col("qid"))
  }

  /** PQ geometry and re-rank depths for the x110 compressed-serving
    * certification: 16 subspaces x 16 codewords = 64 bits per vector
    * against 64 float32 dims = 256 bytes — a 32x candidate-scan
    * compression. Depths are the knob being certified: how much exact
    * re-rank buys back the quantization loss.
    */
  private[graft] val Pq2M = 16
  private[graft] val Pq2SubDim = EmbDim / Pq2M
  private[graft] val Pq2K = 16
  private[graft] val RerankRs = Seq(30, 100)

  /** PQ-shortlist + exact re-rank certification (x110): the compressed
    * serving form behind billion-vector indexes — candidates are scored
    * against PRODUCT-QUANTIZED reconstructions (64 bits/vector here,
    * 32x less scan bandwidth than raw float32), the top R survive, and
    * only those R get exact-cosine re-ranked for the final top-k. x28
    * certifies the PQ approximation in isolation; this certifies the
    * full trade a serving deployment actually makes: recall@10 vs the
    * re-rank depth R, measured against exact brute-force truth on the
    * fixed query sample. On the isotropic fixture (the floor), R = 30
    * recovers ~0.5 and R = 100 ~0.9 — the measured rule for sizing R
    * before shipping a compressed index.
    *
    * Scale shape: the approx pass is one corpus scan of model-sized
    * reconstructions against the broadcast sample (at deployment the
    * scan reads 8-byte codes + a 256-entry lookup table instead of raw
    * vectors — the 32x); the exact pass touches only R * |Q| rows (the
    * re-rank join is id-keyed against the corpus); every window is
    * rank-limited per qid. Output is sample-sized at any corpus scale.
    */
  private def x110(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val truth = Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < RecallQ), RecallK, dim = EmbDim)
      .select(col("qid"), col("vec_id"))
    val cb = AnnModels.pqCodebooks(s, dir, e, Pq2M, Pq2SubDim, Pq2K, KmIters)
    val recon = Similarity.pqReconstruct(Similarity.pqEncode(e, cb, Pq2SubDim), cb)
    // one approx pass feeds both depth arms — cut so the PQ scan runs once
    val approx = Checkpoints.cut(recon.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosineStatic(col("qv"), col("rv"),
          Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("rv"), EmbDim),
          EmbDim), 6).as("acos")))
    val byApprox = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("vec_id"))
    val byExact = Window.partitionBy(col("qid")).orderBy(col("ecos").desc, col("vec_id"))
    def arm(r: Int): DataFrame = {
      val shortlist = approx
        .withColumn("prk", row_number().over(byApprox))
        .filter(col("prk") <= r)
        .select(col("qid"), col("vec_id"))
      val hits = shortlist
        .join(e, "vec_id")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineStatic(col("qv"), col("v"),
            Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim),
            EmbDim), 6).as("ecos"))
        .withColumn("rnk", row_number().over(byExact))
        .filter(col("rnk") <= RecallK)
        .join(truth, Seq("qid", "vec_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
      q.select(col("qid"))
        .join(hits, Seq("qid"), "left")
        .select(lit(r.toLong).as("rerank_r"), col("qid"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") /
            lit(RecallK.toDouble), 4).as("recall"))
    }
    RerankRs.map(arm).reduce(_.union(_)).orderBy(col("rerank_r"), col("qid"))
  }

  /** x111 epoch budget: fixed (the x63 MixBudget discipline) and ~2x the
    * audit corpus's rep count, so repeat factors land in the 1-10 range
    * where proportionality is visible and the div/mod spread exercises
    * both branches.
    */
  private[graft] val WMixBudget = 500L

  /** Weighted epoch materialization (x111): makes x104's soft-dedup
    * weights LOAD-BEARING — the round-16/17 open loop. x104 shrinks the
    * corpus to one representative per duplicate cluster carrying
    * weight = cluster size; this query materializes a training epoch
    * whose per-rep repeat counts are apportioned FROM those weights, so
    * a rep that stood in for 5 duplicates is sampled ~5x as often as a
    * singleton — hard dedup's storage shrink with the original
    * multiplicity distribution preserved in the training stream, which
    * is the entire point of computing soft-dedup weights.
    *
    * Apportionment is exact and hierarchical (every stage integer, the
    * x63/x93 discipline): reps group into WEIGHT STRATA (distinct
    * cluster sizes — a catalog: at most max-cluster-size rows); the
    * budget splits over strata by largest-remainder on stratum mass
    * (weight x rep count, i.e. the original doc mass the stratum stands
    * for), so cross-stratum allocation is proportional to duplication
    * frequency; within a stratum every rep carries the SAME weight, so
    * the stratum's allocation spreads uniformly by deterministic pick
    * rank (x97's div/mod form). Sum over the output of n_repeats ==
    * the budget EXACTLY (CertificationSpec pins the conservation).
    *
    * Scale shape: x104's cluster machinery wholesale; after it, one
    * dimension-sized largest-remainder window (strata are a catalog)
    * and one bucket-decomposed per-stratum rank
    * ([[graft.ops.Ranks.groupRowNumber]] — no per-stratum sort, no
    * single-partition corpus window). Nothing corpus-sized moves after
    * the rep frame.
    */
  private def x111(s: SparkSession, dir: String): DataFrame =
    weightedEpochPicks(s, dir).orderBy(col("rep_id"))

  /** Shared x111/x113 weighted materialization: x104's cluster chain to
    * (rep_id, weight, pick_rank, n_repeats > 0). One definition so the
    * pick set and the shard plan can never desync.
    */
  private def weightedEpochPicks(s: SparkSession, dir: String): DataFrame = {
    // x104's chain verbatim (same corpus, labels, sizes, null-safe reps)
    val corpus = Checkpoints.cut(dedupCorpus(s, dir)
      .withColumn("quality", TextOps.quality(col("text"))))
    val labeled = Checkpoints.cut(corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"), col("quality")))
    // (rep_id, weight): the x104 surface this query consumes — one fused
    // rep+size aggregate (round-20), cut because it feeds the strata
    // aggregate AND the pick-rank materialization
    val repW = Checkpoints.cut(
      Dedup.clusterRepsWeighted(
          labeled.select(col("doc_id").as("id"), col("cluster"), col("quality")))
        .select(col("rep_id"), col("weight")))
    // weight strata (a catalog); mass = the original doc count the
    // stratum's reps stand in for
    val strata = repW.groupBy(col("weight")).agg(count(lit(1)).as("n_reps"))
    // exact largest-remainder over stratum mass (the shared integer
    // quota kernel; tie-break key = the stringified weight). Cut like
    // x93/x97's allocation rounds: the quota windows run once over the
    // catalog-sized generation, and the served plan stays a broadcast
    // hash join of a materialized table.
    val alloc = Checkpoints.cut(CorpusMix.remainderAllocation(
      strata.select(col("weight").cast("string").as("source"),
        col("weight"), col("n_reps"),
        (col("weight") * col("n_reps")).as("w")), WMixBudget)
      .select(col("weight"), col("n_reps"), col("alloc")))
    // materialize=true (round-21 A/B: x113 1.17x, x111 1.06x): the hash
    // column re-ran per rank branch over the repW blocks.
    val ranked = Ranks.groupRowNumber(
      repW.withColumn("hd",
        TextOps.polyHash(concat(lit("wmix#"), col("rep_id").cast("string")))),
      "weight", "hd", "rep_id", materialize = true)
    ranked.join(broadcast(alloc), "weight")
      .select(col("rep_id"), col("weight"), col("row_num").as("pick_rank"),
        (expr("alloc div n_reps") +
          when(col("row_num") <= expr("alloc % n_reps"), 1L).otherwise(0L))
          .cast("long").as("n_repeats"))
      .filter(col("n_repeats") > 0)
  }

  /** Weighted epoch/shard plan (x113): x99's terminal export step
    * applied to the SOFT-DEDUP chain — x104 weights -> x111 repeat
    * counts -> THIS: explode each rep's n_repeats into per-epoch rows
    * (a rep with r repeats appears in epochs 0..r-1, so epoch e's
    * corpus is exactly the reps with n_repeats > e — repeats spread
    * ACROSS epochs, never duplicated within one) and assign each
    * (rep, epoch) copy a deterministic shard by content hash. The
    * output is the budget MATERIALIZED: exactly [[WMixBudget]] rows
    * (CertificationSpec pins the count — conservation carried through
    * the explode), each a write instruction for a shard writer. With
    * x113 the soft-dedup loop runs weights -> allocation -> repeats ->
    * physical plan end to end, the same completeness x97 -> x99 gives
    * the hard-mix chain.
    *
    * Scale shape: everything after x111's dimension-sized allocation
    * is map-only (explode fan-out = the per-rep repeat count, shard
    * hash fused into the scan); output is budget-sized, ids only.
    */
  private def x113(s: SparkSession, dir: String): DataFrame =
    weightedEpochPicks(s, dir)
      .select(col("rep_id"), col("weight"),
        explode(sequence(lit(0L), col("n_repeats") - 1)).as("epoch"))
      .select(col("rep_id"), col("weight"), col("epoch"),
        pmod(TextOps.polyHash(concat(col("rep_id").cast("string"), lit("#"),
          col("epoch").cast("string"))), lit(PlanShards.toLong))
          .cast("int").as("shard"))
      .orderBy(col("rep_id"), col("epoch"))

  /** Composed IVF-PQ serving certification (x112): the production
    * billion-vector layout — x106 certifies IVF with EXACT candidate
    * scoring, x110 certifies PQ scanned over the FULL corpus; real
    * compressed serving composes them: probe the query's nearest cells,
    * PQ-score ONLY those cells' members (the inverted lists store 64-bit
    * codes, not raw vectors — x110's 32x scan-bandwidth compression now
    * applied to x106's sublinear candidate fraction), exact-re-rank the
    * top R survivors. Measured here: recall@10 against brute-force
    * truth per re-rank depth R, with the per-query IVF candidate count
    * riding as n_cands — by construction IDENTICAL to x106's nprobe-4
    * candidate volume (CertificationSpec pins the equality), so the
    * composed cost point reads directly off the two parent
    * certifications: x106's candidate fraction at x110's scan
    * bandwidth, with only quantization loss (bought back by R) in
    * between.
    *
    * Scale shape: both model builds are persisted artifacts (AnnModels —
    * shared bit-identical with x106's IVF and x110's codebooks); the
    * serve join is the cell-keyed equi-join over lists that carry
    * model-reconstructed vectors (at deployment: 8-byte codes + a
    * 256-entry table); the PQ scoring pass therefore touches
    * spill * nprobe * N / sqrt(N) rows per query, NEVER the corpus; the
    * exact pass touches R * |Q| rows. Windows are rank-limited per qid.
    */
  private def x112(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val ed = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < RecallQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val truth = Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < RecallQ), RecallK, dim = EmbDim)
      .select(col("qid"), col("vec_id"))
    // IVF build — x106's profile verbatim, so the persisted model is the
    // SAME artifact (float corpus frame, sampled train, sqrt cells)
    val nCorpus = e.count()
    val cells = Similarity.sqrtCells(nCorpus)
    val trainMod = Similarity.trainSampleMod(nCorpus, cells)
    val train =
      if (trainMod == 1L) None
      else Some(e.filter(pmod(col("vec_id"), lit(trainMod)) === 0))
    val trained = AnnModels.ivfCentroids(
      s, dir, e, cells, KmIters, EmbDim, train = train)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    // PQ build — x110's geometry on x110's double-cast corpus frame, so
    // the persisted codebooks are that query's same artifact
    val cb = AnnModels.pqCodebooks(s, dir, ed, Pq2M, Pq2SubDim, Pq2K, KmIters)
    val recon = Similarity.pqReconstruct(Similarity.pqEncode(ed, cb, Pq2SubDim), cb)
    // the composed index: inverted lists carrying PQ reconstructions,
    // NOT raw vectors (cell-partitioned codes — the deployment layout)
    val lists = Checkpoints.cut(
      Similarity.ivfProbe(e, cents, EmbDim, ProdSpill)
        .select(col("vec_id"), col("cell_id"))
        .join(recon, "vec_id"))
    val nprobe = ProdNprobes.max
    val probed = Similarity.ivfProbe(
      q.select(col("qid").as("vec_id"), col("qv").as("v")), cents, EmbDim, nprobe)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell_id").as("qcell"))
    // candidate generation + PQ scoring in one cell-keyed equi-join;
    // cut: both depth arms and the cost axis read it
    val scored = Checkpoints.cut(lists.join(broadcast(probed),
        col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosineStatic(col("qv"), col("rv"),
          Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("rv"), EmbDim),
          EmbDim), 6).as("acos"))
      .dropDuplicates("qid", "vec_id"))
    val nc = scored.groupBy(col("qid")).agg(count(lit(1)).as("n_cands"))
    val byApprox = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("vec_id"))
    val byExact = Window.partitionBy(col("qid")).orderBy(col("ecos").desc, col("vec_id"))
    def arm(r: Int): DataFrame = {
      val shortlist = scored
        .withColumn("prk", row_number().over(byApprox))
        .filter(col("prk") <= r)
        .select(col("qid"), col("vec_id"))
      val hits = shortlist
        .join(e, "vec_id")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineStatic(col("qv"), col("v"),
            Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim),
            EmbDim), 6).as("ecos"))
        .withColumn("rnk", row_number().over(byExact))
        .filter(col("rnk") <= RecallK)
        .join(truth, Seq("qid", "vec_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
      q.select(col("qid"))
        .join(nc, Seq("qid"), "left")
        .join(hits, Seq("qid"), "left")
        .select(lit(r.toLong).as("rerank_r"), col("qid"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") /
            lit(RecallK.toDouble), 4).as("recall"))
    }
    RerankRs.map(arm).reduce(_.union(_)).orderBy(col("rerank_r"), col("qid"))
  }

  /** Arrival modulus for the x114 staleness audit: vec_id % 5 == 0 rows
    * are "arrivals" — vectors that did not exist when the stale index
    * was trained (20% of the corpus, deterministic, oracle-mirrorable).
    */
  private[graft] val StaleArrivalMod = 5L

  /** Stale-index recall (x114): the incremental-maintenance question
    * every production vector index faces — new vectors arrive
    * continuously; ASSIGNING them into existing cells is one cheap scan,
    * RETRAINING centroids is the expensive rebuild. When is the rebuild
    * due? This query measures the cost of not rebuilding: centroids
    * trained on the 80% BASE corpus only (the pre-arrival era — seeds
    * and training both exclude arrivals), the FULL corpus spill-assigned
    * into those stale cells, vs the fresh x106 index trained on
    * everything (the shared persisted artifact), both serving the fixed
    * query sample at the production profile. Output per (arm, query):
    * candidate count and recall@10 against full-corpus brute truth —
    * recall_stale vs recall_fresh (read NEXT TO the cost axis) is the
    * measured staleness drift, the rebuild trigger's input. Measured on
    * same-distribution arrivals (this fixture): the stale index loses
    * NO recall (0.824 vs 0.786 at sf0.01) — it has ~20% fewer live
    * cells (arrival-era seeds don't exist), so each probe sweeps
    * coarser cells and ~27% MORE candidates (197 vs 155): staleness
    * shows up as serve COST here, not recall. Recall drift appears
    * only when arrivals come from a SHIFTED distribution (clusters the
    * stale centroids never saw); that asymmetry — rebuild for cost on
    * stationary data, for recall on shift — is what the per-arm
    * (n_cands, recall) pair measures.
    *
    * Scale shape: two x106-shaped arms (each: persisted model build,
    * one corpus spill assignment, cell-keyed candidate equi-join,
    * rank-limited windows, broadcast-sample truth scan). Nothing is
    * ever corpus x corpus; output is 2 x sample-sized.
    */
  private def x114(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val base = e.filter(pmod(col("vec_id"), lit(StaleArrivalMod)) =!= 0)
    val q = e.filter(col("vec_id") < RecallQ)
    val truth = Similarity.bruteForceTopK(e, q, RecallK, dim = EmbDim)
      .select(col("qid"), col("vec_id"))
    val nCorpus = e.count()
    val cells = Similarity.sqrtCells(nCorpus)
    val trainMod = Similarity.trainSampleMod(nCorpus, cells)
    val train =
      if (trainMod == 1L) None
      else Some(e.filter(pmod(col("vec_id"), lit(trainMod)) === 0))
    // fresh = x106's exact build (bit-shared persisted artifact);
    // stale = trained when only the base existed (seeds and training
    // corpus both base-only), cells sized for the FULL corpus so the
    // two indexes are like-for-like in candidate volume
    val freshModel = AnnModels.ivfCentroids(
      s, dir, e, cells, KmIters, EmbDim, train = train)
    val staleModel = AnnModels.ivfCentroids(s, dir, base, cells, KmIters, EmbDim)
    def arm(name: String, trained: DataFrame): DataFrame = {
      val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
      // the full corpus — arrivals included — assigns into the arm's
      // cells: for the stale arm this IS the cheap incremental insert
      val assigned = Checkpoints.cut(Similarity.ivfProbe(e, cents, EmbDim, ProdSpill))
      val scored = Similarity.ivfCandidates(assigned, q, cents, EmbDim, ProdNprobes.max)
      val nc = scored.groupBy(col("qid")).agg(count(lit(1)).as("n_cands"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val hits = scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= RecallK)
        .join(truth, Seq("qid", "vec_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
      q.select(col("vec_id").as("qid"))
        .join(nc, Seq("qid"), "left")
        .join(hits, Seq("qid"), "left")
        .select(lit(name).as("arm"), col("qid"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") /
            lit(RecallK.toDouble), 4).as("recall"))
    }
    arm("fresh", freshModel).union(arm("stale", staleModel))
      .orderBy(col("arm"), col("qid"))
  }

  /** dedupCorpus's synthetic-copy id offsets are exact multiples of this
    * span and base ids sit far below it, so `id % span` recovers every
    * copy's base document (and therefore its source) — the attribution
    * rule x115 and its oracle share.
    */
  private val DedupBaseSpan = 100000L

  /** Duplication-corrected temperature mix (x115): x104's soft-dedup
    * weights feeding the SECOND sampling discipline (r17's ask — x111/
    * x113 delivered the epoch-materialization route; this is the
    * temperature route). x63 temperature-allocates over RAW source
    * masses, which double-count duplicated content: a source whose bulk
    * is near-copies looks bigger than the content it contributes. Here
    * the per-source mass is the x104 chain's corrected token mass —
    * each duplicate cluster counted ONCE, at its elected
    * representative, carrying weight x the REP's own token count (the
    * x104 `weighted_tokens` surface aggregated by the rep's source) —
    * and the same exact-integer temperature kernel
    * ([[graft.ops.CorpusMix.temperatureAllocation]], alpha =
    * [[MixAlpha]]) apportions [[MixBudget]] over those masses.
    * raw_tokens rides along for the audit: the gap between raw and
    * corrected mass IS the duplication inflation the correction
    * removes (the chain-tail copies inflate raw mass with re-counted
    * text; the corrected mass counts each cluster's canonical text
    * once at full multiplicity).
    *
    * Scale shape: x104's cluster machinery wholesale; after the rep
    * frame everything is dimension-sized (sources are a catalog) — the
    * source attribution joins broadcast the rep/corpus side against a
    * doc_id-pruned documents scan, and the quota kernel runs its
    * windows over the source catalog. Conservation (Σ alloc ==
    * budget) and mass-monotonicity are CertificationSpec pins.
    */
  private def x115(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir)
      .withColumn("quality", TextOps.quality(col("text")))
      .withColumn("n_tokens", TextOps.wsTokenCount(col("text"))))
    val labeled = Checkpoints.cut(corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"),
        col("quality"), col("n_tokens")))
    // fused rep+size aggregate (round-20; values identical, DedupSpec pin)
    val repW = Dedup.clusterRepsWeighted(
      labeled.select(col("doc_id").as("id"), col("cluster"), col("quality")))
    // base ids are < 120 by dedupCorpus's construction — the source
    // lookup is a pruned scan of documents, broadcast against the
    // audit-sized rep/corpus frames
    val srcOf = broadcast(t(s, dir, "documents")
      .filter(col("doc_id") < 120)
      .select(col("doc_id").as("base_id"), col("source")))
    val mass = repW
      .join(labeled.select(col("doc_id").as("rep_id"), col("n_tokens")), "rep_id")
      .select(pmod(col("rep_id"), lit(DedupBaseSpan)).as("base_id"),
        (col("weight") * col("n_tokens")).as("m"))
      .join(srcOf, "base_id")
      .groupBy(col("source")).agg(sum(col("m")).as("n_docs"))
    val raw = corpus
      .select(pmod(col("doc_id"), lit(DedupBaseSpan)).as("base_id"), col("n_tokens"))
      .join(srcOf, "base_id")
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("raw_tokens"))
    CorpusMix.temperatureAllocation(mass, MixAlpha, MixBudget)
      .join(raw, "source")
      .select(col("source"), col("raw_tokens"), col("n_docs").as("mass"),
        col("w"), col("alloc"))
      .orderBy(col("source"))
  }

  /** Rebuild-trigger audit (x116): the [[graft.ops.AnnModels.rebuildDue]]
    * MEASUREMENT as an oracle-checked row — the x109/x114 promotion
    * pattern applied to the round-19 maintenance API, so the trigger's
    * arithmetic (arrival-sample recall vs the floor, candidate fraction
    * vs 2x design) is gate-checked, not just spec-asserted. The frame
    * IS the production measurement: [[graft.ops.AnnModels.rebuildSummary]]
    * on x114's split (base = vec_id % 5 != 0 trains the stale index —
    * the SAME persisted artifact as x114's stale arm; arrivals are the
    * %5 == 0 rows, sampled at the RecallQ lowest ids), with the verdict
    * columns computed from the summary counts by the same threshold
    * rule the API applies (floor = AnnModels.DefaultRecallFloor, cap =
    * 2x the sqrt-cell design fraction). On this isotropic driver
    * fixture the recall axis sits below the 0.9 floor (the corpus is
    * below the feasibility line — x109 gates FIRST in production; the
    * trigger read on a non-indexable corpus is "you are paying the
    * linear floor, rebuild won't fix that"), so rebuild_due = 1 — the
    * CertificationSpec additionally pins the row equal to the API's
    * own RebuildVerdict on the same inputs.
    *
    * Scale shape: x114's stale arm exactly (persisted model build, one
    * corpus spill assignment, cell-keyed candidate equi-join,
    * rank-limited windows, broadcast-sample truth scan) + a one-row
    * aggregate. Output is ONE row at any corpus size.
    */
  private def x116(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding").as("v"))
    val base = e.filter(pmod(col("vec_id"), lit(StaleArrivalMod)) =!= 0)
    val arrivals = e.filter(pmod(col("vec_id"), lit(StaleArrivalMod)) === 0)
    val cells = Similarity.sqrtCells(e.count())
    val staleModel = AnnModels.ivfCentroids(s, dir, base, cells, KmIters, EmbDim)
    AnnModels.rebuildSummary(
        e, arrivals, staleModel, EmbDim, ProdNprobes.max, ProdSpill, RecallQ, RecallK,
        "vec_id", "v")
      .select(col("n_corpus"), col("n_arrivals"), col("n_sample"),
        col("sum_hits"), col("sum_cands"),
        round(col("sum_hits").cast("double") /
          (lit(RecallK.toDouble) * col("n_sample")), 4).as("recall_arrivals"),
        round(col("sum_cands").cast("double") /
          (col("n_sample") * col("n_corpus")).cast("double"), 6).as("cand_fraction"),
        round(lit((ProdSpill * ProdNprobes.max).toDouble) /
          ceil(sqrt(col("n_corpus").cast("double"))), 6).as("design_fraction"))
      .withColumn("rebuild_due",
        (col("recall_arrivals") < lit(AnnModels.DefaultRecallFloor) ||
          col("cand_fraction") > lit(2.0) * col("design_fraction")).cast("int"))
      .orderBy(col("n_corpus"))
  }

  /** Duplication-corrected IPF mix (x117): x104's weights feeding the
    * THIRD sampling discipline (the r19 verdict's ask — x111/x113 run
    * the epoch route, x115 the temperature route; this closes the
    * marginal-raking route), so every mixer in the family can run
    * duplication-corrected. x75 rakes (lang, source) cells toward
    * temperature marginals computed over RAW document counts — which
    * double-count duplicated content exactly as x63 did before x115.
    * Here BOTH the cell masses and the marginals are the x104 chain's
    * corrected token mass (each duplicate cluster counted once, at its
    * elected representative, weight x the rep's own tokens, attributed
    * at the rep's base doc's (lang, source)), and the identical
    * machinery runs downstream: the exact-integer temperature kernel
    * ([[graft.ops.CorpusMix.temperatureAllocation]]) per marginal, then
    * [[IpfRounds]] decimal-quantized raking rounds. Per-source sums of
    * the corrected cell mass equal x115's mass column by construction
    * (CertificationSpec pins it), so the temperature and raking routes
    * provably consume the same corrected surface.
    *
    * Scale shape: x104's cluster machinery wholesale; the attribution
    * join broadcasts the doc_id-pruned documents slice; everything from
    * the cell-mass frame on is dimension-sized ((lang, source) cells
    * are a catalog), cut once for its three consumers (two marginals +
    * q0), with the raking rounds reading only dimension-sized
    * generations — the x75 plan discipline verbatim.
    */
  private def x117(s: SparkSession, dir: String): DataFrame = {
    val corpus = Checkpoints.cut(dedupCorpus(s, dir)
      .withColumn("quality", TextOps.quality(col("text")))
      .withColumn("n_tokens", TextOps.wsTokenCount(col("text"))))
    val labeled = Checkpoints.cut(corpus
      .join(dupLabels(corpus).withColumnRenamed("id", "doc_id")
        .hint("SHUFFLE_HASH"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"),
        col("quality"), col("n_tokens")))
    // fused rep+size aggregate (round-20; values identical, DedupSpec pin)
    val repW = Dedup.clusterRepsWeighted(
      labeled.select(col("doc_id").as("id"), col("cluster"), col("quality")))
    // base ids are < 120 by dedupCorpus's construction — the (lang,
    // source) lookup is a pruned scan of documents, broadcast against
    // the audit-sized rep frame
    val dims = broadcast(t(s, dir, "documents")
      .filter(col("doc_id") < 120)
      .select(col("doc_id").as("base_id"), col("lang"), col("source")))
    val cellMass = Checkpoints.cut(repW
      .join(labeled.select(col("doc_id").as("rep_id"), col("n_tokens")), "rep_id")
      .select(pmod(col("rep_id"), lit(DedupBaseSpan)).as("base_id"),
        (col("weight") * col("n_tokens")).as("m"))
      .join(dims, "base_id")
      .groupBy(col("lang"), col("source")).agg(sum(col("m")).as("mass")))
    val langT = CorpusMix.temperatureAllocation(
      cellMass.groupBy(col("lang")).agg(sum(col("mass")).as("n_docs"))
        .select(col("lang").as("source"), col("n_docs")),
      MixAlpha, MixBudget)
      .select(col("source").as("lang"), col("alloc").as("lt"))
    val srcT = CorpusMix.temperatureAllocation(
      cellMass.groupBy(col("source")).agg(sum(col("mass")).as("n_docs")),
      MixAlpha, MixBudget)
      .select(col("source"), col("alloc").as("st"))
    def quant(c: Column): Column = c.cast(DecimalType(18, 12)).cast("double")
    // Window-fused raking rounds — x75's round-20 rewrite verbatim (see
    // there): the window total equals the old Exact.dsum marginal bit for
    // bit, with zero broadcast builds in the loop.
    def marginal(k: String): Column =
      sum(col("q").cast(DecimalType(18, 12))).over(Window.partitionBy(col(k)))
        .cast("double")
    var q = cellMass
      .join(broadcast(langT), "lang").join(broadcast(srcT), "source")
      .select(col("lang"), col("source"), col("mass"), col("lt"), col("st"),
        col("mass").cast("double").as("q"))
    for (_ <- 0 until IpfRounds) {
      q = q.withColumn("q", quant(col("q") * (col("lt").cast("double") / marginal("lang"))))
      q = q.withColumn("q", quant(col("q") * (col("st").cast("double") / marginal("source"))))
    }
    q.select(col("lang"), col("source"), col("mass"), col("lt"), col("st"),
      round(col("q"), 6).as("quota"))
      .orderBy(col("lang"), col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "x01_text_stats" -> (x01 _),
    "x02_lang_quality" -> (x02 _),
    "x03_exact_dedup" -> (x03 _),
    "x04_ngram_jaccard_pairs" -> (x04 _),
    "x05_minhash_sig" -> (x05 _),
    "x06_minhash_lsh_pairs" -> (x06 _),
    "x07_simhash" -> (x07 _),
    "x08_cosine_topk" -> (x08 _),
    "x09_embedding_neardup" -> (x09 _),
    "x10_quality_by_source" -> (x10 _),
    "x11_ann_lsh" -> (x11 _),
    "x12_hash_split" -> (x12 _),
    "x13_ann_ivf" -> (x13 _),
    "x14_embedding_dim_stats" -> (x14 _),
    "x15_event_pivot" -> (x15 _),
    "x16_simhash64" -> (x16 _),
    "x17_stratified_sample" -> (x17 _),
    "x18_pii_scrub" -> (x18 _),
    "x19_repetition" -> (x19 _),
    "x20_doc_pack" -> (x20 _),
    "x21_quantized_topk" -> (x21 _),
    "x22_unigram_logprob" -> (x22 _),
    "x23_vocab" -> (x23 _),
    "x24_decontamination" -> (x24 _),
    "x25_ann_ivf_nprobe2" -> (x25 _),
    "x26_dedup_pipeline" -> (x26 _),
    "x27_salted_agg" -> (x27 _),
    "x28_pq_topk" -> (x28 _),
    "x29_source_mix" -> (x29 _),
    "x30_doc_chunk" -> (x30 _),
    "x31_bm25_topk" -> (x31 _),
    "x32_cdc_merge" -> (x32 _),
    "x33_heavy_hitters" -> (x33 _),
    "x34_mmr_rerank" -> (x34 _),
    "x35_budget_select" -> (x35 _),
    "x36_user_anomaly" -> (x36 _),
    "x37_prequential_anomaly" -> (x37 _),
    "x38_fuzzy_match" -> (x38 _),
    "x39_retention_cohorts" -> (x39 _),
    "x40_windowed_top_users" -> (x40 _),
    "x41_weighted_sample" -> (x41 _),
    "x42_burst_dedup" -> (x42 _),
    "x43_incremental_agg" -> (x43 _),
    "x44_substring_dedup" -> (x44 _),
    "x45_bpe_merges" -> (x45 _),
    "x46_bpe_segment" -> (x46 _),
    "x47_semantic_dedup" -> (x47 _),
    "x48_dsir_select" -> (x48 _),
    "x49_bigram_lm" -> (x49 _),
    "x50_quality_classifier" -> (x50 _),
    "x51_pagerank" -> (x51 _),
    "x52_bloom_membership" -> (x52 _),
    "x53_shard_export" -> (x53 _),
    "x54_scd2_history" -> (x54 _),
    "x55_table_profile" -> (x55 _),
    "x56_connected_components" -> (x56 _),
    "x57_gap_fill" -> (x57 _),
    "x58_triangle_sample" -> (x58 _),
    "x59_prefix_join" -> (x59 _),
    "x60_table_profile_sketch" -> (x60 _),
    "x61_incremental_cc" -> (x61 _),
    "x62_source_divergence" -> (x62 _),
    "x62s_divergence_slice" -> (x62s _),
    "x63_temperature_mix" -> (x63 _),
    "x64_quality_calibration" -> (x64 _),
    "x65_lm_holdout_filter" -> (x65 _),
    "x66_cluster_canonical" -> (x66 _),
    "x67_knn_label_vote" -> (x67 _),
    "x68_bitext_margin" -> (x68 _),
    "x68b_bitext_ann" -> (x68b _),
    "x69_mix_materialize" -> (x69 _),
    "x70_corpus_diff" -> (x70 _),
    "x71_padding_waste" -> (x71 _),
    "x72_html_extract" -> (x72 _),
    "x73_url_canonical" -> (x73 _),
    "x74_line_dedup" -> (x74 _),
    "x75_ipf_mix" -> (x75 _),
    "x76_cluster_split" -> (x76 _),
    "x77_curation_funnel" -> (x77 _),
    "x78_semantic_mix" -> (x78 _),
    "x79_dup_ngram_rate" -> (x79 _),
    "x80_doremi_mix" -> (x80 _),
    "x81_bpe_fertility" -> (x81 _),
    "x82_zipf_health" -> (x82 _),
    "x83_cluster_sizes" -> (x83 _),
    "x84_ccnet_buckets" -> (x84 _),
    "x85_winnowing" -> (x85 _),
    "x86_gopher_rules" -> (x86 _),
    "x87_c4_clean" -> (x87 _),
    "x88_langid_confusion" -> (x88 _),
    "x89_semantic_outliers" -> (x89 _),
    "x90_novelty_score" -> (x90 _),
    "x91_semantic_drift" -> (x91 _),
    "x92_taint_propagation" -> (x92 _),
    "x93_epoch_mix" -> (x93 _),
    "x94_domain_gate" -> (x94 _),
    "x95_fuzzy_decontamination" -> (x95 _),
    "x96_contamination_spans" -> (x96 _),
    "x97_epoch_mix_materialize" -> (x97 _),
    "x98_decontamination_scrub" -> (x98 _),
    "x99_epoch_shard_plan" -> (x99 _),
    "x100_byte_scrub" -> (x100 _),
    "x101_span_offsets" -> (x101 _),
    "x102_ann_recall" -> (x102 _),
    "x103_minhash_calibration" -> (x103 _),
    "x104_soft_dedup_weights" -> (x104 _),
    "x105_rrf_fusion" -> (x105 _),
    "x106_ann_recall_prod" -> (x106 _),
    "x107_rrf_multiquery" -> (x107 _),
    "x108_calibrated_widths" -> (x108 _),
    "x109_index_feasibility" -> (x109 _),
    "x110_pq_rerank_recall" -> (x110 _),
    "x111_weighted_epoch_mix" -> (x111 _),
    "x112_ivfpq_rerank" -> (x112 _),
    "x113_weighted_shard_plan" -> (x113 _),
    "x114_stale_index_recall" -> (x114 _),
    "x115_weighted_temperature_mix" -> (x115 _),
    "x116_rebuild_trigger" -> (x116 _),
    "x117_ipf_mix_corrected" -> (x117 _))

  // --- oracle SQL ----------------------------------------------------------

  private val StopEn = TextOps.StopwordPatterns.toMap.apply("en")
  private val StopEs = TextOps.StopwordPatterns.toMap.apply("es")
  private val StopDe = TextOps.StopwordPatterns.toMap.apply("de")
  private val StopFr = TextOps.StopwordPatterns.toMap.apply("fr")

  private val QualitySql =
    """round(least(CAST(ws AS DOUBLE)/100.0, 1.0)*0.5
      | + (CAST(st AS DOUBLE)/(CAST(ws AS DOUBLE)+1.0))*0.3
      | + (1.0 - CAST(pu AS DOUBLE)/(CAST(ws AS DOUBLE)+1.0))*0.2, 6)""".stripMargin

  private def minhashSql(i: Int, hs: String): String =
    // coefficient FUNCTIONS, not the MinHashK-wide cached vectors — the
    // x108 calibration widens to 16 components (same family: widening k
    // never re-keys existing components)
    s"list_min(list_transform($hs, h -> (${Dedup.minHashA(i)} * h + ${Dedup.minHashB(i)}) % ${Dedup.MinHashP}))"

  /** Shared x26/x66 oracle CTE prefix: the engineered corpus through the
    * propagated cluster labels (`corpus`, `sh`, ..., `lab4`). Label
    * propagation is unrolled (the x13 k-means trick): each round is
    * label' = least(own, min over neighbours) — the exact SQL mirror of
    * Dedup.duplicateClusters' neighbourMin + least/coalesce step.
    */
  private lazy val DupClusterCtesSql: String = {
    def labRound(prev: String, out: String): String =
      s"""$out AS (SELECT l.id, least(min(l.label), coalesce(min(nb.label), min(l.label))) AS label
         | FROM $prev l LEFT JOIN adj ON adj.a = l.id LEFT JOIN $prev nb ON nb.id = adj.b
         | GROUP BY l.id)""".stripMargin
    s"""base AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
       |corpus AS (SELECT doc_id, text FROM base
       | UNION ALL SELECT doc_id + 100000, text FROM base WHERE doc_id % 3 = 0
       | UNION ALL SELECT doc_id + 200000, text || ${chainTailSql("chainalpha")} FROM base WHERE doc_id % 3 = 0
       | UNION ALL SELECT doc_id + 300000, text || ${chainTailSql("chainalpha")} || ${chainTailSql("chainbeta")} FROM base WHERE doc_id % 3 = 0),
       |$ShinglesSql,
       |hh AS (SELECT doc_id, s, list_transform(s, x -> ${polySql("x")}) AS hs FROM sh),
       |sig AS (SELECT doc_id, s, ${(0 until Dedup.MinHashK).map(i => minhashSql(i, "hs") + s" AS mh$i").mkString(",\n ")} FROM hh),
       |banded AS (SELECT doc_id, unnest([${(0 until Dedup.LshBands).map(b => s"'$b:' || mh${2 * b} || ':' || mh${2 * b + 1}").mkString(", ")}]) AS band FROM sig),
       |cool AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= ${Dedup.ShingleDfCap}),
       |capped AS (SELECT banded.* FROM banded JOIN cool USING (band)),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM capped a JOIN capped b ON a.band = b.band AND a.doc_id < b.doc_id),
       |nearp AS (SELECT id1, id2 FROM (
       |  SELECT id1, id2,
       |   CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) AS inter,
       |   CAST(len(s1.s) + len(s2.s) AS DOUBLE) - CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) AS uni
       |  FROM cand JOIN sh s1 ON s1.doc_id = id1 JOIN sh s2 ON s2.doc_id = id2)
       | WHERE inter/uni >= 0.5),
       |exact AS (SELECT m AS id1, doc_id AS id2 FROM
       |  (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS m FROM corpus) WHERE doc_id <> m),
       |edges AS (SELECT id1, id2 FROM exact UNION SELECT id1, id2 FROM nearp),
       |adj AS (SELECT id1 AS a, id2 AS b FROM edges UNION SELECT id2, id1 FROM edges),
       |lab0 AS (SELECT DISTINCT a AS id, a AS label FROM adj),
       |${labRound("lab0", "lab1")},
       |${labRound("lab1", "lab2")},
       |${labRound("lab2", "lab3")},
       |${labRound("lab3", "lab4")}""".stripMargin
  }

  /** Shared x63/x69 oracle CTE chain: per-source counts through the
    * largest-remainder allocation, ending in
    * `alc(source, n_docs, w, alloc)`. Mirrors
    * CorpusMix.temperatureAllocation with the given budget.
    */
  /** Generic-key temperature-allocation CTE chain (the x63 kernel over an
    * arbitrary dimension expression of an arbitrary relation),
    * prefix-namespaced so x75 can instantiate it twice (language and
    * source targets) and x78 over IVF cells in one statement. Emits
    * `${p}alc(k, alloc)`. NOTE the largest-remainder tiebreak orders by
    * `k` with ITS OWN type's comparison — a caller keying on a cast
    * expression must mirror the same cast engine-side (x78 compares
    * cell ids as strings in both engines).
    */
  private def tempAllocCtesSql(
      key: String, p: String, budget: Long, from: String = "documents",
      agg: String = "count(*)"): String =
    s"""${p}c AS (SELECT $key AS k, CAST($agg AS BIGINT) AS n_docs FROM $from GROUP BY $key),
       |${p}w AS (SELECT k, n_docs,
       |  CAST(floor(power(CAST(n_docs AS DOUBLE), $MixAlpha) * 1000000.0) AS BIGINT) AS w FROM ${p}c),
       |${p}t AS (SELECT SUM(CAST(w AS HUGEINT)) AS tw FROM ${p}w),
       |${p}q AS (SELECT k, n_docs, w,
       |  (CAST($budget AS HUGEINT) * w) // tw AS base, (CAST($budget AS HUGEINT) * w) % tw AS rem FROM ${p}w CROSS JOIN ${p}t),
       |${p}s AS (SELECT $budget - SUM(base) AS short FROM ${p}q),
       |${p}r AS (SELECT ${p}q.*, row_number() OVER (ORDER BY rem DESC, k) AS rk FROM ${p}q),
       |${p}alc AS (SELECT k, CAST(base + CASE WHEN rk <= (SELECT short FROM ${p}s) THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM ${p}r)""".stripMargin

  /** One unrolled IPF round for the x75 oracle: rescale rows (lang) to
    * their targets, then columns (source) — marginal sums decimal-exact
    * at scale 12, every rescaled cell re-quantized at scale 12, factor
    * applied as `q * (target / m)`, mirroring the engine's op order.
    */
  private def ipfRoundSql(in: String, r: Int): String =
    s"""lm$r AS (SELECT lang, CAST(SUM(CAST(q AS DECIMAL(18,12))) AS DOUBLE) AS m FROM $in GROUP BY lang),
       |ql$r AS (SELECT c.lang, c.source, c.n_docs, c.lt, c.st,
       |  CAST(CAST(c.q * (c.lt / lm$r.m) AS DECIMAL(18,12)) AS DOUBLE) AS q
       | FROM $in c JOIN lm$r USING (lang)),
       |sm$r AS (SELECT source, CAST(SUM(CAST(q AS DECIMAL(18,12))) AS DOUBLE) AS m FROM ql$r GROUP BY source),
       |q$r AS (SELECT c.lang, c.source, c.n_docs, c.lt, c.st,
       |  CAST(CAST(c.q * (c.st / sm$r.m) AS DECIMAL(18,12)) AS DOUBLE) AS q
       | FROM ql$r c JOIN sm$r USING (source))""".stripMargin

  private def tempMixCtesSql(budget: Long): String =
    s"""c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
       |w AS (SELECT source, n_docs,
       |  CAST(floor(power(CAST(n_docs AS DOUBLE), $MixAlpha) * 1000000.0) AS BIGINT) AS w FROM c),
       |t AS (SELECT SUM(CAST(w AS HUGEINT)) AS tw FROM w),
       |q AS (SELECT source, n_docs, w,
       |  (CAST($budget AS HUGEINT) * w) // tw AS base, (CAST($budget AS HUGEINT) * w) % tw AS rem FROM w CROSS JOIN t),
       |s AS (SELECT $budget - SUM(base) AS short FROM q),
       |r AS (SELECT q.*, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q),
       |alc AS (SELECT source, n_docs, w,
       |  CAST(base + CASE WHEN rk <= (SELECT short FROM s) THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM r)""".stripMargin

  /** The x93 waterfall, unrolled: `rounds` cap-and-redistribute rounds
    * over HUGEINT quota arithmetic (the int128 mirror of the engine's
    * decimal(38,0)). Each round re-apportions the surviving budget over
    * the uncapped sources and freezes the over-cap ones AT their cap; a
    * converged round freezes nobody, so act/bud pass through unchanged
    * and extra unrolled rounds are no-ops (the x26 unrolled-iteration
    * trick). `allc` = every frozen slice plus round-`rounds`' survivors.
    */
  private def cappedMixCtesSql(rounds: Int): String = {
    // REFERENCE DISCIPLINE: DuckDB inlines CTEs, so the expansion size is
    // the number of root-reachable reference paths — a chain whose rounds
    // each reference the previous round k times blows up k^rounds (the
    // first cut of this oracle exhausted the process's file handles
    // re-opening documents.parquet ~5^6 times). Hence: the surviving
    // budget rides as a COLUMN b (no scalar-subquery fan-out), scalars
    // come from window aggregates over the single upstream frame, and
    // each round references its predecessor exactly once; the per-round
    // frozen slices cp$r are pure leaves consumed once at the end.
    val head =
      s"""cnt93 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
         |act0 AS (SELECT source, n_docs, u,
         |  CAST(floor(power(CAST(u AS DOUBLE), $CapAlpha) * 1000000.0) AS BIGINT) AS w,
         |  CAST(u * $EpochCap AS BIGINT) AS cap,
         |  (SELECT (9 * count(*)) // 5 FROM documents) AS b
         | FROM (SELECT source, n_docs,
         |   CASE WHEN ${polySql("source")} % 3 = 0 THEN n_docs
         |        WHEN ${polySql("source")} % 3 = 1 THEN n_docs // 2
         |        ELSE n_docs // 5 END AS u FROM cnt93))""".stripMargin
    val rcte = (1 to rounds).map { r =>
      val p = r - 1
      s"""q$r AS (SELECT source, n_docs, u, w, cap, b,
         |  (CAST(b AS HUGEINT) * w) // tw AS base, (CAST(b AS HUGEINT) * w) % tw AS rem
         | FROM (SELECT *, SUM(CAST(w AS HUGEINT)) OVER () AS tw FROM act$p)),
         |al$r AS (SELECT source, n_docs, u, w, cap, b,
         |  CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc
         | FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
         |   b - SUM(base) OVER () AS short FROM q$r)),
         |cp$r AS (SELECT source, n_docs, u, w, cap, cap AS alloc FROM al$r WHERE alloc > cap),
         |act$r AS (SELECT source, n_docs, u, w, cap, b FROM (
         |  SELECT source, n_docs, u, w, cap, alloc, b0 - ov AS b FROM (
         |    SELECT source, n_docs, u, w, cap, alloc, b AS b0,
         |      SUM(CASE WHEN alloc > cap THEN cap ELSE 0 END) OVER () AS ov FROM al$r))
         | WHERE alloc <= cap)""".stripMargin
    }.mkString(",\n")
    val tail =
      s"""allc AS (SELECT source, n_docs, u, w, cap, alloc, CAST(0 AS INT) AS capped FROM al$rounds WHERE alloc <= cap
         | ${(1 to rounds).map(r => s"UNION ALL SELECT source, n_docs, u, w, cap, alloc, CAST(1 AS INT) AS capped FROM cp$r").mkString("\n ")})""".stripMargin
    s"$head,\n$rcte,\n$tail"
  }

  /** One k-means iteration, unrolled for the IVF oracles: assign to the
    * nearest centroid, then per-(cell, dim) decimal-exact mean reassembled
    * into centroid arrays — the SQL mirror of Similarity.kmeansCentroids.
    */
  private def ivfAssignSql(cent: String, out: String, src: String = "e"): String =
    s"""$out AS (SELECT vec_id, v, cell_id FROM (
       | SELECT $src.vec_id, $src.v, $cent.cell_id,
       |  row_number() OVER (PARTITION BY $src.vec_id
       |    ORDER BY round(list_cosine_similarity($src.v, $cent.cv), 6) DESC, $cent.cell_id) AS arnk
       | FROM $src CROSS JOIN $cent) WHERE arnk = 1)""".stripMargin

  /** Spill (multi-assignment) variant of [[ivfAssignSql]] for the x106
    * production profile: each corpus vector keeps its `spill` nearest
    * cells in the FINAL serve assignment (training iterations stay
    * single-assignment — spill is a serve-time recall lever, not a
    * training semantic).
    */
  private def ivfSpillAssignSql(cent: String, out: String, spill: Int): String =
    s"""$out AS (SELECT vec_id, v, cell_id FROM (
       | SELECT e.vec_id, e.v, $cent.cell_id,
       |  row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_cosine_similarity(e.v, $cent.cv), 6) DESC, $cent.cell_id) AS arnk
       | FROM e CROSS JOIN $cent) WHERE arnk <= $spill)""".stripMargin

  /** x45/x46 shared oracle CTE chain: the per-round pair count + argmax +
    * merge over s0..sN, mirroring [[bpeTrainRounds]] structurally round
    * for round. `carry` prefixes extra s0 columns (e.g. "w, ") that ride
    * through the merges.
    */
  private def bpeRoundsCtes(carry: String): String = {
    def pairsCte(r: Int): String =
      s"""p$r AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM (
         |  SELECT n, unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS pair
         |  FROM (SELECT n, list_filter(string_split(trim(sym), ' '), c -> c <> '') AS a FROM s${r - 1})
         |  WHERE len(a) >= 2) GROUP BY pair),
         |t$r AS (SELECT CAST($r AS BIGINT) AS rnd, pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |s$r AS (SELECT ${carry}replace(sym, ' ' || t$r.pair || ' ', ' ' || replace(t$r.pair, ' ', '') || ' ') AS sym, n
         |  FROM s${r - 1}, t$r)""".stripMargin
    (1 to BpeRounds).map(pairsCte).mkString(",\n")
  }

  /** x111/x113 shared oracle chain: x104's cluster CTEs to the `fin`
    * frame (rep_id, weight, pick_rank, n_repeats) under the hierarchical
    * HUGEINT largest-remainder apportionment. One definition so the
    * pick set and the shard plan can never desync.
    */
  private def weightedPicksCtesSql: String =
    s"""$DupClusterCtesSql,
       |hq AS (SELECT doc_id,
       |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
       |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
       |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
       | FROM corpus),
       |qq AS (SELECT doc_id, $QualitySql AS quality FROM hq),
       |allq AS (SELECT c.doc_id, CAST(coalesce(l.label, c.doc_id) AS BIGINT) AS cluster, q.quality
       | FROM corpus c LEFT JOIN lab4 l ON l.id = c.doc_id JOIN qq q ON q.doc_id = c.doc_id),
       |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS weight FROM allq GROUP BY cluster),
       |reps AS (SELECT cluster, doc_id AS rep_id FROM (
       |  SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn FROM allq)
       | WHERE rn = 1),
       |rw AS (SELECT r.rep_id, z.weight FROM reps r JOIN sizes z USING (cluster)),
       |st AS (SELECT weight, CAST(count(*) AS BIGINT) AS n_reps FROM rw GROUP BY weight),
       |twt AS (SELECT SUM(CAST(weight * n_reps AS HUGEINT)) AS tw FROM st),
       |qa AS (SELECT weight, n_reps,
       |  (CAST($WMixBudget AS HUGEINT) * (weight * n_reps)) // tw AS base,
       |  (CAST($WMixBudget AS HUGEINT) * (weight * n_reps)) % tw AS rem
       | FROM st CROSS JOIN twt),
       |alc AS (SELECT weight, n_reps,
       |  CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc
       | FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, CAST(weight AS VARCHAR)) AS rk,
       |   $WMixBudget - SUM(base) OVER () AS short FROM qa)),
       |rr AS (SELECT rep_id, weight,
       |  CAST(row_number() OVER (PARTITION BY weight
       |    ORDER BY ${polySql("'wmix#' || CAST(rep_id AS VARCHAR)")}, rep_id) AS BIGINT) AS pick_rank
       | FROM rw),
       |fin AS (SELECT rr.rep_id, rr.weight, rr.pick_rank,
       |  CAST(a.alloc // a.n_reps +
       |    CASE WHEN rr.pick_rank <= a.alloc % a.n_reps THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
       | FROM rr JOIN alc a USING (weight))""".stripMargin

  /** x110/x112 shared PQ oracle chain at the Pq2 geometry: per-subspace
    * unrolled k-means over CTE `e` (s0..s15 slices, two assign/update
    * rounds each, final assignments f0..f15), ending in the `recon` CTE —
    * every vector's codeword-concatenated reconstruction. One definition
    * so the two certifications can never desync on the codebooks.
    */
  private def pqOracleCtesSql: String = {
    def aSql(tbl: String, cent: String, out: String): String =
      s"""$out AS (SELECT vec_id, sv, cell_id FROM (
         | SELECT t.vec_id, t.sv, $cent.cell_id,
         |  row_number() OVER (PARTITION BY t.vec_id
         |    ORDER BY round(list_cosine_similarity(t.sv, $cent.cv), 6) DESC, $cent.cell_id) AS arnk
         | FROM $tbl t CROSS JOIN $cent) WHERE arnk = 1)""".stripMargin
    def uSql(assigned: String, out: String): String =
      s"""${out}_m AS (
         | SELECT cell_id, CAST(s.pos AS BIGINT) AS pos,
         |  CAST(SUM(CAST(s.xv AS DECIMAL(18,8))) AS DOUBLE)/count(*) AS m
         | FROM (SELECT cell_id,
         |   unnest(list_transform(range(1, len(sv)+1), i -> {'pos': i-1, 'xv': sv[i]})) AS s
         |  FROM $assigned)
         | GROUP BY cell_id, s.pos),
         |$out AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM ${out}_m GROUP BY cell_id)""".stripMargin
    val subs = (0 until Pq2M).map { sub =>
      val lo = sub * Pq2SubDim + 1
      val hi = (sub + 1) * Pq2SubDim
      s"""s$sub AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
         |c${sub}_0 AS (SELECT vec_id AS cell_id, sv AS cv FROM s$sub WHERE vec_id < $Pq2K),
         |${aSql(s"s$sub", s"c${sub}_0", s"a${sub}_1")},
         |${uSql(s"a${sub}_1", s"c${sub}_1")},
         |${aSql(s"s$sub", s"c${sub}_1", s"a${sub}_2")},
         |${uSql(s"a${sub}_2", s"c${sub}_2")},
         |${aSql(s"s$sub", s"c${sub}_2", s"f$sub")}""".stripMargin
    }.mkString(",\n")
    s"""$subs,
       |recon AS (SELECT f0.vec_id, ${(0 until Pq2M).map(i => s"cb$i.cv").mkString(" || ")} AS rv
       | FROM f0 ${(1 until Pq2M).map(i => s"JOIN f$i ON f$i.vec_id = f0.vec_id").mkString(" ")}
       | ${(0 until Pq2M).map(i => s"JOIN c${i}_2 cb$i ON cb$i.cell_id = f$i.cell_id").mkString(" ")})""".stripMargin
  }

  private def ivfUpdateSql(assigned: String, out: String): String =
    s"""${out}_m AS (
       | SELECT cell_id, CAST(s.pos AS BIGINT) AS pos,
       |  CAST(SUM(CAST(s.xv AS DECIMAL(18,8))) AS DOUBLE)/count(*) AS m
       | FROM (SELECT cell_id,
       |   unnest(list_transform(range(1, len(v)+1), i -> {'pos': i-1, 'xv': v[i]})) AS s
       |  FROM $assigned)
       | GROUP BY cell_id, s.pos),
       |$out AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM ${out}_m GROUP BY cell_id)""".stripMargin

  /** The x68/x68b shared margin-tail SQL over a candidate CTE `g`
    * (en_id, es_id, cos) — the mirror of [[bitextMarginTail]]:
    * neighbourhood means are decimal-exact sums over the rounded
    * cosines; the margin mirrors the engine's (2.0 * cos) / (ax + ay)
    * op order exactly.
    */
  private def bitextTailSql: String =
    s"""f AS (SELECT en_id, es_id, cos, row_number() OVER (PARTITION BY en_id ORDER BY cos DESC, es_id) AS rf FROM g),
       |b AS (SELECT en_id, es_id, cos, row_number() OVER (PARTITION BY es_id ORDER BY cos DESC, en_id) AS rb FROM g),
       |t1 AS (SELECT en_id, es_id, cos FROM f WHERE rf = 1),
       |ax AS (SELECT en_id, CAST(SUM(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS ax FROM f WHERE rf <= $BitextK GROUP BY en_id),
       |ay AS (SELECT es_id, CAST(SUM(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS ay FROM b WHERE rb <= $BitextK GROUP BY es_id),
       |m AS (SELECT t1.en_id, t1.es_id, t1.cos, (2.0 * t1.cos) / (ax.ax + ay.ay) AS margin
       | FROM t1 JOIN ax ON ax.en_id = t1.en_id JOIN ay ON ay.es_id = t1.es_id)
       |SELECT en_id, es_id, cos, margin,
       | CAST(margin >= $BitextMarginFloor AS INT) AS keep
       |FROM m ORDER BY en_id""".stripMargin

  val oracleSql: Map[String, String] = ListMap(
    "x01_text_stats" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
         | CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens,
         | CAST(length(regexp_extract_all(text, '${TextOps.BpePattern}')) AS BIGINT) AS bpe_tokens,
         | CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
         | CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS stop_en,
         | ${polySql("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x02_lang_quality" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS en,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEs')) AS BIGINT) AS es,
         |  CAST(length(regexp_extract_all(lower(text), '$StopDe')) AS BIGINT) AS de,
         |  CAST(length(regexp_extract_all(lower(text), '$StopFr')) AS BIGINT) AS fr,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM documents)
         |SELECT doc_id, lang,
         | CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
         |      WHEN es >= de AND es >= fr THEN 'es'
         |      WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_guess,
         | $QualitySql AS quality
         |FROM h ORDER BY doc_id""".stripMargin,
    "x03_exact_dedup" ->
      """WITH corpus AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0)
        |SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
        | CAST(count(*) AS BIGINT) AS copies
        |FROM corpus GROUP BY md5(text) HAVING count(*) > 1 ORDER BY content_hash""".stripMargin,
    "x04_ngram_jaccard_pairs" ->
      // Mirrors the Spark path structurally: explode shingles, drop shingles
      // with document frequency above Dedup.ShingleDfCap (the hot-key guard
      // — referenced here so the two sides cannot drift), count shared RARE
      // shingles per pair, set sizes from the FULL shingle lists. On any
      // corpus where some shingle exceeds the cap both engines exclude it
      // from the intersection identically.
      s"""WITH $PlantedDocsSql,
         |$ShinglesSql,
         |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         |rare AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |exr AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS DOUBLE) AS inter
         | FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         | GROUP BY a.doc_id, b.doc_id),
         |sz AS (SELECT doc_id, CAST(len(s) AS DOUBLE) AS sz FROM sh),
         |pr AS (SELECT id1, id2, inter, s1.sz + s2.sz - inter AS uni
         | FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2)
         |SELECT id1, id2, inter/uni AS jac FROM pr
         |WHERE inter/uni >= 0.5 ORDER BY id1, id2""".stripMargin,
    "x05_minhash_sig" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |$ShinglesSql,
         |h AS (SELECT doc_id, list_transform(s, x -> ${polySql("x")}) AS hs FROM sh)
         |SELECT doc_id, ${(0 until Dedup.MinHashK).map(i => minhashSql(i, "hs") + s" AS mh$i").mkString(",\n ")}
         |FROM h ORDER BY doc_id""".stripMargin,
    "x06_minhash_lsh_pairs" ->
      s"""WITH $PlantedDocsSql,
         |$ShinglesSql,
         |hh AS (SELECT doc_id, s, list_transform(s, x -> ${polySql("x")}) AS hs FROM sh),
         |sig AS (SELECT doc_id, s, ${(0 until Dedup.MinHashK).map(i => minhashSql(i, "hs") + s" AS mh$i").mkString(",\n ")} FROM hh),
         |banded AS (SELECT doc_id, unnest([${(0 until Dedup.LshBands).map(b => s"'$b:' || mh${2 * b} || ':' || mh${2 * b + 1}").mkString(", ")}]) AS band FROM sig),
         |cool AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |capped AS (SELECT banded.* FROM banded JOIN cool USING (band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM capped a JOIN capped b ON a.band = b.band AND a.doc_id < b.doc_id),
         |pr AS (SELECT id1, id2,
         |  CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) AS inter,
         |  CAST(len(s1.s) + len(s2.s) AS DOUBLE) - CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) AS uni
         | FROM cand JOIN sh s1 ON s1.doc_id = id1 JOIN sh s2 ON s2.doc_id = id2)
         |SELECT id1, id2, inter/uni AS jac FROM pr
         |WHERE inter/uni >= 0.5 ORDER BY id1, id2""".stripMargin,
    "x07_simhash" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM corpus),
         |th AS (SELECT doc_id, list_transform(t, x -> ${polySql("x")}) AS h FROM tk)
         |SELECT doc_id, CAST(list_sum(list_transform(range(0, ${Dedup.SimHashBits}), i ->
         |  CASE WHEN list_sum(list_transform(h, v -> CASE WHEN (v >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |  THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
         |FROM th ORDER BY doc_id""".stripMargin,
    "x08_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |p AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos FROM e, q WHERE vec_id <> qid),
        |r AS (SELECT qid, vec_id, cos,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM p)
        |SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "x09_embedding_neardup" -> {
      def bucketSql(offset: Int): String = (0 until LshBits).map { p =>
        val plane = (0 until EmbDim).map(d => Similarity.planeComponent(offset + p, d)).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM e
         | UNION ALL SELECT vec_id + 100000, v FROM e WHERE vec_id % 5 = 0),
         |sig AS (SELECT vec_id, v, ${bucketSql(0)} AS b0, ${bucketSql(LshBits)} AS b1 FROM corpus),
         |banded AS (SELECT vec_id, v,
         |  unnest(['0:' || CAST(b0 AS VARCHAR), '1:' || CAST(b1 AS VARCHAR)]) AS band FROM sig),
         |cool AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |capped AS (SELECT banded.* FROM banded JOIN cool USING (band)),
         |pr AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
         | FROM capped a JOIN capped b ON a.band = b.band AND a.vec_id < b.vec_id)
         |SELECT id1, id2, cos FROM pr WHERE cos >= 0.99 ORDER BY id1, id2""".stripMargin
    },
    "x11_ann_lsh" -> {
      val bucketSql = (0 until LshBits).map { p =>
        val plane = (0 until EmbDim).map(d => Similarity.planeComponent(p, d)).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM e
         | UNION ALL SELECT vec_id + 100000, v FROM e WHERE vec_id % 5 = 0),
         |sig AS (SELECT vec_id, v, $bucketSql AS bucket FROM corpus),
         |cool AS (SELECT bucket FROM sig GROUP BY bucket HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |capped AS (SELECT sig.* FROM sig JOIN cool USING (bucket)),
         |pr AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
         | FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id1, id2, cos FROM pr WHERE cos >= 0.9 ORDER BY id1, id2""".stripMargin
    },
    "x13_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < 16),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfAssignSql("c2", "assigned")},
         |q AS (SELECT vec_id AS qid, v AS qv, cell_id AS qcell FROM assigned WHERE vec_id < 5),
         |cand AS (SELECT q.qid, a.vec_id,
         |  round(list_cosine_similarity(q.qv, a.v), 6) AS cos
         | FROM assigned a JOIN q ON a.cell_id = q.qcell AND a.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM cand)
         |SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "x25_ann_ivf_nprobe2" ->
      // identical trained index; the query side keeps its TWO nearest cells
      // (arnk <= 2) — the SQL mirror of Similarity.ivfProbe(nprobe = 2).
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < 16),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfAssignSql("c2", "assigned")},
         |q AS (SELECT vec_id AS qid, qv, qcell FROM (
         | SELECT e.vec_id, e.v AS qv, c2.cell_id AS qcell,
         |  row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY round(list_cosine_similarity(e.v, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM e CROSS JOIN c2 WHERE e.vec_id < 5) WHERE arnk <= 2),
         |cand AS (SELECT q.qid, a.vec_id,
         |  round(list_cosine_similarity(q.qv, a.v), 6) AS cos
         | FROM assigned a JOIN q ON a.cell_id = q.qcell AND a.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM cand)
         |SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "x14_embedding_dim_stats" ->
      """WITH s0 AS (
        | SELECT unnest(list_transform(range(1, len(embedding)+1),
        |   i -> {'pos': i-1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        | FROM embeddings),
        |ex AS (SELECT CAST(s.pos AS BIGINT) AS pos, s.v AS v FROM s0)
        |SELECT pos,
        | CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)/count(*) AS mean_v,
        | min(v) AS min_v, max(v) AS max_v,
        | CAST(count(*) AS BIGINT) AS n
        |FROM ex GROUP BY pos ORDER BY pos""".stripMargin,
    "x15_event_pivot" ->
      """SELECT user_id,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x12_hash_split" ->
      s"""WITH h AS (SELECT doc_id, n_chars, ${polySql("text")} % 100 AS bucket FROM documents),
         |sp AS (SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  doc_id, n_chars FROM h)
         |SELECT split, CAST(count(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         | CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id
         |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    "x10_quality_by_source" ->
      s"""WITH h AS (SELECT source,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM documents),
         |q AS (SELECT source, $QualitySql AS q FROM h)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_quality
         |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "x16_simhash64" -> {
      // The same salted-composition fold as the native expression: four
      // hash families h0..h3 = polyhash of the 'a'/'b'/'c'/'d'-prefixed
      // token, 16 sign-vote bits from each. 1::BIGINT << 63 overflows
      // DuckDB's checked shift, so bit weights are emitted as literals
      // (with the min-long written as -(2^63-1)-1).
      def votes(h: String, i: Int): String =
        s"list_sum(list_transform($h, v -> CASE WHEN (v >> $i) & 1 = 1 THEN 1 ELSE -1 END))"
      def weight(idx: Int): String =
        if (idx == 63) "(-9223372036854775807::BIGINT - 1::BIGINT)" else s"${1L << idx}::BIGINT"
      val terms = (for (j <- 0 until 4; i <- 0 until 16) yield
        s"CASE WHEN ${votes(s"h$j", i)} > 0 THEN ${weight(j * 16 + i)} ELSE 0::BIGINT END")
        .mkString("\n  + ")
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
         |tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM corpus),
         |th AS (SELECT doc_id,
         |  list_transform(t, x -> ${polySql("'a' || x")}) AS h0,
         |  list_transform(t, x -> ${polySql("'b' || x")}) AS h1,
         |  list_transform(t, x -> ${polySql("'c' || x")}) AS h2,
         |  list_transform(t, x -> ${polySql("'d' || x")}) AS h3 FROM tk)
         |SELECT doc_id, CAST($terms AS BIGINT) AS simhash64
         |FROM th ORDER BY doc_id""".stripMargin
    },
    "x17_stratified_sample" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         | CAST(SUM(n_chars) AS BIGINT) AS kept_chars
         |FROM documents
         |WHERE ${polySql("text")} % 100 < (length(source) % 3 + 1) * 10
         |GROUP BY source ORDER BY source""".stripMargin,
    "x18_pii_scrub" ->
      s"""WITH planted AS (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 0
         |   THEN text || ' contact user' || doc_id || '@example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |   ELSE text END AS t2
         | FROM documents)
         |SELECT doc_id,
         | CAST(length(regexp_extract_all(t2, '$EmailRe')) AS BIGINT) AS n_emails,
         | CAST(length(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones,
         | ${polySql(s"regexp_replace(regexp_replace(t2, '$EmailRe', '[EMAIL]', 'g'), '$PhoneRe', '[PHONE]', 'g')")} AS scrubbed_fp
         |FROM planted ORDER BY doc_id""".stripMargin,
    "x19_repetition" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok FROM documents),
        |pt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY doc_id, tok)
        |SELECT doc_id,
        | CAST(SUM(c) AS BIGINT) AS n_tokens,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | round(CAST(count(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_ratio,
        | round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_token_share
        |FROM pt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x20_doc_pack" ->
      s"""WITH d AS (SELECT source, doc_id,
         |  CAST(length(regexp_extract_all(text, '${TextOps.BpePattern}')) AS BIGINT) AS tok
         | FROM documents),
         |c AS (SELECT source, doc_id, tok,
         |  SUM(tok) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM d)
         |SELECT source, CAST(floor(CAST(cum - tok AS DOUBLE) / ${PackBudget}.0) AS BIGINT) AS bin,
         | CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(tok) AS BIGINT) AS bin_tokens,
         | CAST(min(doc_id) AS BIGINT) AS first_doc, CAST(max(doc_id) AS BIGINT) AS last_doc
         |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "x21_quantized_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ex AS (SELECT vec_id, CAST(s.pos AS BIGINT) AS pos, s.x AS x FROM
        | (SELECT vec_id, unnest(list_transform(range(1, len(v)+1), i -> {'pos': i-1, 'x': v[i]})) AS s FROM e)),
        |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
        |cd AS (SELECT vec_id, ex.pos AS pos,
        |  CASE WHEN mx > mn THEN CAST(round((x - mn) / (mx - mn) * 254.0) AS INT) ELSE 0 END AS code
        | FROM ex JOIN st ON ex.pos = st.pos),
        |qv AS (SELECT vec_id, list(CAST(code AS DOUBLE) ORDER BY pos) AS qvec FROM cd GROUP BY vec_id),
        |q AS (SELECT vec_id AS qid, qvec AS quv FROM qv WHERE vec_id < 5),
        |p AS (SELECT qid, qv.vec_id AS vec_id, round(list_cosine_similarity(quv, qvec), 6) AS qcos
        | FROM qv, q WHERE qv.vec_id <> qid),
        |r AS (SELECT qid, vec_id, qcos,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id) AS BIGINT) AS rnk FROM p)
        |SELECT qid, vec_id, qcos, rnk FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "x22_unigram_logprob" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok FROM documents),
        |vc AS (SELECT tok, CAST(count(*) AS BIGINT) AS tc FROM tk GROUP BY tok),
        |tt AS (SELECT CAST(SUM(tc) AS BIGINT) AS tt FROM vc),
        |lp AS (SELECT doc_id, ln(CAST(tc AS DOUBLE) / CAST(tt AS DOUBLE)) AS lp FROM tk JOIN vc USING (tok) CROSS JOIN tt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x23_vocab" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok FROM documents),
        |pd AS (SELECT tok, doc_id, count(*) AS c FROM tk GROUP BY tok, doc_id)
        |SELECT tok, CAST(SUM(c) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
        |FROM pd GROUP BY tok ORDER BY tf DESC, tok LIMIT 100""".stripMargin,
    "x24_decontamination" -> {
      val fiveGram =
        """CASE WHEN len(t) >= 5
          | THEN list_distinct(list_transform(range(1, len(t)-3), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
          | ELSE []::VARCHAR[] END""".stripMargin
      s"""WITH b AS (SELECT doc_id, text, ${polySql("text")} % 100 AS bucket FROM documents),
         |trtk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM b WHERE bucket < 80),
         |trsh AS (SELECT DISTINCT unnest($fiveGram) AS shingle FROM trtk),
         |tes AS (SELECT doc_id, text FROM b WHERE bucket >= 90
         | UNION ALL SELECT doc_id + 200000, text FROM b WHERE bucket < 80 AND doc_id % 13 = 0),
         |tetk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM tes),
         |tesh AS (SELECT doc_id, $fiveGram AS s FROM tetk),
         |tesz AS (SELECT doc_id, len(s) AS n_shingles FROM tesh WHERE len(s) > 0),
         |teex AS (SELECT doc_id, unnest(s) AS shingle FROM tesh),
         |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM teex JOIN trsh USING (shingle) GROUP BY doc_id)
         |SELECT h.doc_id, CAST(z.n_shingles AS BIGINT) AS n_shingles, n_hits,
         | round(CAST(n_hits AS DOUBLE) / CAST(z.n_shingles AS DOUBLE), 6) AS containment
         |FROM hits h JOIN tesz z USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "x26_dedup_pipeline" ->
      s"""WITH $DupClusterCtesSql,
         |clusters AS (SELECT CAST(label AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n FROM lab4 GROUP BY label)
         |SELECT keep_id, n FROM clusters
         |UNION ALL SELECT -1::BIGINT AS keep_id,
         | (SELECT CAST(count(*) AS BIGINT) FROM corpus) - (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM clusters) AS n
         |ORDER BY keep_id""".stripMargin,
    "x27_salted_agg" ->
      // The oracle is the UNSALTED aggregate — the salted two-phase plan
      // must be observationally identical to it.
      """SELECT l_returnflag AS k,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        | CAST(count(*) AS BIGINT) AS count_v
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "x28_pq_topk" -> {
      // Per-subspace k-means on list SLICES, unrolled like x13's — aSql
      // mirrors Similarity.pqEncode's rank-1 assignment, uSql mirrors
      // kmeansCentroids' decimal-exact mean update.
      def aSql(tbl: String, cent: String, out: String): String =
        s"""$out AS (SELECT vec_id, sv, cell_id FROM (
           | SELECT t.vec_id, t.sv, $cent.cell_id,
           |  row_number() OVER (PARTITION BY t.vec_id
           |    ORDER BY round(list_cosine_similarity(t.sv, $cent.cv), 6) DESC, $cent.cell_id) AS arnk
           | FROM $tbl t CROSS JOIN $cent) WHERE arnk = 1)""".stripMargin
      def uSql(assigned: String, out: String): String =
        s"""${out}_m AS (
           | SELECT cell_id, CAST(s.pos AS BIGINT) AS pos,
           |  CAST(SUM(CAST(s.xv AS DECIMAL(18,8))) AS DOUBLE)/count(*) AS m
           | FROM (SELECT cell_id,
           |   unnest(list_transform(range(1, len(sv)+1), i -> {'pos': i-1, 'xv': sv[i]})) AS s
           |  FROM $assigned)
           | GROUP BY cell_id, s.pos),
           |$out AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM ${out}_m GROUP BY cell_id)""".stripMargin
      val subs = (0 until PqM).map { sub =>
        val lo = sub * PqSubDim + 1
        val hi = (sub + 1) * PqSubDim
        s"""s$sub AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
           |c${sub}_0 AS (SELECT vec_id AS cell_id, sv AS cv FROM s$sub WHERE vec_id < $PqK),
           |${aSql(s"s$sub", s"c${sub}_0", s"a${sub}_1")},
           |${uSql(s"a${sub}_1", s"c${sub}_1")},
           |${aSql(s"s$sub", s"c${sub}_1", s"a${sub}_2")},
           |${uSql(s"a${sub}_2", s"c${sub}_2")},
           |${aSql(s"s$sub", s"c${sub}_2", s"f$sub")}""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$subs,
         |recon AS (SELECT f0.vec_id, ${(0 until PqM).map(i => s"cb$i.cv").mkString(" || ")} AS rv
         | FROM f0 ${(1 until PqM).map(i => s"JOIN f$i ON f$i.vec_id = f0.vec_id").mkString(" ")}
         | ${(0 until PqM).map(i => s"JOIN c${i}_2 cb$i ON cb$i.cell_id = f$i.cell_id").mkString(" ")}),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |p AS (SELECT qid, r.vec_id, round(list_cosine_similarity(qv, rv), 6) AS acos
         | FROM recon r, q WHERE r.vec_id <> qid),
         |rk AS (SELECT qid, vec_id, acos,
         | CAST(row_number() OVER (PARTITION BY qid ORDER BY acos DESC, vec_id) AS BIGINT) AS rnk FROM p)
         |SELECT qid, vec_id, acos, rnk FROM rk WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin
    },
    "x29_source_mix" ->
      s"""WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs,
         |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000.0) AS BIGINT) AS w FROM counts),
         |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(n_docs) AS BIGINT) AS tn FROM w),
         |rates AS (SELECT source, n_docs, w,
         |  CAST(least((tn * 4000 * w) // (n_docs * tw), 10000) AS BIGINT) AS rate_pm
         | FROM w CROSS JOIN tot),
         |kept AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
         | FROM documents JOIN rates USING (source)
         | WHERE ${polySql("text")} % 10000 < rate_pm GROUP BY source)
         |SELECT r.source, r.n_docs, r.w, r.rate_pm,
         | CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         | CAST(coalesce(k.kept_chars, 0) AS BIGINT) AS kept_chars
         |FROM rates r LEFT JOIN kept k USING (source) ORDER BY r.source""".stripMargin,
    "x30_doc_chunk" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM documents),
         |st AS (SELECT doc_id, t, unnest(range(0, len(t), $ChunkStride)) AS start FROM tk WHERE len(t) > 0),
         |ck AS (SELECT doc_id, start // $ChunkStride AS chunk_idx,
         |  list_slice(t, start + 1, start + $ChunkTokens) AS ck FROM st)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         | CAST(len(ck) AS BIGINT) AS n_tokens,
         | ${polySql("array_to_string(ck, ' ')")} AS chunk_fp
         |FROM ck ORDER BY doc_id, chunk_idx""".stripMargin,
    "x31_bm25_topk" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM documents),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         | FROM (SELECT doc_id, unnest(t) AS tok FROM tk)
         | WHERE tok IN (${Bm25Terms.map(w => s"'$w'").mkString(", ")}) GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |c AS (SELECT tf.doc_id,
         |  (ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |   * ((CAST(tf AS DOUBLE) * ${Bm25K1 + 1.0})
         |      / (CAST(tf AS DOUBLE) + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
         | FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         | round(CAST(SUM(CAST(contrib AS DECIMAL(18,8))) AS DOUBLE), 6) AS score
         |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "x32_cdc_merge" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        | SELECT o_orderkey, 'R' AS u_status, o_totalprice * 1.1 AS u_price FROM base WHERE o_orderkey % 7 = 0
        | UNION ALL
        | SELECT -o_orderkey - 1, 'N', o_totalprice FROM base WHERE o_orderkey % 97 = 0),
        |m AS (SELECT
        |  coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |  CASE WHEN u.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL THEN 'updated'
        |       WHEN u.o_orderkey IS NOT NULL THEN 'inserted' ELSE 'carried' END AS disposition,
        |  coalesce(u.u_status, b.o_orderstatus) AS o_orderstatus,
        |  coalesce(u.u_price, b.o_totalprice) AS o_totalprice
        | FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey)
        |SELECT o_orderkey, disposition, o_orderstatus, o_totalprice FROM m
        |WHERE disposition <> 'carried' OR o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,
    // exact-regime MG (capacity >= distinct suppliers): lo = hi = true count
    "x33_heavy_hitters" ->
      """SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
        | CAST(count(*) AS BIGINT) AS cnt_lo, CAST(count(*) AS BIGINT) AS cnt_hi
        |FROM lineitem GROUP BY l_suppkey ORDER BY cnt_lo DESC, l_suppkey LIMIT 20""".stripMargin,
    // greedy MMR selection unrolled PER QUERY: round r picks, within each
    // qid partition, the argmax over not-yet-selected candidates of
    // lambda*rel - (1-lambda)*max-sim-to-s_{r-1}
    "x34_mmr_rerank" -> {
      def roundSql(r: Int): String =
        s"""m$r AS (SELECT c.qid, c.vec_id, c.rel, max(ps.sim) AS ms
           | FROM cand c
           | JOIN ps ON ps.qid = c.qid AND ps.id_a = c.vec_id
           | JOIN s${r - 1} sel ON sel.qid = ps.qid AND sel.vec_id = ps.id_b
           | WHERE NOT EXISTS (SELECT 1 FROM s${r - 1} s WHERE s.qid = c.qid AND s.vec_id = c.vec_id)
           | GROUP BY c.qid, c.vec_id, c.rel),
           |p$r AS (SELECT qid, vec_id, rel, CAST($r AS BIGINT) AS rnd, mmr FROM (
           |  SELECT qid, vec_id, rel,
           |   $MmrLambda * rel - ${1 - MmrLambda} * ms AS mmr,
           |   row_number() OVER (PARTITION BY qid
           |     ORDER BY $MmrLambda * rel - ${1 - MmrLambda} * ms DESC, vec_id) AS rn
           |  FROM m$r) WHERE rn = 1),
           |s$r AS (SELECT * FROM s${r - 1} UNION ALL SELECT * FROM p$r)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $MmrQueries),
         |rel0 AS (SELECT qid, vec_id, round(list_cosine_similarity(v, qv), 6) AS rel
         | FROM e CROSS JOIN q WHERE vec_id <> qid),
         |cand AS (SELECT qid, vec_id, rel FROM (
         |  SELECT qid, vec_id, rel,
         |   row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn FROM rel0)
         | WHERE rn <= 20),
         |cv AS (SELECT c.qid, c.vec_id, c.rel, e.v FROM cand c JOIN e USING (vec_id)),
         |ps AS (SELECT a.qid, a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS sim
         | FROM cv a JOIN cv b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
         |s1 AS (SELECT qid, vec_id, rel, CAST(1 AS BIGINT) AS rnd, mmr FROM (
         |  SELECT qid, vec_id, rel, $MmrLambda * rel AS mmr,
         |   row_number() OVER (PARTITION BY qid
         |     ORDER BY $MmrLambda * rel DESC, vec_id) AS rn
         |  FROM cand) WHERE rn = 1),
         |${(2 to MmrK).map(roundSql).mkString(",\n")}
         |SELECT qid, vec_id, rel, rnd, mmr FROM s$MmrK ORDER BY qid, rnd""".stripMargin
    },
    // the oracle is the naive global cumulative window the Spark path avoids
    "x35_budget_select" ->
      s"""WITH h AS (SELECT doc_id, text,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM documents),
         |s AS (SELECT doc_id, $QualitySql AS quality,
         |  CAST(length(regexp_extract_all(text, '${TextOps.BpePattern}')) AS BIGINT) AS n_tok FROM h),
         |o AS (SELECT doc_id, quality, n_tok,
         |  CAST(SUM(n_tok) OVER (ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM s)
         |SELECT doc_id, quality, n_tok, cum FROM o
         |WHERE cum - n_tok < $SelBudget ORDER BY quality DESC, doc_id""".stripMargin,
    "x36_user_anomaly" ->
      """WITH st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
        |  CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS svv
        | FROM events GROUP BY user_id),
        |sd AS (SELECT user_id, n, sv / CAST(n AS DOUBLE) AS mean,
        |  sqrt((svv - (sv * sv) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sd
        | FROM st WHERE n > 1),
        |z AS (SELECT e.user_id, s.n, round(abs((e.value - s.mean) / s.sd), 6) AS az
        | FROM events e JOIN sd s USING (user_id) WHERE s.sd > 0)
        |SELECT user_id, n, CAST(SUM(CASE WHEN az > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom,
        | max(az) AS max_abs_z
        |FROM z GROUP BY user_id, n ORDER BY user_id""".stripMargin,
    "x37_prequential_anomaly" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cv FROM events),
         |w AS (SELECT user_id, event_id, cv,
         |  CAST(count(*) OVER win AS BIGINT) AS np,
         |  CAST(SUM(cv) OVER win AS BIGINT) AS sp,
         |  CAST(SUM(cv * cv) OVER win AS BIGINT) AS spp
         | FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |z AS (SELECT user_id, event_id,
         |  round(abs((CAST(cv AS DOUBLE) - CAST(sp AS DOUBLE) / np)
         |    / sqrt((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / np) / (np - 1))), 6) AS az
         | FROM w WHERE np >= $AnomMinPrior AND spp * np - sp * sp > 0)
         |SELECT user_id, event_id, az FROM z WHERE az > 3.0 ORDER BY user_id, event_id""".stripMargin,
    "x38_fuzzy_match" ->
      """WITH c AS (SELECT c_custkey,
        |  substring(c_name, 1, length(c_name) - 2) AS blk,
        |  substring(c_name, length(c_name) - 1, 2) AS suf FROM customer)
        |SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        | CAST(levenshtein(a.suf, b.suf) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.suf, b.suf) <= 1
        |ORDER BY id1, id2""".stripMargin,
    "x39_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |first AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY user_id),
        |act AS (SELECT DISTINCT ev.user_id, cohort,
        |  CAST(date_diff('day', cohort, d) AS INTEGER) AS day_k
        | FROM ev JOIN first USING (user_id))
        |SELECT cohort, day_k, CAST(count(*) AS BIGINT) AS n_users
        |FROM act GROUP BY cohort, day_k ORDER BY cohort, day_k""".stripMargin,
    // exact-regime MG per window: lo = hi = the true per-user count
    "x40_windowed_top_users" ->
      """WITH c AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT window_start, user_id, cnt,
        |  CAST(row_number() OVER (PARTITION BY window_start ORDER BY cnt DESC, user_id) AS BIGINT) AS rnk
        | FROM c)
        |SELECT window_start, rnk, user_id, cnt AS cnt_lo, cnt AS cnt_hi
        |FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin,
    "x41_weighted_sample" ->
      s"""SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         | round(ln(CAST((${polySql("text")}) % $WsM + 1 AS DOUBLE) / CAST(${WsM + 1} AS DOUBLE)) / CAST(n_chars AS DOUBLE), 6) AS skey
         |FROM documents ORDER BY skey DESC, doc_id LIMIT $WsK""".stripMargin,
    "x42_burst_dedup" ->
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
         |l AS (SELECT user_id, event_type, event_id, us,
         |  lag(us) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) AS prev_us
         | FROM e)
         |SELECT user_id, event_type, event_id FROM l
         |WHERE prev_us IS NULL OR us - prev_us > ${DedupGapSec * 1000000L}
         |ORDER BY user_id, event_type, event_id""".stripMargin,
    // the oracle is the FULL recompute the incremental merge must equal
    "x43_incremental_agg" ->
      """WITH allrows AS (
        | SELECT l_returnflag, l_quantity FROM lineitem
        | UNION ALL
        | SELECT l_returnflag, l_quantity * 2.0 FROM lineitem WHERE l_orderkey % 13 = 0)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
        |FROM allrows GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x44_substring_dedup" ->
      // Mirrors the Spark path structurally: sliding window hashes, the
      // ShingleDfCap hot-window cap on the hash key, then the
      // gaps-and-islands diagonal merge (p1 - row_number() per
      // (pair, diagonal) group).
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |syn AS (SELECT a.doc_id + 300000 AS doc_id, a.text || ' ' || b.text AS text
         |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 7 = 0),
         |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM syn),
         |tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM corpus),
         |w AS (SELECT doc_id, unnest(range(0, len(t) - $SubstrW + 1)) AS p, t FROM tk WHERE len(t) >= $SubstrW),
         |wh AS (SELECT doc_id, p, ${polySql(s"array_to_string(list_slice(t, p + 1, p + $SubstrW), ' ')")} AS h FROM w),
         |cool AS (SELECT h FROM wh GROUP BY h HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |whc AS (SELECT wh.doc_id, wh.p, wh.h FROM wh JOIN cool USING (h)),
         |m AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.p AS p1, b.p AS p2
         |  FROM whc a JOIN whc b ON a.h = b.h AND a.doc_id < b.doc_id),
         |isl AS (SELECT id1, id2, p1 - p2 AS diag, p1, p2,
         |  p1 - row_number() OVER (PARTITION BY id1, id2, p1 - p2 ORDER BY p1) AS grp FROM m)
         |SELECT id1, id2, CAST(min(p1) AS BIGINT) AS start1, CAST(min(p2) AS BIGINT) AS start2,
         |  CAST(max(p1) - min(p1) + $SubstrW AS BIGINT) AS span_tokens,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY id1, id2, diag, grp
         |ORDER BY id1, id2, start1, start2""".stripMargin,
    "x45_bpe_merges" ->
      s"""WITH words AS (
         | SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         | FROM documents),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY w HAVING $BmpOnlySql),
         |s0 AS (SELECT ' ' || array_to_string(list_filter(string_split(w, ''), c -> c <> ''), ' ') || ' ' AS sym, n FROM wc),
         |${bpeRoundsCtes("")}
         |SELECT rnd, pair, cnt FROM (${(1 to BpeRounds).map(r => s"SELECT * FROM t$r").mkString(" UNION ALL ")})
         |ORDER BY rnd""".stripMargin,
    // same training chain carrying the word, then token counts join back
    // to the per-doc word list — the SQL mirror of the x46 vocab-level
    // apply (the persisted model is bit-identical to this retrain)
    "x46_bpe_segment" ->
      s"""WITH words AS (
         | SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         | FROM documents),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY w HAVING $BmpOnlySql),
         |s0 AS (SELECT w, ' ' || array_to_string(list_filter(string_split(w, ''), c -> c <> ''), ' ') || ' ' AS sym, n FROM wc),
         |${bpeRoundsCtes("w, ")},
         |tc AS (SELECT w, len(list_filter(string_split(trim(sym), ' '), c -> c <> '')) AS ntok FROM s$BpeRounds)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(SUM(ntok) AS BIGINT) AS bpe_tokens
         |FROM words JOIN tc USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x47_semantic_dedup" -> {
      // x13's unrolled k-means training (over the BASE table), then the
      // planted-clone corpus assigns to the trained cells, sub-buckets by
      // the x11 hyperplane signature, and pairs only within (cell, sig) —
      // the removal rule (drop the higher id of any pair >= tau) in SQL.
      val bucketSql = (0 until LshBits).map { p =>
        val plane = (0 until EmbDim).map(d => Similarity.planeComponent(p, d)).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM e
         | UNION ALL SELECT vec_id + 100000, v FROM e WHERE vec_id % 5 = 0),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < $IvfCells),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |ac AS (SELECT vec_id, v, cell_id FROM (
         | SELECT t.vec_id, t.v, c2.cell_id,
         |  row_number() OVER (PARTITION BY t.vec_id
         |    ORDER BY round(list_cosine_similarity(t.v, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM corpus t CROSS JOIN c2) WHERE arnk = 1),
         |sig AS (SELECT vec_id, v,
         |  CAST(cell_id AS VARCHAR) || ':' || CAST($bucketSql AS VARCHAR) AS sb FROM ac),
         |cool AS (SELECT sb FROM sig GROUP BY sb HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |capped AS (SELECT sig.* FROM sig JOIN cool USING (sb)),
         |pr AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
         | FROM capped a JOIN capped b ON a.sb = b.sb AND a.vec_id < b.vec_id)
         |SELECT id2 AS removed_id, CAST(min(id1) AS BIGINT) AS kept_id,
         | max(cos) AS max_cos, CAST(count(*) AS BIGINT) AS n_dups
         |FROM pr WHERE cos >= $SemDedupTau
         |GROUP BY id2 ORDER BY removed_id""".stripMargin
    },
    "x48_dsir_select" ->
      s"""WITH toks AS (SELECT doc_id, lang, ${polySql("w")} % $DsirB AS b FROM (
         | SELECT doc_id, lang,
         |  unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         | FROM documents)),
         |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM toks WHERE lang = 'en' GROUP BY b),
         |alls AS (SELECT b, CAST(count(*) AS BIGINT) AS cs FROM toks GROUP BY b),
         |tots AS (SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS tt,
         |  (SELECT CAST(SUM(cs) AS BIGINT) FROM alls) AS ts),
         |lr AS (SELECT alls.b,
         |  round(ln(CAST((coalesce(ct, 0) + 1) * (ts + $DsirB) AS DOUBLE)
         |         / CAST((cs + 1) * (tt + $DsirB) AS DOUBLE)), 6) AS lr
         | FROM alls LEFT JOIN tgt ON alls.b = tgt.b CROSS JOIN tots),
         |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(CAST(lr AS DECIMAL(18,6))) AS DOUBLE) AS logw
         | FROM toks JOIN lr USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_toks, logw FROM d
         |ORDER BY logw DESC, doc_id LIMIT $DsirK""".stripMargin,
    // interpolation constants printed from the SAME doubles Spark uses
    // (shortest round-trip repr), so both engines mix identically
    "x49_bigram_lm" ->
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM documents),
         |uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS uc FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok),
         |tot AS (SELECT (SELECT CAST(SUM(uc) AS BIGINT) FROM uc) AS tt,
         |  (SELECT CAST(count(*) AS BIGINT) FROM uc) AS vv),
         |bp AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> {'prev': t[i], 'cur': t[i+1]})) AS p
         |  FROM tk WHERE len(t) >= 2)),
         |bc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS bc FROM bp GROUP BY prev, cur),
         |sc AS (SELECT bc.prev, bc.cur,
         |  ln($BigramLambda * (CAST(bc AS DOUBLE) / CAST(pu.uc AS DOUBLE))
         |   + ${1.0 - BigramLambda} * (CAST(cu.uc + 1 AS DOUBLE) / CAST(tt + vv AS DOUBLE))) AS lp
         | FROM bc JOIN uc pu ON pu.tok = bc.prev JOIN uc cu ON cu.tok = bc.cur CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         | CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logprob
         |FROM bp JOIN sc USING (prev, cur)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x50_quality_classifier" -> {
      // GD replayed round for round in integer micro-units: the sigmoid
      // rounds once to an integer micro value; (residual * feature)
      // products and their sums are exact integer arithmetic; the
      // weight update mirrors the Spark op order exactly.
      val wsTok = "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)"
      def roundCtes(r: Int): String = {
        val z = (0 to 3).map(j => s"w$j*(CAST(f${j}m AS DOUBLE)/1000000.0)").mkString("+")
        val residM = s"(y*1000000 - CAST(round(1.0/(1.0+exp(-($z)))*1000000.0) AS BIGINT))"
        val gs = (0 to 3).map(j =>
          s"CAST(SUM(CAST($residM * f${j}m AS DECIMAL(38,0))) AS DOUBLE) AS g$j").mkString(",\n  ")
        s"""g$r AS (SELECT $gs,
           |  CAST(count(*) AS DOUBLE) AS n FROM feats CROSS JOIN wr${r - 1}),
           |wr$r AS (SELECT ${(0 to 3).map(j => s"w$j + g$j/1000000000000.0/n*$LrRate AS w$j").mkString(", ")}
           |  FROM g$r CROSS JOIN wr${r - 1})""".stripMargin
      }
      s"""WITH base AS (SELECT
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y,
         |  $wsTok AS ntok,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS stops,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct
         | FROM documents),
         |feats AS (SELECT y,
         |  1000000::BIGINT AS f0m,
         |  least(ntok * 10000, 1000000) AS f1m,
         |  (stops * 1000000) // (ntok + 1) AS f2m,
         |  (punct * 1000000) // (ntok + 1) AS f3m
         | FROM base),
         |wr0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
         |${(1 to LrRounds).map(roundCtes).mkString(",\n")}
         |SELECT rnd, w0, w1, w2, w3 FROM (
         | ${(1 to LrRounds).map(r => s"SELECT CAST($r AS BIGINT) AS rnd, * FROM wr$r").mkString(" UNION ALL ")})
         |ORDER BY rnd""".stripMargin
    },
    "x51_pagerank" -> {
      // power iterations replayed as CTEs in the same all-integer
      // pico-rank arithmetic (floor divisions mirror Spark's `div`)
      def iterCte(r: Int): String =
        s"""c$r AS (SELECT dst, CAST(SUM(rk.r // wd.odeg) AS BIGINT) AS cs
           |  FROM r${r - 1} rk JOIN wd ON rk.node = wd.src GROUP BY dst),
           |r$r AS (SELECT node,
           |  (15 * (1000000000000 // n)) // 100 + (85 * coalesce(cs, 0)) // 100 AS r
           | FROM nodes LEFT JOIN c$r ON node = dst CROSS JOIN nf)""".stripMargin
      s"""WITH pairs AS (SELECT DISTINCT l_suppkey * 2 AS a, o_custkey * 2 + 1 AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |wd AS (SELECT e.src, e.dst, d.odeg FROM edges e
         |  JOIN (SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM edges GROUP BY src) d
         |  ON d.src = e.src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |nf AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nf),
         |${(1 to PrRounds).map(iterCte).mkString(",\n")}
         |SELECT CAST(node AS BIGINT) AS node_id, CAST(r AS BIGINT) AS rank_pico
         |FROM r$PrRounds ORDER BY rank_pico DESC, node_id LIMIT 20""".stripMargin
    },
    "x52_bloom_membership" ->
      // the Bloom prefilter is pure pruning — the semantics are a plain
      // NOT EXISTS on the 8-token prefix fingerprint
      s"""WITH k AS (SELECT doc_id, n_chars,
         |  ${polySql("array_to_string((string_split_regex(trim(text), '\\s+'))[1:8], ' ')")} AS k
         | FROM documents)
         |SELECT b.doc_id, CAST(b.n_chars AS BIGINT) AS n_chars FROM k b
         |WHERE b.doc_id % 10 = 0
         |  AND NOT EXISTS (SELECT 1 FROM k c WHERE c.doc_id % 10 <> 0 AND c.k = b.k)
         |ORDER BY doc_id""".stripMargin,
    "x53_shard_export" ->
      s"""WITH k AS (SELECT doc_id, n_chars, ${polySql("text")} AS h,
         |  ${polySql("'shard#' || text")} AS h2 FROM documents),
         |tr AS (SELECT doc_id, n_chars, h2 % $NShards AS shard, h2 FROM k WHERE h % 100 < 80),
         |p AS (SELECT shard, doc_id, n_chars, h2,
         |  row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id) AS position FROM tr)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  CAST(SUM(position * (h2 % 1000003)) AS BIGINT) AS order_fp,
         |  arg_min(doc_id, position) AS first_doc,
         |  arg_max(doc_id, position) AS last_doc
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    "x54_scd2_history" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |  row_number() OVER w AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS total,
        |  lag(event_type) OVER w AS prev_type
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT * FROM m WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w2 AS BIGINT) AS version,
        |  event_type AS status,
        |  ts AS valid_from,
        |  lead(ts) OVER w2 AS valid_to,
        |  CAST(coalesce(lead(rn) OVER w2, total + 1) - rn AS BIGINT) AS n_events,
        |  CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM r WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)
        |ORDER BY user_id, version""".stripMargin,
    "x55_table_profile" -> {
      // one UNION ALL arm per profiled column; min/max do no arithmetic so
      // raw doubles are bit-identical, avg_len is the decimal-exact mean
      def num(tbl: String, c: String) =
        s"""SELECT '$tbl' AS tbl, '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           | CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           | NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str, NULL::DOUBLE AS avg_len
           |FROM $tbl""".stripMargin
      def ts(tbl: String, c: String) =
        s"""SELECT '$tbl', '$c', CAST(count(*) AS BIGINT),
           | CAST(count(*) - count($c) AS BIGINT), CAST(count(DISTINCT $c) AS BIGINT),
           | CAST(epoch_us(min($c)) AS DOUBLE), CAST(epoch_us(max($c)) AS DOUBLE),
           | NULL::VARCHAR, NULL::VARCHAR, NULL::DOUBLE
           |FROM $tbl""".stripMargin
      def str(tbl: String, c: String, extremes: Boolean = true) = {
        val mn = if (extremes) s"min($c)" else "NULL::VARCHAR"
        val mx = if (extremes) s"max($c)" else "NULL::VARCHAR"
        s"""SELECT '$tbl', '$c', CAST(count(*) AS BIGINT),
           | CAST(count(*) - count($c) AS BIGINT), CAST(count(DISTINCT $c) AS BIGINT),
           | NULL::DOUBLE, NULL::DOUBLE, $mn, $mx,
           | CAST(SUM(CAST(length(coalesce($c, '')) AS DECIMAL(18,0))) AS DOUBLE) / count(*)
           |FROM $tbl""".stripMargin
      }
      Seq(
        num("documents", "doc_id"), str("documents", "lang"),
        num("documents", "n_chars"), str("documents", "source"),
        str("documents", "text", extremes = false),
        num("events", "event_id"), str("events", "event_type"),
        str("events", "props", extremes = false), ts("events", "ts"),
        num("events", "user_id"), num("events", "value"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col_name")
    },
    // reachability closure replays the contraction's answer: O(sum of
    // component sizes squared) — oracle-only; the engine contracts instead
    "x56_connected_components" -> CcOracleSql,
    "x57_gap_fill" ->
      // generate_series replays the per-user dense grid; last_value IGNORE
      // NULLS is the sequential form of the engine's forward-fill window
      """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        | FROM events GROUP BY user_id, hr),
        |b AS (SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM h GROUP BY user_id),
        |g AS (SELECT user_id, unnest(generate_series(mn, mx)) AS hr FROM b),
        |j AS (SELECT g.user_id, g.hr, h.cnt, h.sv / h.cnt AS av
        | FROM g LEFT JOIN h ON h.user_id = g.user_id AND h.hr = g.hr)
        |SELECT user_id, hr, CAST(coalesce(cnt, 0) AS BIGINT) AS cnt,
        |  CAST(CASE WHEN cnt IS NULL THEN 0 ELSE 1 END AS INT) AS is_observed,
        |  last_value(av IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr) AS filled_avg
        |FROM j ORDER BY user_id, hr""".stripMargin,
    "x58_triangle_sample" ->
      // same hash coin, same (degree, id) orientation, same once-per-
      // triangle wedge closure. The sampling coin is evaluated INSIDE the
      // pair join so only coin-surviving matches reach the pair-DISTINCT.
      // e/d/o are AS MATERIALIZED: each is referenced 2-3 times, and
      // DuckDB's default CTE inlining hands the join-order optimizer a
      // dozen fact-scan relations whose chosen plan spills ~10x the probe
      // host's temp disk — materialization pins the staged evaluation
      // (8.6 s at sf10 where the inlined form died; the engine's grouped
      // pair build has no self-join at all).
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
         |  WHERE ${polySql("CAST(a.l_suppkey AS VARCHAR) || '#' || CAST(b.l_suppkey AS VARCHAR)")} % $TriBuckets < $TriKeep),
         |d AS MATERIALIZED (SELECT n, count(*) AS deg
         |  FROM (SELECT s1 AS n FROM e UNION ALL SELECT s2 FROM e) GROUP BY n),
         |o AS MATERIALIZED (SELECT CASE WHEN d1.deg <= d2.deg THEN s1 ELSE s2 END AS u,
         |             CASE WHEN d1.deg <= d2.deg THEN s2 ELSE s1 END AS v,
         |             CASE WHEN d1.deg <= d2.deg THEN d2.deg ELSE d1.deg END AS dv
         |      FROM e JOIN d d1 ON d1.n = e.s1 JOIN d d2 ON d2.n = e.s2),
         |w AS (SELECT o1.u, o1.v AS a, o2.v AS b
         |      FROM o o1 JOIN o o2 ON o1.u = o2.u
         |       AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))),
         |tri AS (SELECT w.u, w.a, w.b FROM w JOIN o ON o.u = w.a AND o.v = w.b),
         |c AS (SELECT n, count(*) AS tri FROM (
         |  SELECT u AS n FROM tri UNION ALL SELECT a FROM tri
         |  UNION ALL SELECT b FROM tri) GROUP BY n)
         |SELECT d.n AS node, CAST(d.deg AS BIGINT) AS deg,
         |  CAST(coalesce(c.tri, 0) AS BIGINT) AS tri
         |FROM d LEFT JOIN c ON c.n = d.n ORDER BY node""".stripMargin,
    "x59_prefix_join" ->
      // DELIBERATELY the naive quadratic form: the oracle computes true
      // all-pairs Jaccard, so the compare certifies the engine's prefix
      // filter loses no pair (the Bayardo et al. exactness theorem)
      s"""WITH $PlantedDocsSql,
         |$ShinglesSql,
         |ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) AS o,
         |  CAST(len(a.s) AS DOUBLE) AS n1, CAST(len(b.s) AS DOUBLE) AS n2
         | FROM ne a JOIN ne b ON a.doc_id < b.doc_id)
         |SELECT id1, id2, o/(n1+n2-o) AS jac FROM p
         |WHERE o/(n1+n2-o) >= $PrefixJoinT ORDER BY id1, id2""".stripMargin,
    "x60_table_profile_sketch" -> {
      // The oracle REPRODUCES the KMV sketch exactly (the q21/q29
      // determinism argument): distinct polyHash values, sorted, count-or-
      // kth-min estimator — no epsilon judging in the compare.
      val estNum = (ProfK - 1).toLong * 2147483647L // (k-1) * P, as q21
      def spread(h: String) = s"(506952114::BIGINT * ($h) + 12345) % 2147483647"
      def arm(tbl: String, cn: String, hashExpr: String) =
        s"""SELECT '$tbl' AS tbl, '$cn' AS col_name,
           | CAST(count(*) AS BIGINT) AS n_rows,
           | CAST(count(*) - count($cn) AS BIGINT) AS n_nulls,
           | (SELECT round(CASE WHEN count(h) < $ProfK THEN CAST(count(h) AS DOUBLE)
           |   ELSE $estNum.0 / CAST(min(CASE WHEN rk = $ProfK THEN h END) AS DOUBLE) END, 4)
           |  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk
           |        FROM (SELECT DISTINCT ${hashExpr} AS h FROM $tbl WHERE $cn IS NOT NULL) __d) __r
           | ) AS kmv_distinct
           |FROM $tbl""".stripMargin
      def intH(cn: String) = spread(polySql(s"CAST($cn AS VARCHAR)"))
      Seq(
        arm("documents", "doc_id", intH("doc_id")),
        arm("documents", "lang", spread(polySql("lang"))),
        arm("documents", "n_chars", intH("n_chars")),
        arm("documents", "source", spread(polySql("source"))),
        arm("documents", "text", spread(polySql("text"))),
        arm("events", "event_id", intH("event_id")),
        arm("events", "event_type", spread(polySql("event_type"))),
        arm("events", "props", spread(polySql("props"))),
        arm("events", "ts", spread(polySql("CAST(epoch_us(ts) AS VARCHAR)"))),
        arm("events", "user_id", intH("user_id")),
        arm("events", "value",
          spread(polySql("CAST(CAST(round(value*1000000.0) AS BIGINT) AS VARCHAR)"))))
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col_name")
    },
    // coin-independent on purpose — see CcOracleSql
    "x61_incremental_cc" -> CcOracleSql,
    "x62_source_divergence" ->
      // dense smoothed per-source bucket distributions; JS terms mirror
      // the engine's expression order exactly and are decimal-quantized
      // (scale 12, six guard digits below the round-6 digit so exact
      // .5 rounding ties are ~1e-6-rare) before the exact sum — libm ln
      // noise (~1e-18 per term) sits far below the quantum
      s"""WITH tk AS (SELECT source, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS tok FROM documents),
         |bc AS (SELECT source, ${polySql("tok")} % ${CorpusMix.Buckets} AS bucket,
         |  CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2),
         |n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM bc GROUP BY source),
         |g AS (SELECT n.source, b.bucket,
         |  CAST(coalesce(bc.c, 0) + 1 AS DOUBLE) / CAST(n.n + ${CorpusMix.Buckets} AS DOUBLE) AS p
         | FROM n CROSS JOIN (SELECT unnest(range(0, ${CorpusMix.Buckets})) AS bucket) b
         | LEFT JOIN bc ON bc.source = n.source AND bc.bucket = b.bucket),
         |pairs AS (SELECT a.source AS src1, b.source AS src2,
         |  a.p * ln(a.p / ((a.p + b.p) / 2.0)) / 2.0 +
         |  b.p * ln(b.p / ((a.p + b.p) / 2.0)) / 2.0 AS term
         | FROM g a JOIN g b ON a.bucket = b.bucket AND a.source < b.source)
         |SELECT src1, src2,
         | round(CAST(SUM(CAST(term AS DECIMAL(18,12))) AS DOUBLE), 6) AS js
         |FROM pairs GROUP BY src1, src2 ORDER BY src1, src2""".stripMargin,
    "x62s_divergence_slice" ->
      // x62's oracle with the identical pre-bucket token filter: the hash
      // is computed once per token, the 1-in-16 filter precedes the
      // count, and everything downstream (smoothing, JS terms, scale-12
      // quantized sum) is byte-for-byte x62's
      s"""WITH tk AS (SELECT source, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS tok FROM documents),
         |th AS (SELECT source, ${polySql("tok")} AS h FROM tk),
         |bc AS (SELECT source, h % ${CorpusMix.Buckets} AS bucket,
         |  CAST(count(*) AS BIGINT) AS c FROM th WHERE h % $DivSliceMod = 0 GROUP BY 1, 2),
         |n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM bc GROUP BY source),
         |g AS (SELECT n.source, b.bucket,
         |  CAST(coalesce(bc.c, 0) + 1 AS DOUBLE) / CAST(n.n + ${CorpusMix.Buckets} AS DOUBLE) AS p
         | FROM n CROSS JOIN (SELECT unnest(range(0, ${CorpusMix.Buckets})) AS bucket) b
         | LEFT JOIN bc ON bc.source = n.source AND bc.bucket = b.bucket),
         |pairs AS (SELECT a.source AS src1, b.source AS src2,
         |  a.p * ln(a.p / ((a.p + b.p) / 2.0)) / 2.0 +
         |  b.p * ln(b.p / ((a.p + b.p) / 2.0)) / 2.0 AS term
         | FROM g a JOIN g b ON a.bucket = b.bucket AND a.source < b.source)
         |SELECT src1, src2,
         | round(CAST(SUM(CAST(term AS DECIMAL(18,12))) AS DOUBLE), 6) AS js
         |FROM pairs GROUP BY src1, src2 ORDER BY src1, src2""".stripMargin,
    "x63_temperature_mix" ->
      // the one libm quantity (n^alpha) is floored at 1e6 micro-units far
      // from knife edges; base/remainder/top-up are pure integer
      // arithmetic — int128 (HUGEINT here, decimal(38,0) engine-side)
      // because budget*w and Σw overflow int64 at ~1e8-doc sources —
      // so Σ alloc == budget exactly in both engines
      s"""WITH ${tempMixCtesSql(MixBudget)}
         |SELECT source, n_docs, w, alloc
         |FROM alc ORDER BY source""".stripMargin,
    "x64_quality_calibration" ->
      // the oracle IS the naive per-source-sort window; the engine's
      // bucket decomposition must reassemble bit-identical percent
      // ranks (integer-over-integer division, so no rounding needed)
      s"""WITH h AS (SELECT doc_id, source,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM documents),
         |q AS (SELECT doc_id, source, $QualitySql AS quality FROM h),
         |r AS (SELECT doc_id, source, quality,
         |  percent_rank() OVER (PARTITION BY source ORDER BY quality) AS pct_rank FROM q)
         |SELECT doc_id, source, quality, pct_rank,
         | CAST(pct_rank >= $CalibCut AS INT) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "x65_lm_holdout_filter" ->
      // x49's LM arithmetic with the 80/20 content-hash split: stats
      // CTEs read the train split only, scoring LEFT-joins so unseen
      // held-out bigrams keep the backoff floor instead of dropping
      s"""WITH d AS (SELECT doc_id, text, ${polySql("'lmsplit#' || text")} % $LmSplitMod AS coin FROM documents),
         |ttk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM d WHERE coin < $LmTrainBelow),
         |htk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM d WHERE coin >= $LmTrainBelow),
         |uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS uc FROM (SELECT unnest(t) AS tok FROM ttk) GROUP BY tok),
         |tot AS (SELECT (SELECT CAST(SUM(uc) AS BIGINT) FROM uc) AS tt,
         |  (SELECT CAST(count(*) AS BIGINT) FROM uc) AS vv),
         |tbp AS (SELECT p.prev AS prev, p.cur AS cur FROM (
         |  SELECT unnest(list_transform(range(1, len(t)), i -> {'prev': t[i], 'cur': t[i+1]})) AS p
         |  FROM ttk WHERE len(t) >= 2)),
         |bc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS bc FROM tbp GROUP BY prev, cur),
         |hbp AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> {'prev': t[i], 'cur': t[i+1]})) AS p
         |  FROM htk WHERE len(t) >= 2)),
         |sc AS (SELECT hbp.doc_id,
         |  ln(CASE WHEN bc.bc IS NOT NULL THEN $BigramLambda * (CAST(bc.bc AS DOUBLE) / CAST(pu.uc AS DOUBLE)) ELSE 0.0 END
         |   + ${1.0 - BigramLambda} * (CAST(coalesce(cu.uc, 0) + 1 AS DOUBLE) / CAST(tt + vv AS DOUBLE))) AS lp
         | FROM hbp LEFT JOIN bc ON bc.prev = hbp.prev AND bc.cur = hbp.cur
         |   LEFT JOIN uc pu ON pu.tok = hbp.prev
         |   LEFT JOIN uc cu ON cu.tok = hbp.cur
         |   CROSS JOIN tot),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logprob
         | FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, avg_logprob,
         | CAST(avg_logprob >= $LmKeepFloor AS INT) AS keep
         |FROM ag ORDER BY doc_id""".stripMargin,
    "x66_cluster_canonical" ->
      // same cluster CTEs as x26; the representative is the per-cluster
      // window head on (quality DESC, doc_id) — the engine's
      // min(struct(-quality, doc_id)) aggregate must agree exactly
      s"""WITH $DupClusterCtesSql,
         |hq AS (SELECT doc_id,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM corpus),
         |qq AS (SELECT doc_id, $QualitySql AS quality FROM hq),
         |allq AS (SELECT c.doc_id, CAST(coalesce(l.label, c.doc_id) AS BIGINT) AS cluster, q.quality
         | FROM corpus c LEFT JOIN lab4 l ON l.id = c.doc_id JOIN qq q ON q.doc_id = c.doc_id),
         |reps AS (SELECT cluster, doc_id AS rep_id FROM (
         |  SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn FROM allq)
         | WHERE rn = 1)
         |SELECT a.doc_id, r.rep_id, a.quality,
         | CAST(a.doc_id = r.rep_id AS INT) AS keep
         |FROM allq a JOIN reps r USING (cluster) ORDER BY a.doc_id""".stripMargin,
    "x67_knn_label_vote" ->
      // x08's cosine/rank arithmetic (round 6, ties by vec_id) + the
      // two-phase vote argmax (max votes, then min label among ties)
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
         |  ${polySql("'knn#' || CAST(vec_id AS VARCHAR)")} AS hd FROM embeddings),
         |r0 AS (SELECT vec_id, v, label, row_number() OVER (ORDER BY hd, vec_id) AS rn FROM e),
         |ev AS (SELECT vec_id AS qid, v AS qv, label AS tl FROM r0 WHERE rn <= $KnnEvalN),
         |tr AS (SELECT vec_id, v, label FROM r0 WHERE rn > $KnnEvalN),
         |p AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos, tr.label AS nl
         | FROM tr, ev WHERE vec_id <> qid),
         |r AS (SELECT qid, nl, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk FROM p),
         |vt AS (SELECT qid, nl, CAST(count(*) AS BIGINT) AS votes FROM r WHERE rnk <= $KnnK GROUP BY qid, nl),
         |mx AS (SELECT qid, max(votes) AS mv FROM vt GROUP BY qid),
         |pr AS (SELECT vt.qid, CAST(min(nl) AS INT) AS pred, CAST(max(vt.votes) AS BIGINT) AS votes
         | FROM vt JOIN mx ON mx.qid = vt.qid AND vt.votes = mx.mv GROUP BY vt.qid)
         |SELECT ev.qid AS vec_id, CAST(ev.tl AS INT) AS label, pr.pred, pr.votes,
         | CAST(ev.tl = pr.pred AS INT) AS correct
         |FROM ev JOIN pr ON pr.qid = ev.qid ORDER BY vec_id""".stripMargin,
    "x68_bitext_margin" ->
      // cosines round to 6 (x08 convention); the shared margin tail runs
      // over the full cross-language grid
      s"""WITH l AS (SELECT doc_id AS vec_id, lang FROM documents),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |en AS (SELECT e.vec_id AS en_id, v AS ev FROM e JOIN l USING (vec_id) WHERE lang = 'en'),
         |es AS (SELECT e.vec_id AS es_id, v AS sv FROM e JOIN l USING (vec_id) WHERE lang = 'es'),
         |g AS (SELECT en_id, es_id, round(list_cosine_similarity(ev, sv), 6) AS cos FROM en CROSS JOIN es),
         |$bitextTailSql""".stripMargin,
    "x68b_bitext_ann" ->
      // identical trained IVF index to x13/x25 (the unrolled-k-means
      // trick over the FULL embeddings table); es side assigned to its
      // one nearest cell, en side probes its two nearest (the SQL mirror
      // of Similarity.ivfProbe(nprobe = 2)); candidates are the cell
      // equi-join pairs, then the identical shared margin tail
      s"""WITH l AS (SELECT doc_id AS vec_id, lang FROM documents),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < $IvfCells),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |en AS (SELECT e.vec_id AS en_id, v AS ev FROM e JOIN l USING (vec_id) WHERE lang = 'en'),
         |es AS (SELECT e.vec_id AS es_id, v AS sv FROM e JOIN l USING (vec_id) WHERE lang = 'es'),
         |esa AS (SELECT es_id, sv, cell_id FROM (
         | SELECT es.es_id, es.sv, c2.cell_id,
         |  row_number() OVER (PARTITION BY es.es_id
         |    ORDER BY round(list_cosine_similarity(es.sv, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM es CROSS JOIN c2) WHERE arnk = 1),
         |ena AS (SELECT en_id, ev, cell_id FROM (
         | SELECT en.en_id, en.ev, c2.cell_id,
         |  row_number() OVER (PARTITION BY en.en_id
         |    ORDER BY round(list_cosine_similarity(en.ev, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM en CROSS JOIN c2) WHERE arnk <= $BitextNProbe),
         |g AS (SELECT ena.en_id, esa.es_id, round(list_cosine_similarity(ena.ev, esa.sv), 6) AS cos
         | FROM ena JOIN esa USING (cell_id)),
         |$bitextTailSql""".stripMargin,
    "x69_mix_materialize" ->
      // the oracle IS the naive per-source-sort window; the engine's
      // bucket decomposition must produce the identical unique ranks
      s"""WITH ${tempMixCtesSql(MatBudget)},
         |d AS (SELECT doc_id, source, ${polySql("'mix#' || text")} AS h FROM documents),
         |rr AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS pick_rank FROM d)
         |SELECT rr.doc_id, rr.source, rr.pick_rank
         |FROM rr JOIN alc USING (source) WHERE rr.pick_rank <= alc.alloc
         |ORDER BY rr.doc_id""".stripMargin,
    "x70_corpus_diff" ->
      // same simulated next release; the diff compares md5 content
      // hashes over the doc_id full outer join, mirroring the engine
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 17 <> 0
        | UNION ALL SELECT doc_id + 1000000000000 AS doc_id, text FROM v1 WHERE doc_id % 19 = 0),
        |a AS (SELECT doc_id, md5(text) AS h1 FROM v1),
        |b AS (SELECT doc_id, md5(text) AS h2 FROM v2)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        | CASE WHEN a.doc_id IS NULL THEN 'added'
        |      WHEN b.doc_id IS NULL THEN 'removed'
        |      WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id ORDER BY doc_id""".stripMargin,
    "x71_padding_waste" -> {
      val capCase = PadCaps.init.map(c => s"WHEN n <= $c THEN $c")
        .mkString("CASE ", " ", s" ELSE ${PadCaps.last} END")
      s"""WITH d AS (SELECT CAST(length(regexp_extract_all(text, '${TextOps.BpePattern}')) AS BIGINT) AS n FROM documents),
         |b AS (SELECT $capCase AS cap, least(n, ${PadCaps.last}) AS tok FROM d)
         |SELECT CAST(cap AS BIGINT) AS cap, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(SUM(tok) AS BIGINT) AS tokens,
         | CAST(cap * count(*) - SUM(tok) AS BIGINT) AS padding,
         | CAST(cap * count(*) - SUM(tok) AS DOUBLE) / CAST(cap * count(*) AS DOUBLE) AS waste_ratio
         |FROM b GROUP BY cap ORDER BY cap""".stripMargin
    },
    "x72_html_extract" ->
      // identical planted page, byte-identical regex/entity pipeline
      // (TextOps patterns are RE2-safe by construction), fingerprint
      // compare over the extracted main text
      s"""WITH h AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
         |  '</title><style>body {color: #222}</style><script>var id = ' || CAST(doc_id AS VARCHAR) ||
         |  ';</script></head><body><div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div><h1>Doc ' ||
         |  CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
         |  CASE WHEN doc_id % 3 = 0 THEN ' tail &quot;q&quot; &amp;lt;esc&amp;gt; &lt;i&gt; x&nbsp;y' ELSE '' END || '</p>' ||
         |  CASE WHEN doc_id % 5 = 0 THEN '<p>Related: <a href="/r1">first link text</a> and <a href="/r2">second much longer link text here</a> end</p>' ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0 THEN '<p>trailing malformed <b>bold text without closing tags' ELSE '' END ||
         |  '<div class="footer"><a href="/terms">Terms of Service</a> <a href="/privacy">Privacy Policy</a> (c)</div></body></html>' AS html
         | FROM documents),
         |c AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
         |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |  '(?s)<!--.*?-->', ' ', 'g') AS body FROM h),
         |bl AS (SELECT doc_id, ${htmlBlocksSql("body")} AS blocks FROM c),
         |k AS (SELECT doc_id,
         |  list_filter(blocks, s -> length(s.t) > 0) AS ne,
         |  list_filter(blocks, s -> length(s.t) > 0 AND s.lc * 2 <= length(s.t)) AS kept FROM bl),
         |m AS (SELECT doc_id, ne, kept, array_to_string(list_transform(kept, s -> s.t), ' ') AS main FROM k)
         |SELECT doc_id, CAST(len(ne) AS BIGINT) AS n_blocks, CAST(len(kept) AS BIGINT) AS n_kept,
         | CAST(length(main) AS BIGINT) AS main_chars, ${polySql("main")} AS main_fp
         |FROM m ORDER BY doc_id""".stripMargin,
    "x73_url_canonical" ->
      // identical synthesized messy URL; canonicalization patterns are
      // RE2-safe and byte-identical; anchored regexp_replace means
      // DuckDB's replace-first == Spark's replace-all
      s"""WITH u AS (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
         |  CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END ||
         |  CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
         |  '.example' ||
         |  CASE WHEN doc_id % 5 = 0 THEN '.COM' ELSE '.com' END ||
         |  CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
         |  '/docs/' || CAST(doc_id % 50 AS VARCHAR) ||
         |  CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END || '?' ||
         |  CASE WHEN doc_id % 2 = 0 THEN 'a=1&utm_source=feed&id=' || CAST(doc_id % 20 AS VARCHAR)
         |       ELSE 'id=' || CAST(doc_id % 20 AS VARCHAR) || '&a=1' END ||
         |  CASE WHEN doc_id % 9 = 0 THEN '#top' ELSE '' END AS url
         | FROM documents),
         |p AS (SELECT doc_id,
         |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         |  regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)), '^www\\.', '') AS host,
         |  regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:([0-9]+)', 1) AS port,
         |  regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$$', '') AS path0,
         |  regexp_extract(url, '\\?([^#]*)', 1) AS q0
         | FROM u),
         |c AS (SELECT doc_id, host,
         |  scheme || '://' || host ||
         |  CASE WHEN port = '' OR (scheme = 'https' AND port = '443') OR (scheme = 'http' AND port = '80')
         |       THEN '' ELSE ':' || port END ||
         |  CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
         |  CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url
         | FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(q0, '&'),
         |    x -> x <> '' AND NOT regexp_matches(x, '$UrlTrackRe'))), '&') AS qs FROM p))
         |SELECT canon_url, host, CAST(count(*) AS BIGINT) AS n_urls,
         | CAST(min(doc_id) AS BIGINT) AS keep_id
         |FROM c GROUP BY canon_url, host ORDER BY canon_url""".stripMargin,
    "x74_line_dedup" ->
      // identical planted header/footer boilerplate (chr(10) avoids raw
      // newlines in the SQL text); df over the shared polyHash line key;
      // reassembly via ordered string_agg (NULL-skipping, like Spark's
      // null-dropping collect_list), coalesced to '' for the all-
      // boilerplate edge
      s"""WITH d AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter for updates' || chr(10) ELSE '' END ||
         |  text ||
         |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'All rights reserved - terms apply' ELSE '' END AS t
         | FROM documents),
         |l AS (SELECT doc_id, CAST(s.i - 1 AS BIGINT) AS pos, s.line AS line FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(sp)+1), i -> {'i': i, 'line': sp[i]})) AS s
         |  FROM (SELECT doc_id, string_split(t, chr(10)) AS sp FROM d))),
         |h AS (SELECT doc_id, pos, line, ${polySql("line")} AS lh FROM l),
         |f AS (SELECT lh, CAST(count(DISTINCT doc_id) AS BIGINT) AS line_df FROM h GROUP BY lh),
         |j AS (SELECT h.doc_id, h.pos, h.line, f.line_df FROM h JOIN f USING (lh))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CASE WHEN line_df <= $LineDfCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | ${polySql(s"coalesce(string_agg(CASE WHEN line_df <= $LineDfCap THEN line END, chr(10) ORDER BY pos), '')")} AS clean_fp
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x75_ipf_mix" -> {
      // both 1-D targets are the exact x63 integer kernel (HUGEINT);
      // the IPF rounds unroll with the identical decimal-quantized
      // marginal sums and `q * (target / m)` op order
      val rounds = (1 to IpfRounds)
        .map(r => ipfRoundSql(if (r == 1) "q0" else s"q${r - 1}", r)).mkString(",\n")
      s"""WITH ${tempAllocCtesSql("lang", "tl", MixBudget)},
         |${tempAllocCtesSql("source", "ts", MixBudget)},
         |cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang, source),
         |q0 AS (SELECT cells.lang, cells.source, cells.n_docs, lt.alloc AS lt, st.alloc AS st,
         |  CAST(cells.n_docs AS DOUBLE) AS q
         | FROM cells JOIN tlalc lt ON lt.k = cells.lang JOIN tsalc st ON st.k = cells.source),
         |$rounds
         |SELECT lang, source, n_docs, lt, st, round(q, 6) AS quota
         |FROM q$IpfRounds ORDER BY lang, source""".stripMargin
    },
    "x76_cluster_split" ->
      // same cluster CTEs as x26/x66; the split coin is the x12 hash
      // convention over the cluster id (singletons: their own id), and
      // `torn` compares against the naive per-doc coin
      s"""WITH $DupClusterCtesSql,
         |lbl AS (SELECT corpus.doc_id, coalesce(lab4.label, corpus.doc_id) AS cluster
         | FROM corpus LEFT JOIN lab4 ON lab4.id = corpus.doc_id),
         |sp AS (SELECT doc_id, cluster,
         |  ${polySql("'split#' || CAST(cluster AS VARCHAR)")} % 100 AS cb,
         |  ${polySql("'split#' || CAST(doc_id AS VARCHAR)")} % 100 AS nb
         | FROM lbl)
         |SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
         | CASE WHEN cb < 80 THEN 'train' WHEN cb < 90 THEN 'val' ELSE 'test' END AS split,
         | CAST((CASE WHEN cb < 80 THEN 'train' WHEN cb < 90 THEN 'val' ELSE 'test' END) <>
         |      (CASE WHEN nb < 80 THEN 'train' WHEN nb < 90 THEN 'val' ELSE 'test' END) AS INT) AS torn
         |FROM sp ORDER BY doc_id""".stripMargin,
    "x77_curation_funnel" ->
      // same cluster CTEs; exact dedup partitions by text (== by content
      // hash, the engine's key), tokens are the x01 ws count, quality the
      // x02 score — the funnel composes verified kernels
      s"""WITH $DupClusterCtesSql,
         |tq AS (SELECT doc_id, text,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM corpus),
         |tq2 AS (SELECT doc_id, text, ws AS tok, $QualitySql AS q FROM tq),
         |s1 AS (SELECT tq2.* FROM tq2 JOIN (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS m FROM corpus) e USING (doc_id)
         | WHERE doc_id = m),
         |s1c AS (SELECT s1.*, coalesce(lab4.label, s1.doc_id) AS cluster
         | FROM s1 LEFT JOIN lab4 ON lab4.id = s1.doc_id),
         |s2 AS (SELECT * FROM (
         |  SELECT s1c.*, min(doc_id) OVER (PARTITION BY cluster) AS cm FROM s1c) WHERE doc_id = cm),
         |s3 AS (SELECT * FROM s2 WHERE q >= 0.5),
         |fun AS (
         | SELECT 0 AS stage, 'ingest' AS stage_name, count(*) AS n_docs, SUM(tok) AS n_tokens FROM tq2
         | UNION ALL SELECT 1, 'exact_dedup', count(*), SUM(tok) FROM s1
         | UNION ALL SELECT 2, 'near_dedup', count(*), SUM(tok) FROM s2
         | UNION ALL SELECT 3, 'quality_gate', count(*), SUM(tok) FROM s3)
         |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
         | CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
         | CAST(coalesce(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0) AS BIGINT) AS removed_docs,
         | CAST(coalesce(lag(n_tokens) OVER (ORDER BY stage) - n_tokens, 0) AS BIGINT) AS removed_tokens
         |FROM fun ORDER BY stage""".stripMargin,
    "x78_semantic_mix" ->
      // identical trained IVF index (the x13 unrolled k-means); per-cell
      // counts through the exact allocation kernel with cell ids as
      // VARCHAR keys (mirroring the engine's string tiebreak); the pick
      // is the x69 naive-window oracle over (hash, vec_id) per cell
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < $IvfCells),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfAssignSql("c2", "assigned")},
         |${tempAllocCtesSql("CAST(cell_id AS VARCHAR)", "sm", SemMixBudget, from = "assigned")},
         |rr AS (SELECT vec_id, cell_id,
         |  CAST(row_number() OVER (PARTITION BY cell_id
         |    ORDER BY ${polySql("'semmix#' || CAST(vec_id AS VARCHAR)")}, vec_id) AS BIGINT) AS pick_rank
         | FROM assigned)
         |SELECT rr.vec_id, rr.cell_id, rr.pick_rank
         |FROM rr JOIN smalc ON smalc.k = CAST(rr.cell_id AS VARCHAR)
         |WHERE rr.pick_rank <= smalc.alloc
         |ORDER BY rr.vec_id""".stripMargin,
    "x79_dup_ngram_rate" ->
      // identical planted duplication; POSITIONAL 5-grams (no distinct —
      // within-doc repetition counts), global occurrence counts over the
      // shared polyHash gram key. Gram hashes via the token-level
      // combination (fastGramCtesSql) — chars hashed once per doc, not
      // once per gram position, which unlocks >sf1 oracle sweeps.
      s"""WITH base AS (SELECT doc_id, source, text FROM documents),
         |corpus AS (SELECT doc_id, source, text FROM base
         | UNION ALL SELECT doc_id + 1000000, source, text FROM base WHERE doc_id % 7 = 0),
         |${fastGramCtesSql("corpus", "source", "f", DupNgramN)},
         |c AS (SELECT gh, CAST(count(*) AS BIGINT) AS n FROM fgh GROUP BY gh)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_positions,
         | CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_positions,
         | round(CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
         |FROM fgh JOIN c USING (gh) GROUP BY source ORDER BY source""".stripMargin,
    "x80_doremi_mix" ->
      // per-source vs global unigram LM excess loss (scale-6 quantized
      // position sums), exp-weights smoothed toward uniform, then the
      // HUGEINT largest-remainder apportionment (x63's integer tail)
      s"""WITH tk AS (SELECT source, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS tok FROM documents),
         |st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS sc FROM tk GROUP BY source, tok),
         |g AS (SELECT tok, CAST(SUM(sc) AS BIGINT) AS gc FROM st GROUP BY tok),
         |stt AS (SELECT source, CAST(SUM(sc) AS BIGINT) AS stot FROM st GROUP BY source),
         |gt AS (SELECT CAST(SUM(gc) AS BIGINT) AS gt FROM g),
         |d AS (SELECT st.source, st.sc,
         |  ln(CAST(st.sc AS DOUBLE) / CAST(stt.stot AS DOUBLE))
         |   - ln(CAST(g.gc AS DOUBLE) / CAST(gt.gt AS DOUBLE)) AS d
         | FROM st JOIN g USING (tok) JOIN stt USING (source) CROSS JOIN gt),
         |ex AS (SELECT source,
         |  CAST(SUM(CAST(d * CAST(sc AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) / CAST(SUM(sc) AS DOUBLE) AS excess
         | FROM d GROUP BY source),
         |u AS (SELECT source, excess, round(exp($DoremiEta * excess), 6) AS u FROM ex),
         |uu AS (SELECT CAST(SUM(CAST(u AS DECIMAL(18,6))) AS DOUBLE) AS usum, count(*) AS k FROM u),
         |w AS (SELECT source, excess,
         |  CAST(floor(($DoremiKeep * u / usum + $DoremiSmooth / k) * 1000000000.0) AS BIGINT) AS w
         | FROM u CROSS JOIN uu),
         |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
         |tw AS (SELECT SUM(CAST(w AS HUGEINT)) AS tw FROM w),
         |q AS (SELECT w.source, w.excess, nd.n_docs, w.w,
         |  (CAST($DoremiBudget AS HUGEINT) * w.w) // tw.tw AS base,
         |  (CAST($DoremiBudget AS HUGEINT) * w.w) % tw.tw AS rem
         | FROM w JOIN nd USING (source) CROSS JOIN tw),
         |sh AS (SELECT $DoremiBudget - SUM(base) AS short FROM q),
         |r AS (SELECT q.*, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q)
         |SELECT source, n_docs, excess, w,
         | CAST(base + CASE WHEN rk <= (SELECT short FROM sh) THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM r ORDER BY source""".stripMargin,
    "x81_bpe_fertility" ->
      // x46's vocabulary CTE chain (identical merges), aggregated per
      // language; strlen = UTF-8 bytes (Spark octet_length's mirror)
      s"""WITH words AS (
         | SELECT lang, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         | FROM documents),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY w HAVING $BmpOnlySql),
         |s0 AS (SELECT w, ' ' || array_to_string(list_filter(string_split(w, ''), c -> c <> ''), ' ') || ' ' AS sym, n FROM wc),
         |${bpeRoundsCtes("w, ")},
         |tc AS (SELECT w, len(list_filter(string_split(trim(sym), ' '), c -> c <> '')) AS ntok FROM s$BpeRounds)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         | CAST(SUM(ntok) AS BIGINT) AS bpe_tokens,
         | CAST(SUM(strlen(w)) AS BIGINT) AS n_bytes,
         | CAST(SUM(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS fertility,
         | CAST(SUM(strlen(w)) AS DOUBLE) / CAST(SUM(ntok) AS DOUBLE) AS bytes_per_token
         |FROM words JOIN tc USING (w)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "x82_zipf_health" ->
      // scale-12 quantized ln(rank)/ln(freq), decimal-exact regression
      // sums (products at scale 24), slope assembled from the identical
      // doubles with the identical expression shape
      s"""WITH tk AS (SELECT source, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS tok FROM documents),
         |tf AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS f FROM tk GROUP BY source, tok),
         |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types, CAST(SUM(f) AS BIGINT) AS n_tokens FROM tf GROUP BY source),
         |top AS (SELECT source, f, row_number() OVER (PARTITION BY source ORDER BY f DESC, tok) AS r
         | FROM tf QUALIFY r <= $ZipfTopK),
         |xy AS (SELECT source,
         |  CAST(round(ln(CAST(r AS DOUBLE)), 12) AS DECIMAL(18,12)) AS x,
         |  CAST(round(ln(CAST(f AS DOUBLE)), 12) AS DECIMAL(18,12)) AS y FROM top),
         |sm AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
         |  CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |  CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx
         | FROM xy GROUP BY source)
         |SELECT sm.source, n_types, n_tokens,
         | CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
         | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
         |FROM sm JOIN tot USING (source) ORDER BY source""".stripMargin,
    "x83_cluster_sizes" ->
      // same cluster CTEs as x26/x66/x76/x77; two aggregates on top
      s"""WITH $DupClusterCtesSql,
         |lbl AS (SELECT corpus.doc_id, coalesce(lab4.label, corpus.doc_id) AS cluster
         | FROM corpus LEFT JOIN lab4 ON lab4.id = corpus.doc_id),
         |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS k FROM lbl GROUP BY cluster),
         |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_clusters, CAST(SUM(k) AS BIGINT) AS n_docs FROM sz GROUP BY k),
         |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM h)
         |SELECT k AS cluster_size, n_clusters, n_docs,
         | CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS pct_of_corpus
         |FROM h CROSS JOIN t ORDER BY cluster_size""".stripMargin,
    "x84_ccnet_buckets" ->
      // x22's exact LM mean per doc, percent_rank per language (the
      // engine's bucket decomposition reproduces the window exactly),
      // tercile cuts on identical double literals
      """WITH tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok FROM documents),
        |vc AS (SELECT tok, CAST(count(*) AS BIGINT) AS tc FROM tk GROUP BY tok),
        |tt AS (SELECT CAST(SUM(tc) AS BIGINT) AS tt FROM vc),
        |lp AS (SELECT doc_id,
        |  CAST(SUM(CAST(ln(CAST(tc AS DOUBLE) / CAST(tt AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logprob
        | FROM tk JOIN vc USING (tok) CROSS JOIN tt GROUP BY doc_id),
        |d AS (SELECT documents.doc_id, lang, avg_logprob FROM documents JOIN lp USING (doc_id)),
        |pr AS (SELECT doc_id, lang, avg_logprob,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY avg_logprob) AS pct_rank FROM d)
        |SELECT doc_id, lang, avg_logprob, pct_rank,
        | CASE WHEN pct_rank >= 2.0/3.0 THEN 'head'
        |      WHEN pct_rank >= 1.0/3.0 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM pr ORDER BY doc_id""".stripMargin,
    "x85_winnowing" ->
      // positional grams (0-based), lead-window argmin with the
      // rightmost-tie CASE — identical scalar algebra, with the lead
      // columns and tie CASE GENERATED from WinnowW (winnowSelCtesSql)
      // and gram hashes via the token-level combination (fastGramCtesSql).
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |${fastGramCtesSql("corpus", "doc_id", "f", DupNgramN)},
         |${winnowSelCtesSql("doc_id", "f", WinnowW)}
         |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, gh
         |FROM fsel ORDER BY doc_id, pos""".stripMargin,
    "x86_gopher_rules" -> {
      val toks = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"
      // identical planted bytes via repeat/concat algebra
      s"""WITH base AS (SELECT doc_id, text FROM documents
         | UNION ALL SELECT CAST(500001 AS BIGINT), '$GopherShort'
         | UNION ALL SELECT CAST(500002 AS BIGINT), trim(repeat('#### ', 60))
         | UNION ALL SELECT CAST(500003 AS BIGINT), trim(repeat('pneumonoultramicroscopicsilicovolcanoconiosis ', 60))
         | UNION ALL SELECT CAST(500004 AS BIGINT), repeat('- item alpha beta gamma delta epsilon zeta eta theta iota' || chr(10), 60)
         | UNION ALL SELECT CAST(500005 AS BIGINT), trim(repeat('zebra quokka wombat capybara axolotl ', 12))
         | UNION ALL SELECT CAST(500006 AS BIGINT), repeat('the quick brown fox jumps over something here today ...' || chr(10), 10)),
         |m AS (SELECT doc_id,
         |  CAST(len($toks) AS BIGINT) AS nw,
         |  CAST(length(regexp_replace(text, '${TextOps.WsClassRe}', '', 'g')) AS BIGINT) AS nc,
         |  CAST(len(list_filter($toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS na,
         |  CAST(length(regexp_extract_all(text, '#')) + length(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS ns,
         |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS nl,
         |  CAST(len(list_filter(string_split(text, chr(10)), x -> regexp_matches(x, '^- '))) AS BIGINT) AS nb,
         |  CAST(len(list_filter(string_split(text, chr(10)), x -> regexp_matches(x, '\\.\\.\\.$$'))) AS BIGINT) AS ne,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS nst
         | FROM base),
         |r AS (SELECT doc_id, nw AS n_words,
         |  CAST(nc AS DOUBLE) / CAST(nw AS DOUBLE) AS mean_wlen,
         |  CAST(ns AS DOUBLE) / CAST(nw AS DOUBLE) AS sym_ratio,
         |  CAST(na AS DOUBLE) / CAST(nw AS DOUBLE) AS alpha_ratio,
         |  CAST(nb AS DOUBLE) / CAST(nl AS DOUBLE) AS bullet_ratio,
         |  CAST(ne AS DOUBLE) / CAST(nl AS DOUBLE) AS ellipsis_ratio,
         |  nst AS n_stop FROM m),
         |rl AS (SELECT r.*,
         |  CAST(n_words < $GopherMinWords OR n_words > $GopherMaxWords AS INT) AS r_words,
         |  CAST(mean_wlen < 3.0 OR mean_wlen > 10.0 AS INT) AS r_wlen,
         |  CAST(sym_ratio > 0.1 AS INT) AS r_symbol,
         |  CAST(alpha_ratio < 0.8 AS INT) AS r_alpha,
         |  CAST(bullet_ratio > 0.9 AS INT) AS r_bullet,
         |  CAST(ellipsis_ratio > 0.3 AS INT) AS r_ellipsis,
         |  CAST(n_stop < 2 AS INT) AS r_stop FROM r)
         |SELECT doc_id, n_words, mean_wlen, sym_ratio, alpha_ratio, bullet_ratio,
         | ellipsis_ratio, n_stop, r_words, r_wlen, r_symbol, r_alpha, r_bullet,
         | r_ellipsis, r_stop,
         | CAST(r_words + r_wlen + r_symbol + r_alpha + r_bullet + r_ellipsis + r_stop = 0 AS INT) AS keep
         |FROM rl ORDER BY doc_id""".stripMargin
    },
    "x87_c4_clean" ->
      // identical page construction (concat algebra, chr(10) newlines),
      // identical line predicates, fingerprint over the kept text
      s"""WITH pg AS (SELECT doc_id,
         |  (CASE WHEN doc_id % 13 = 0
         |     THEN text || ' one.' || chr(10) || text
         |     ELSE text || ' one more. two more lines here. three sentences total here.' || chr(10) || 'too short.' || chr(10) ||
         |          'this javascript line has at least five words.' || chr(10) || text END)
         |  || (CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END)
         |  || (CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'a line with a { brace and five words.' ELSE '' END) AS page
         | FROM documents),
         |k AS (SELECT doc_id, page, string_split(page, chr(10)) AS ls,
         |  list_filter(string_split(page, chr(10)), x -> regexp_matches(x, '[.!?"]$$')
         |    AND len(list_filter(string_split_regex(trim(x), '\\s+'), w -> w <> '')) >= 5
         |    AND NOT contains(lower(x), 'javascript')) AS kl
         | FROM pg),
         |m AS (SELECT doc_id,
         |  CAST(len(ls) AS BIGINT) AS n_lines,
         |  CAST(len(kl) AS BIGINT) AS n_kept,
         |  CAST(length(regexp_extract_all(array_to_string(kl, chr(10)), '[.!?]')) AS BIGINT) AS n_sentences,
         |  ${polySql("array_to_string(kl, chr(10))")} AS clean_fp,
         |  CAST(contains(lower(page), 'lorem ipsum') AS INT) AS p_lorem,
         |  CAST(contains(page, '{') AS INT) AS p_brace
         | FROM k)
         |SELECT doc_id, n_lines, n_kept, n_sentences, clean_fp, p_lorem, p_brace,
         | CAST(n_sentences < 3 AS INT) AS p_fewsent,
         | CAST((CASE WHEN n_sentences < 3 THEN 1 ELSE 0 END) + p_lorem + p_brace = 0 AS INT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "x88_langid_confusion" ->
      // x02's langGuess mirror, aggregated into the (label, guess) matrix
      s"""WITH corpus AS (SELECT lang, text FROM documents
         | UNION ALL SELECT 'en', trim(repeat('the cat and the dog is in a house of hats ', 5))
         | UNION ALL SELECT 'es', trim(repeat('el perro la casa de que y en los campos ', 5))
         | UNION ALL SELECT 'de', trim(repeat('der hund die katze und das haus ist von mit ', 5))
         | UNION ALL SELECT 'fr', trim(repeat('le chien la maison les champs de et un que ', 5))
         | UNION ALL SELECT 'zh', trim(repeat('el gato de la casa que y en los ', 5))),
         |h AS (SELECT lang,
         |  length(regexp_extract_all(lower(text), '$StopEn')) AS en,
         |  length(regexp_extract_all(lower(text), '$StopEs')) AS es,
         |  length(regexp_extract_all(lower(text), '$StopDe')) AS de,
         |  length(regexp_extract_all(lower(text), '$StopFr')) AS fr
         | FROM corpus),
         |g AS (SELECT lang,
         |  CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
         |       WHEN es >= de AND es >= fr THEN 'es'
         |       WHEN de >= fr THEN 'de' ELSE 'fr' END AS guess FROM h),
         |c AS (SELECT lang, guess, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY lang, guess),
         |t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS lt FROM c GROUP BY lang)
         |SELECT c.lang, c.guess, c.n,
         | CAST(n AS DOUBLE) / CAST(lt AS DOUBLE) AS share,
         | CAST(c.lang = c.guess AS INT) AS is_correct
         |FROM c JOIN t USING (lang) ORDER BY lang, guess""".stripMargin,
    "x89_semantic_outliers" ->
      // identical trained IVF index (the x13 unrolled k-means); cosine
      // to the OWN centroid rounded at 6, percent_rank per cell
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < $IvfCells),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfAssignSql("c2", "assigned")},
         |sc AS (SELECT a.vec_id, a.cell_id,
         |  round(list_cosine_similarity(a.v, c2.cv), 6) AS cos_c
         | FROM assigned a JOIN c2 USING (cell_id)),
         |pr AS (SELECT vec_id, cell_id, cos_c,
         |  percent_rank() OVER (PARTITION BY cell_id ORDER BY cos_c) AS pct_rank FROM sc)
         |SELECT vec_id, CAST(cell_id AS BIGINT) AS cell_id, cos_c, pct_rank,
         | CAST(pct_rank < $OutlierCut AS INT) AS is_outlier
         |FROM pr ORDER BY vec_id""".stripMargin,
    "x90_novelty_score" ->
      // x79's planted duplication and gram algebra; DISTINCT over gram
      // HASHES on both sides, df over distinct (doc, gh) pairs. Token-
      // level gram hashing (fastGramCtesSql) like x79.
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |corpus AS (SELECT doc_id, text FROM base
         | UNION ALL SELECT doc_id + 1000000, text FROM base WHERE doc_id % 7 = 0),
         |${fastGramCtesSql("corpus", "doc_id", "f", DupNgramN)},
         |h AS (SELECT DISTINCT doc_id, gh FROM fgh),
         |c AS (SELECT gh, CAST(count(*) AS BIGINT) AS df FROM h GROUP BY gh)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         | CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         | CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
         |FROM h JOIN c USING (gh) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x91_semantic_drift" ->
      // identical trained index; v2 = identical planted shift; the x62
      // JS discipline at cell granularity (ln terms rounded at 6, total
      // a decimal-exact sum of the rounded contributions)
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < $IvfCells),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfAssignSql("c2", "assigned")},
         |v2t AS (SELECT vec_id, v FROM e WHERE vec_id % 5 <> 0
         | UNION ALL SELECT vec_id + 100000, v FROM e WHERE vec_id % 7 = 0),
         |a2v AS (SELECT vec_id, cell_id FROM (
         | SELECT t.vec_id, c2.cell_id,
         |  row_number() OVER (PARTITION BY t.vec_id
         |    ORDER BY round(list_cosine_similarity(t.v, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM v2t t CROSS JOIN c2) WHERE arnk = 1),
         |n1 AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_v1 FROM assigned GROUP BY cell_id),
         |n2 AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_v2 FROM a2v GROUP BY cell_id),
         |j AS (SELECT cell_id, coalesce(n_v1, 0) AS n_v1, coalesce(n_v2, 0) AS n_v2
         | FROM n1 FULL JOIN n2 USING (cell_id)),
         |t AS (SELECT CAST(SUM(n_v1) AS BIGINT) AS t1, CAST(SUM(n_v2) AS BIGINT) AS t2 FROM j),
         |pq AS (SELECT cell_id, n_v1, n_v2,
         |  CAST(n_v1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS p,
         |  CAST(n_v2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS q FROM j CROSS JOIN t),
         |ct AS (SELECT cell_id, n_v1, n_v2, p, q,
         |  round(0.5 * (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0.0 END)
         |      + 0.5 * (CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0.0 END), 6) AS js_contrib
         | FROM pq),
         |tt AS (SELECT CAST(SUM(CAST(js_contrib AS DECIMAL(18,6))) AS DOUBLE) AS js_total FROM ct)
         |SELECT CAST(cell_id AS BIGINT) AS cell_id, n_v1, n_v2, p, q, js_contrib, js_total
         |FROM ct CROSS JOIN tt ORDER BY cell_id""".stripMargin,
    "x92_taint_propagation" ->
      // same cluster CTEs as x26/x66/x76/x77/x83; cluster max of the
      // planted ingest flag, joined back per doc
      s"""WITH $DupClusterCtesSql,
         |lbl AS (SELECT corpus.doc_id, coalesce(lab4.label, corpus.doc_id) AS cluster,
         |  CAST(corpus.doc_id % 11 = 0 AS INT) AS own_flag
         | FROM corpus LEFT JOIN lab4 ON lab4.id = corpus.doc_id),
         |cf AS (SELECT cluster, CAST(max(own_flag) AS INT) AS effective_flag FROM lbl GROUP BY cluster)
         |SELECT doc_id, CAST(cluster AS BIGINT) AS cluster, own_flag, effective_flag,
         | CAST(effective_flag = 1 AND own_flag = 0 AS INT) AS tainted_by_dup
         |FROM lbl JOIN cf USING (cluster) ORDER BY doc_id""".stripMargin,
    "x93_epoch_mix" ->
      // the same planted supply tiers, floored-libm weights, and HUGEINT
      // quota arithmetic as the engine; the waterfall unrolls
      // CapMixRounds cap-and-redistribute rounds (converged rounds are
      // no-ops), so engine and oracle agree bit-for-bit on every alloc
      s"""WITH ${cappedMixCtesSql(CapMixRounds)}
         |SELECT source, n_docs, u, w, cap, alloc, capped,
         | (alloc * 1000) // greatest(u, 1) AS epochs_milli
         |FROM allc ORDER BY source""".stripMargin,
    "x94_domain_gate" ->
      // identical synthesized domain-diverse URL, the x73 parse/canon
      // CTEs verbatim, PSL resolution re-derived from the SAME rule
      // rows as the engine's lookup (pslDomainCtesSql), and the same
      // two-level (domain, canon) -> (domain) aggregation; blocklist is
      // a VALUES literal of the planted bad domains
      s"""WITH u94 AS (SELECT doc_id,
         |  'https://' ||
         |  CASE WHEN doc_id % 2 = 0 THEN 'www.' WHEN doc_id % 3 = 0 THEN 'news.' ELSE '' END ||
         |  CASE WHEN doc_id % 17 = 0 THEN '${BadDomains(0)}'
         |       WHEN doc_id % 23 = 0 THEN '${BadDomains(1)}'
         |       WHEN doc_id % 31 = 0 THEN 'm.' || source || '.ck'
         |       WHEN doc_id % 37 = 0 THEN 'city.kawasaki.jp'
         |       WHEN doc_id % 41 = 0 THEN source || '.github.io'
         |       WHEN doc_id % 43 = 0 THEN source || '.COM.'
         |       ELSE source || CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.com' END END ||
         |  '/docs/' || CAST(doc_id % 50 AS VARCHAR) || '?id=' || CAST(doc_id % 20 AS VARCHAR) ||
         |  CASE WHEN doc_id % 9 = 0 THEN '&utm_source=feed' ELSE '' END AS url,
         |  ws, pu, st FROM (SELECT doc_id, source, text,
         |   CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |   CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |   CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         |  FROM documents)),
         |q94 AS (SELECT doc_id, url, $QualitySql AS q FROM u94),
         |p94 AS (SELECT doc_id, q,
         |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         |  regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)), '^www\\.', '') AS host,
         |  regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:([0-9]+)', 1) AS port,
         |  regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$$', '') AS path0,
         |  regexp_extract(url, '\\?([^#]*)', 1) AS q0
         | FROM q94),
         |c94 AS (SELECT doc_id, q, host,
         |  scheme || '://' || host ||
         |  CASE WHEN port = '' OR (scheme = 'https' AND port = '443') OR (scheme = 'http' AND port = '80')
         |       THEN '' ELSE ':' || port END ||
         |  CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
         |  CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url
         | FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(q0, '&'),
         |    x -> x <> '' AND NOT regexp_matches(x, '$UrlTrackRe'))), '&') AS qs FROM p94)),
         |${pslDomainCtesSql("c94", "ps94")},
         |d94 AS (SELECT c.doc_id, c.q, c.canon_url, p.domain
         | FROM c94 c JOIN ps94dom p ON p.host = c.host),
         |pu94 AS (SELECT domain, canon_url, CAST(count(*) AS BIGINT) AS n,
         |  SUM(CAST(q AS DECIMAL(18,6))) AS qs FROM d94 GROUP BY domain, canon_url),
         |ag94 AS (SELECT domain, CAST(SUM(n) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(SUM(qs) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS mean_quality FROM pu94 GROUP BY domain)
         |SELECT a.domain, n_docs, n_urls, mean_quality,
         | round(1.0 - CAST(n_urls AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
         | CAST(b.domain IS NOT NULL AS INT) AS blocked,
         | CAST(b.domain IS NULL AND mean_quality >= $DomainQualityFloor AS INT) AS keep
         |FROM ag94 a LEFT JOIN (VALUES ${BadDomains.map(d => s"('$d')").mkString(", ")}) b(domain) ON b.domain = a.domain
         |ORDER BY a.domain""".stripMargin,
    "x95_fuzzy_decontamination" ->
      // identical split/plants; both corpora fingerprinted via the SAME
      // fast gram + winnow generators as x85's oracle; bb and bench are
      // MATERIALIZED (DuckDB inlines CTEs — bench is referenced by the
      // fingerprint chain AND the class join, and bb by all three split
      // slices, so without the hint the per-char full-text polyHash in
      // bb would re-run ~7x)
      s"""WITH $decontBaseCtesSql,
         |${fastGramCtesSql("tr", "doc_id", "t95", DupNgramN)},
         |${winnowSelCtesSql("doc_id", "t95", WinnowW)},
         |trfp AS (SELECT DISTINCT gh FROM t95sel),
         |${fastGramCtesSql("bench", "doc_id", "b95", DupNgramN)},
         |${winnowSelCtesSql("doc_id", "b95", WinnowW)},
         |bfp AS (SELECT DISTINCT doc_id, gh FROM b95sel),
         |st AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         |  CAST(SUM(CASE WHEN t.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         | FROM bfp b LEFT JOIN trfp t ON t.gh = b.gh GROUP BY b.doc_id),
         |ct AS (SELECT doc_id, n_fp, n_hit,
         |  round(CAST(n_hit AS DOUBLE) / CAST(n_fp AS DOUBLE), 6) AS containment FROM st)
         |SELECT c.doc_id, m.class, n_fp, n_hit, containment,
         | CAST(containment >= $FpContainFloor AS INT) AS contaminated
         |FROM ct c JOIN bench m ON m.doc_id = c.doc_id ORDER BY c.doc_id""".stripMargin,
    "x96_contamination_spans" ->
      // same base CTEs + fingerprint generators as x95, with train_id
      // and pos kept; df cap via HAVING; gaps-and-islands with the same
      // lag/sum windows as the engine
      s"""WITH $decontBaseCtesSql,
         |${fastGramCtesSql("tr", "doc_id", "t96", DupNgramN)},
         |${winnowSelCtesSql("doc_id", "t96", WinnowW)},
         |trfp0 AS (SELECT DISTINCT doc_id AS train_id, gh FROM t96sel),
         |rgh AS (SELECT gh FROM trfp0 GROUP BY gh HAVING count(*) <= $GhTrainDfCap),
         |trfp AS (SELECT t.train_id, t.gh FROM trfp0 t JOIN rgh r ON r.gh = t.gh),
         |${fastGramCtesSql("bench", "doc_id", "b96", DupNgramN)},
         |${winnowSelCtesSql("doc_id", "b96", WinnowW)},
         |bfp AS (SELECT DISTINCT doc_id, pos, gh FROM b96sel),
         |m96 AS (SELECT DISTINCT b.doc_id, t.train_id, b.pos
         | FROM bfp b JOIN trfp t ON t.gh = b.gh),
         |i96 AS (SELECT doc_id, train_id, pos,
         |  SUM(CASE WHEN prev IS NOT NULL AND pos - prev > $SpanMergeGap THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id, train_id ORDER BY pos) AS island
         | FROM (SELECT *, lag(pos) OVER (PARTITION BY doc_id, train_id ORDER BY pos) AS prev FROM m96)),
         |sp96 AS (SELECT doc_id, train_id,
         |  CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + ${DupNgramN - 1} AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_fp
         | FROM i96 GROUP BY doc_id, train_id, island)
         |SELECT doc_id, train_id, span_start, span_end,
         | span_end - span_start + 1 AS span_tokens, n_fp
         |FROM sp96 WHERE n_fp >= $SpanMinFp
         |ORDER BY doc_id, train_id, span_start""".stripMargin,
    "x97_epoch_mix_materialize" ->
      // x93's waterfall CTEs verbatim + x69's per-source-sort ranking
      // mirror; the u-slice filter runs in the subquery so the repeat
      // division never sees a u = 0 source
      s"""WITH ${cappedMixCtesSql(CapMixRounds)},
         |d97 AS (SELECT doc_id, source, ${polySql("'mix#' || text")} AS h FROM documents),
         |r97 AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS pick_rank FROM d97),
         |m97 AS (SELECT r.doc_id, r.source, r.pick_rank,
         |  CAST(a.alloc // a.u + CASE WHEN r.pick_rank <= a.alloc % a.u THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
         | FROM r97 r JOIN allc a USING (source) WHERE r.pick_rank <= a.u)
         |SELECT doc_id, source, pick_rank, n_repeats
         |FROM m97 WHERE n_repeats > 0 ORDER BY doc_id""".stripMargin,
    "x98_decontamination_scrub" ->
      // train swept against the bench fingerprint set (no pair key),
      // x96's islands partitioned by doc alone, token marking via a
      // doc-keyed join with a BETWEEN residual (spans never overlap:
      // islands sit > mergeGap >= n apart), scrubbed text rebuilt with
      // ORDER BY tpos inside the aggregate; string_agg skips the
      // removed (NULL) tokens and coalesces to '' for a fully-removed
      // doc, mirroring array_join over an empty array
      s"""WITH $decontBaseCtesSql,
         |${scrubSpanCtesSql("98")},
         |tk98 AS (SELECT doc_id, u.tpos, u.tok FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
         |    i -> struct_pack(tpos := CAST(i - 1 AS BIGINT), tok := t[i]))) AS u
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM tr))),
         |mk98 AS (SELECT k.doc_id, k.tpos, k.tok, s.s
         | FROM tk98 k LEFT JOIN sp98 s ON s.doc_id = k.doc_id AND k.tpos BETWEEN s.s AND s.e)
         |SELECT m.doc_id, ns.n_spans, CAST(count(*) AS BIGINT) AS n_tokens,
         | CAST(SUM(CASE WHEN m.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tokens_removed,
         | coalesce(string_agg(CASE WHEN m.s IS NULL THEN m.tok END, ' ' ORDER BY m.tpos), '') AS clean_text
         |FROM mk98 m JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM sp98 GROUP BY doc_id) ns ON ns.doc_id = m.doc_id
         |GROUP BY m.doc_id, ns.n_spans ORDER BY m.doc_id""".stripMargin,
    "x99_epoch_shard_plan" ->
      // x97's chain + per-repeat unnest + the same polynomial hash over
      // 'doc_id#epoch' folded into PlanShards
      s"""WITH ${cappedMixCtesSql(CapMixRounds)},
         |d97 AS (SELECT doc_id, source, ${polySql("'mix#' || text")} AS h FROM documents),
         |r97 AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS pick_rank FROM d97),
         |m97 AS (SELECT r.doc_id, r.source,
         |  CAST(a.alloc // a.u + CASE WHEN r.pick_rank <= a.alloc % a.u THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
         | FROM r97 r JOIN allc a USING (source) WHERE r.pick_rank <= a.u),
         |e99 AS (SELECT doc_id, source, unnest(range(0, n_repeats)) AS epoch
         | FROM m97 WHERE n_repeats > 0)
         |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch,
         | CAST(${polySql("CAST(doc_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)")} % $PlanShards AS INT) AS shard
         |FROM e99 ORDER BY doc_id, epoch""".stripMargin,
    "x100_byte_scrub" ->
      // x98's sweep (shared generator), then the byte-preserving rebuild:
      // segment the implicated ORIGINAL text into ws/token runs, mark a
      // segment removed iff its governing token (nearest at-or-before,
      // tcnt - 1) falls in a span — one rule covers span tokens, their
      // interior whitespace, and the seam whitespace after the last
      // token; leading whitespace (tcnt = 0) never matches. string_agg
      // over kept segments with '' separator = the engine's array_join.
      s"""WITH $decontBaseCtesSql,
         |${scrubSpanCtesSql("100")},
         |${segCtesSql("100")},
         |mk100 AS (SELECT g.doc_id, g.si, g.seg, g.is_tok, g.tcnt, s.s
         | FROM sg100 g LEFT JOIN sp100 s ON s.doc_id = g.doc_id
         |   AND g.tcnt >= 1 AND g.tcnt - 1 BETWEEN s.s AND s.e)
         |SELECT m.doc_id, ns.n_spans, CAST(max(m.tcnt) AS BIGINT) AS n_tokens,
         | CAST(SUM(CASE WHEN m.s IS NOT NULL AND m.is_tok = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tokens_removed,
         | CAST(SUM(CASE WHEN m.s IS NOT NULL THEN length(m.seg) ELSE 0 END) AS BIGINT) AS chars_removed,
         | coalesce(string_agg(CASE WHEN m.s IS NULL THEN m.seg END, '' ORDER BY m.si), '') AS clean_text
         |FROM mk100 m JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM sp100 GROUP BY doc_id) ns ON ns.doc_id = m.doc_id
         |GROUP BY m.doc_id, ns.n_spans ORDER BY m.doc_id""".stripMargin,
    "x101_span_offsets" ->
      // same sweep + segment view; per-span char offsets via two
      // id+token-index joins against the token segments, and span_text
      // cut from the ORIGINAL text so the compare checks the offsets
      // against actual bytes, not just offset arithmetic
      s"""WITH $decontBaseCtesSql,
         |${scrubSpanCtesSql("101")},
         |${segCtesSql("101")},
         |ts101 AS (SELECT doc_id, tcnt - 1 AS tix, coff, length(seg) AS len
         | FROM sg101 WHERE is_tok = 1)
         |SELECT s.doc_id, s.s, s.e, CAST(a.coff AS BIGINT) AS char_start,
         | CAST(b.coff + b.len - 1 AS BIGINT) AS char_end,
         | substr(t.text, CAST(a.coff + 1 AS INT), CAST(b.coff + b.len - a.coff AS INT)) AS span_text
         |FROM sp101 s
         |JOIN ts101 a ON a.doc_id = s.doc_id AND a.tix = s.s
         |JOIN ts101 b ON b.doc_id = s.doc_id AND b.tix = s.e
         |JOIN imp101 t ON t.doc_id = s.doc_id
         |ORDER BY s.doc_id, s.s""".stripMargin,
    "x102_ann_recall" ->
      // identical trained IVF index to x13/x25 (the unrolled-k-means
      // trick); truth = x08's brute-force rank arithmetic at depth k;
      // query cells ranked once, the nprobe dimension joined in via
      // arnk <= nprobe; hits counted per (nprobe, qid) and left-joined
      // onto the full universe so recall-0 queries keep their row
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < $IvfCells),
         |${ivfAssignSql("c0", "a1")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfAssignSql("c2", "assigned")},
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tp) WHERE rnk <= $RecallK),
         |qc AS (SELECT qid, qv, cell_id, arnk FROM (
         | SELECT q.qid, q.qv, c2.cell_id,
         |  row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(q.qv, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM q CROSS JOIN c2) WHERE arnk <= 2),
         |nps AS (SELECT unnest([1, 2]) AS nprobe),
         |cand AS (SELECT n.nprobe, qc.qid, a.vec_id,
         |  round(list_cosine_similarity(qc.qv, a.v), 6) AS cos
         | FROM qc JOIN nps n ON qc.arnk <= n.nprobe
         | JOIN assigned a ON a.cell_id = qc.cell_id AND a.vec_id <> qc.qid),
         |ak AS (SELECT nprobe, qid, vec_id FROM (
         |  SELECT nprobe, qid, vec_id,
         |   row_number() OVER (PARTITION BY nprobe, qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM cand) WHERE rnk <= $RecallK),
         |h AS (SELECT nprobe, qid, CAST(count(*) AS BIGINT) AS n_hit
         | FROM ak JOIN truth USING (qid, vec_id) GROUP BY nprobe, qid)
         |SELECT CAST(n.nprobe AS BIGINT) AS nprobe, q.qid,
         | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / $RecallK.0, 4) AS recall
         |FROM q CROSS JOIN nps n
         |LEFT JOIN h ON h.nprobe = n.nprobe AND h.qid = q.qid
         |ORDER BY 1, 2""".stripMargin,
    "x103_minhash_calibration" ->
      // x06's candidate machinery verbatim (sig, bands, df cap), then per
      // pair: matching components counted as K CASE sums (the SQL mirror
      // of the engine's K codegen'd comparisons), estimate = m/K, exact
      // Jaccard from the full shingle lists — no threshold: calibration
      // wants the whole candidate set, not just the passers
      s"""WITH $PlantedDocsSql,
         |$ShinglesSql,
         |hh AS (SELECT doc_id, s, list_transform(s, x -> ${polySql("x")}) AS hs FROM sh),
         |sig AS (SELECT doc_id, s, ${(0 until Dedup.MinHashK).map(i => minhashSql(i, "hs") + s" AS mh$i").mkString(",\n ")} FROM hh),
         |banded AS (SELECT doc_id, unnest([${(0 until Dedup.LshBands).map(b => s"'$b:' || mh${2 * b} || ':' || mh${2 * b + 1}").mkString(", ")}]) AS band FROM sig),
         |cool AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |capped AS (SELECT banded.* FROM banded JOIN cool USING (band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         | FROM capped a JOIN capped b ON a.band = b.band AND a.doc_id < b.doc_id),
         |pr AS (SELECT id1, id2,
         |  (${(0 until Dedup.MinHashK).map(i => s"CASE WHEN s1.mh$i = s2.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) AS m,
         |  CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) AS inter,
         |  CAST(len(s1.s) + len(s2.s) AS DOUBLE) AS szsum
         | FROM cand JOIN sig s1 ON s1.doc_id = id1 JOIN sig s2 ON s2.doc_id = id2)
         |SELECT id1, id2,
         | CAST(m AS DOUBLE) / ${Dedup.MinHashK}.0 AS est_j,
         | inter / (szsum - inter) AS jac,
         | round(abs(CAST(m AS DOUBLE) / ${Dedup.MinHashK}.0 - inter / (szsum - inter)), 6) AS abs_err
         |FROM pr ORDER BY id1, id2""".stripMargin,
    "x104_soft_dedup_weights" ->
      // same cluster CTEs + quality/argmax tail as x66, plus the cluster
      // size aggregate; the rep's token count is hq's ws re-joined by id
      s"""WITH $DupClusterCtesSql,
         |hq AS (SELECT doc_id,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM corpus),
         |qq AS (SELECT doc_id, $QualitySql AS quality FROM hq),
         |allq AS (SELECT c.doc_id, CAST(coalesce(l.label, c.doc_id) AS BIGINT) AS cluster, q.quality
         | FROM corpus c LEFT JOIN lab4 l ON l.id = c.doc_id JOIN qq q ON q.doc_id = c.doc_id),
         |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS weight FROM allq GROUP BY cluster),
         |reps AS (SELECT cluster, doc_id AS rep_id FROM (
         |  SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn FROM allq)
         | WHERE rn = 1)
         |SELECT r.rep_id, z.weight, h.ws AS n_tokens, z.weight * h.ws AS weighted_tokens
         |FROM reps r JOIN sizes z USING (cluster) JOIN hq h ON h.doc_id = r.rep_id
         |ORDER BY r.rep_id""".stripMargin,
    "x105_rrf_fusion" ->
      // lexical arm = x31's BM25 CTEs verbatim (depth 50); semantic arm
      // = exact cosine to vec 0 (depth 50); both ranked on (score DESC,
      // doc_id), fused full-outer with 1/(k + rank) contributions
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM documents),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         | FROM (SELECT doc_id, unnest(t) AS tok FROM tk)
         | WHERE tok IN (${Bm25Terms.map(w => s"'$w'").mkString(", ")}) GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |c AS (SELECT tf.doc_id,
         |  (ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |   * ((CAST(tf AS DOUBLE) * ${Bm25K1 + 1.0})
         |      / (CAST(tf AS DOUBLE) + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
         | FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN tot),
         |lexs AS (SELECT doc_id, round(CAST(SUM(CAST(contrib AS DECIMAL(18,8))) AS DOUBLE), 6) AS score
         | FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $RrfDepth),
         |lex AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank FROM lexs),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
         |sems AS (SELECT vec_id AS doc_id, round(list_cosine_similarity(q, v), 6) AS cos
         | FROM e CROSS JOIN qv WHERE vec_id <> 0 ORDER BY cos DESC, doc_id LIMIT $RrfDepth),
         |sem AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS sem_rank FROM sems)
         |SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
         | round(coalesce(1.0 / ($RrfK + lex_rank), 0.0)
         |      + coalesce(1.0 / ($RrfK + sem_rank), 0.0), 6) AS rrf
         |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "x106_ann_recall_prod" ->
      // the production profile: cells = ceil(sqrt(N)) seeded and trained
      // by the same unrolled k-means as x102, corpus SPILLED into its 2
      // nearest cells for serving (training assignments stay arnk = 1),
      // query cells ranked once to the max probe depth, the nprobe
      // dimension joined in via arnk <= nprobe; per-(nprobe, qid)
      // candidate count rides as the cost axis, and the full universe
      // left-join keeps recall-0 queries visible
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cl AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS cells,
         |  greatest(1, CAST(count(*) AS BIGINT) // (50 * CAST(ceil(sqrt(count(*))) AS BIGINT))) AS tmod FROM e),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < (SELECT cells FROM cl)),
         |es AS (SELECT vec_id, v FROM e WHERE vec_id % (SELECT tmod FROM cl) = 0),
         |${ivfAssignSql("c0", "a1", "es")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2", "es")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfSpillAssignSql("c2", "assigned", ProdSpill)},
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tp) WHERE rnk <= $RecallK),
         |qc AS (SELECT qid, qv, cell_id, arnk FROM (
         | SELECT q.qid, q.qv, c2.cell_id,
         |  row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(q.qv, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM q CROSS JOIN c2) WHERE arnk <= ${ProdNprobes.max}),
         |nps AS (SELECT unnest([${ProdNprobes.mkString(", ")}]) AS nprobe),
         |cand AS (SELECT DISTINCT n.nprobe, qc.qid, a.vec_id,
         |  round(list_cosine_similarity(qc.qv, a.v), 6) AS cos
         | FROM qc JOIN nps n ON qc.arnk <= n.nprobe
         | JOIN assigned a ON a.cell_id = qc.cell_id AND a.vec_id <> qc.qid),
         |nc AS (SELECT nprobe, qid, CAST(count(*) AS BIGINT) AS n_cands
         | FROM cand GROUP BY nprobe, qid),
         |ak AS (SELECT nprobe, qid, vec_id FROM (
         |  SELECT nprobe, qid, vec_id,
         |   row_number() OVER (PARTITION BY nprobe, qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM cand) WHERE rnk <= $RecallK),
         |h AS (SELECT nprobe, qid, CAST(count(*) AS BIGINT) AS n_hit
         | FROM ak JOIN truth USING (qid, vec_id) GROUP BY nprobe, qid)
         |SELECT CAST(n.nprobe AS BIGINT) AS nprobe, q.qid,
         | CAST(coalesce(nc.n_cands, 0) AS BIGINT) AS n_cands,
         | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / $RecallK.0, 4) AS recall
         |FROM q CROSS JOIN nps n
         |LEFT JOIN nc ON nc.nprobe = n.nprobe AND nc.qid = q.qid
         |LEFT JOIN h ON h.nprobe = n.nprobe AND h.qid = q.qid
         |ORDER BY 1, 2""".stripMargin,
    "x107_rrf_multiquery" ->
      // per-query BM25 over each sample doc's 8 rarest distinct tokens
      // (df asc, token asc), postings sliced to the selected terms, x31's
      // decimal contribution sum; semantic arm = exact cosine from the
      // query embedding; both arms per-qid depth-50, fused with
      // 1/(60 + rank), fused top-10 per query
      s"""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t FROM documents),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
         |dt AS (SELECT doc_id, unnest(t) AS tok FROM tk),
         |dfx AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM dt GROUP BY tok),
         |qt AS (SELECT qid, tok, df FROM (
         |  SELECT d.doc_id AS qid, d.tok, f.df,
         |   row_number() OVER (PARTITION BY d.doc_id ORDER BY f.df, d.tok) AS trnk
         |  FROM (SELECT DISTINCT doc_id, tok FROM dt WHERE doc_id < $RrfQ) d
         |  JOIN dfx f USING (tok)) WHERE trnk <= $RrfQTerms),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM dt
         | WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY doc_id, tok),
         |c AS (SELECT q.qid, tf.doc_id,
         |  (ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5))
         |   * ((CAST(tf AS DOUBLE) * ${Bm25K1 + 1.0})
         |      / (CAST(tf AS DOUBLE) + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
         | FROM tf JOIN qt q USING (tok) JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN tot
         | WHERE tf.doc_id <> q.qid),
         |ls AS (SELECT qid, doc_id, round(CAST(SUM(CAST(contrib AS DECIMAL(18,8))) AS DOUBLE), 6) AS score
         | FROM c GROUP BY qid, doc_id),
         |lex AS (SELECT qid, doc_id, lex_rank FROM (
         |  SELECT qid, doc_id,
         |   CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
         |  FROM ls) WHERE lex_rank <= $RrfDepth),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RrfQ),
         |sc AS (SELECT q.qid, e.vec_id AS doc_id, round(list_cosine_similarity(q.qv, e.v), 6) AS cos
         | FROM e CROSS JOIN qv q WHERE e.vec_id <> q.qid),
         |sem AS (SELECT qid, doc_id, sem_rank FROM (
         |  SELECT qid, doc_id,
         |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS BIGINT) AS sem_rank
         |  FROM sc) WHERE sem_rank <= $RrfDepth),
         |fu AS (SELECT coalesce(lex.qid, sem.qid) AS qid,
         |  coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
         |  round(coalesce(1.0 / ($RrfK + lex_rank), 0.0)
         |       + coalesce(1.0 / ($RrfK + sem_rank), 0.0), 6) AS rrf
         | FROM lex FULL OUTER JOIN sem ON lex.qid = sem.qid AND lex.doc_id = sem.doc_id)
         |SELECT qid, doc_id, lex_rank, sem_rank, rrf, frnk FROM (
         | SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS frnk
         | FROM fu) WHERE frnk <= $RrfOut
         |ORDER BY qid, frnk""".stripMargin,
    "x108_calibrated_widths" ->
      // x103's candidate machinery (default 8-component banding, df cap)
      // widened to a 16-component signature; per k in {4,8,16} the error
      // table aggregates over the SAME pair set; p99 is the discrete rank
      // statistic at row ceil(0.99 n) of (abs_err, id1, id2); chosen_k =
      // narrowest width meeting the p99 budget, else widest
      s"""WITH $PlantedDocsSql,
         |$ShinglesSql,
         |hh AS (SELECT doc_id, s, list_transform(s, x -> ${polySql("x")}) AS hs FROM sh),
         |sig AS (SELECT doc_id, s, ${(0 until CalibKs.max).map(i => minhashSql(i, "hs") + s" AS mh$i").mkString(",\n ")} FROM hh),
         |nz AS (SELECT * FROM sig WHERE mh0 IS NOT NULL),
         |banded AS (SELECT doc_id, unnest([${(0 until Dedup.LshBands).map(b => s"'$b:' || mh${2 * b} || ':' || mh${2 * b + 1}").mkString(", ")}]) AS band FROM nz),
         |cool AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= ${Dedup.ShingleDfCap}),
         |capped AS (SELECT banded.* FROM banded JOIN cool USING (band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         | FROM capped a JOIN capped b ON a.band = b.band AND a.doc_id < b.doc_id),
         |pr AS (SELECT id1, id2,
         |  ${CalibKs.map(k => "(" + (0 until k).map(i => s"CASE WHEN s1.mh$i = s2.mh$i THEN 1 ELSE 0 END").mkString(" + ") + s") AS m$k").mkString(",\n  ")},
         |  CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) AS inter,
         |  CAST(len(s1.s) + len(s2.s) AS DOUBLE) AS szsum
         | FROM cand JOIN nz s1 ON s1.doc_id = id1 JOIN nz s2 ON s2.doc_id = id2),
         |pk AS (${CalibKs.map(k =>
           s"SELECT CAST($k AS BIGINT) AS k, id1, id2, round(abs(CAST(m$k AS DOUBLE) / $k.0 - inter / (szsum - inter)), 6) AS abs_err FROM pr")
           .mkString("\n UNION ALL ")}),
         |st AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(SUM(CAST(abs_err AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS mean_err
         | FROM pk GROUP BY k),
         |rk AS (SELECT k, abs_err,
         |  row_number() OVER (PARTITION BY k ORDER BY abs_err, id1, id2) AS rn FROM pk),
         |p9 AS (SELECT rk.k, rk.abs_err AS p99_err FROM rk JOIN st USING (k)
         | WHERE rn = CAST(ceil(0.99 * n_pairs) AS BIGINT)),
         |js AS (SELECT st.k, n_pairs, mean_err, p99_err FROM st JOIN p9 USING (k)),
         |ch AS (SELECT CAST(coalesce(min(CASE WHEN p99_err <= ${Dedup.CalibTargetP99} THEN k END), max(k)) AS BIGINT) AS chosen_k FROM js)
         |SELECT k, n_pairs, mean_err, p99_err, chosen_k
         |FROM js CROSS JOIN ch ORDER BY k""".stripMargin,
    "x109_index_feasibility" ->
      // x08's brute rank arithmetic at depth 10; per-query top-1 and
      // decimal-exact mean-of-10; the median top-1 is the discrete rank
      // statistic at row ceil(0.5 n) of (top1_cos, qid); the isotropic
      // baseline is the closed-form sqrt(2 ln N / d) random-match line
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |tk AS (SELECT qid, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk FROM tp),
         |pq AS (SELECT qid, max(CASE WHEN rnk = 1 THEN cos END) AS top1_cos,
         |  round(CAST(SUM(CAST(cos AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS mean10_cos
         | FROM tk WHERE rnk <= $RecallK GROUP BY qid),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM e),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM pq),
         |rkd AS (SELECT top1_cos, row_number() OVER (ORDER BY top1_cos, qid) AS rn FROM pq),
         |md AS (SELECT top1_cos AS median_top1 FROM rkd
         | CROSS JOIN nq WHERE rn = CAST(ceil(0.5 * n_q) AS BIGINT)),
         |p10 AS (SELECT top1_cos AS p10_top1 FROM rkd
         | CROSS JOIN nq WHERE rn = CAST(ceil(0.1 * n_q) AS BIGINT))
         |SELECT qid, top1_cos, mean10_cos, n_corpus,
         | round(sqrt(2.0 * ln(CAST(n_corpus AS DOUBLE)) / $EmbDim.0), 6) AS iso_baseline,
         | median_top1, p10_top1,
         | CAST(median_top1 >= round(sqrt(2.0 * ln(CAST(n_corpus AS DOUBLE)) / $EmbDim.0), 6) + ${Similarity.FeasibilityExcess} AS INT) AS indexable,
         | CAST(p10_top1 >= round(sqrt(2.0 * ln(CAST(n_corpus AS DOUBLE)) / $EmbDim.0), 6) + ${Similarity.FeasibilityExcess} AS INT) AS tail_indexable
         |FROM pq CROSS JOIN nn CROSS JOIN md CROSS JOIN p10 ORDER BY qid""".stripMargin,
    "x110_pq_rerank_recall" ->
      // x28's per-subspace unrolled k-means at the x110 geometry (16
      // subspaces x 16 codewords — the shared pqOracleCtesSql, identical
      // in x112), then: PQ-approx scores against the reconstructions,
      // per-depth shortlist via the rank join, exact re-rank of the
      // shortlist against the ORIGINAL vectors, recall vs the
      // x102-style brute truth; full universe left-joined
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$pqOracleCtesSql,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tp) WHERE rnk <= $RecallK),
         |p AS (SELECT qid, r.vec_id, round(list_cosine_similarity(qv, rv), 6) AS acos
         | FROM recon r, q WHERE r.vec_id <> qid),
         |pr AS (SELECT qid, vec_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY acos DESC, vec_id) AS prk FROM p),
         |rr AS (SELECT unnest([${RerankRs.mkString(", ")}]) AS rerank_r),
         |sl AS (SELECT rr.rerank_r, pr.qid, pr.vec_id FROM pr JOIN rr ON pr.prk <= rr.rerank_r),
         |ex AS (SELECT sl.rerank_r, sl.qid, sl.vec_id,
         |  round(list_cosine_similarity(q.qv, ev.v), 6) AS ecos
         | FROM sl JOIN e ev ON ev.vec_id = sl.vec_id JOIN q ON q.qid = sl.qid),
         |fk AS (SELECT rerank_r, qid, vec_id FROM (
         |  SELECT rerank_r, qid, vec_id,
         |   row_number() OVER (PARTITION BY rerank_r, qid ORDER BY ecos DESC, vec_id) AS rnk
         |  FROM ex) WHERE rnk <= $RecallK),
         |h AS (SELECT rerank_r, qid, CAST(count(*) AS BIGINT) AS n_hit
         | FROM fk JOIN truth USING (qid, vec_id) GROUP BY rerank_r, qid)
         |SELECT CAST(rr.rerank_r AS BIGINT) AS rerank_r, q.qid,
         | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / $RecallK.0, 4) AS recall
         |FROM q CROSS JOIN rr
         |LEFT JOIN h ON h.rerank_r = rr.rerank_r AND h.qid = q.qid
         |ORDER BY 1, 2""".stripMargin,
    "x111_weighted_epoch_mix" ->
      // x104's cluster/sizes/reps CTEs verbatim, then the hierarchical
      // integer apportionment: weight strata with HUGEINT largest-
      // remainder on mass (the engine's decimal(38,0) mirror; tie-break
      // on the stringified weight = the engine's source key), and the
      // x97 div/mod spread by per-stratum pick rank over the same
      // polynomial hash (the shared weightedPicksCtesSql, identical in
      // x113)
      s"""WITH $weightedPicksCtesSql
         |SELECT rep_id, weight, pick_rank, n_repeats
         |FROM fin WHERE n_repeats > 0 ORDER BY rep_id""".stripMargin,
    "x112_ivfpq_rerank" ->
      // x106's IVF chain verbatim (sqrt cells, sampled train, spill
      // serve assignment) + x110's PQ chain verbatim (the shared
      // pqOracleCtesSql), composed: candidates from the probed-cell
      // equi-join are scored against the PQ reconstructions ONLY, the
      // top R survivors exact-re-ranked against the original vectors;
      // per-query DISTINCT candidate count rides as the cost axis and
      // the full (R x sample) universe stays left-joined
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cl AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS cells,
         |  greatest(1, CAST(count(*) AS BIGINT) // (50 * CAST(ceil(sqrt(count(*))) AS BIGINT))) AS tmod FROM e),
         |c0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < (SELECT cells FROM cl)),
         |es AS (SELECT vec_id, v FROM e WHERE vec_id % (SELECT tmod FROM cl) = 0),
         |${ivfAssignSql("c0", "a1", "es")},
         |${ivfUpdateSql("a1", "c1")},
         |${ivfAssignSql("c1", "a2", "es")},
         |${ivfUpdateSql("a2", "c2")},
         |${ivfSpillAssignSql("c2", "assigned", ProdSpill)},
         |$pqOracleCtesSql,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tp) WHERE rnk <= $RecallK),
         |qc AS (SELECT qid, qv, cell_id FROM (
         | SELECT q.qid, q.qv, c2.cell_id,
         |  row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(q.qv, c2.cv), 6) DESC, c2.cell_id) AS arnk
         | FROM q CROSS JOIN c2) WHERE arnk <= ${ProdNprobes.max}),
         |cand AS (SELECT DISTINCT qc.qid, a.vec_id
         | FROM qc JOIN assigned a ON a.cell_id = qc.cell_id AND a.vec_id <> qc.qid),
         |nc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cands FROM cand GROUP BY qid),
         |ap AS (SELECT c.qid, c.vec_id, round(list_cosine_similarity(q.qv, r.rv), 6) AS acos
         | FROM cand c JOIN recon r ON r.vec_id = c.vec_id JOIN q ON q.qid = c.qid),
         |pr AS (SELECT qid, vec_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY acos DESC, vec_id) AS prk FROM ap),
         |rr AS (SELECT unnest([${RerankRs.mkString(", ")}]) AS rerank_r),
         |sl AS (SELECT rr.rerank_r, pr.qid, pr.vec_id FROM pr JOIN rr ON pr.prk <= rr.rerank_r),
         |ex AS (SELECT sl.rerank_r, sl.qid, sl.vec_id,
         |  round(list_cosine_similarity(q.qv, ev.v), 6) AS ecos
         | FROM sl JOIN e ev ON ev.vec_id = sl.vec_id JOIN q ON q.qid = sl.qid),
         |fk AS (SELECT rerank_r, qid, vec_id FROM (
         |  SELECT rerank_r, qid, vec_id,
         |   row_number() OVER (PARTITION BY rerank_r, qid ORDER BY ecos DESC, vec_id) AS rnk
         |  FROM ex) WHERE rnk <= $RecallK),
         |h AS (SELECT rerank_r, qid, CAST(count(*) AS BIGINT) AS n_hit
         | FROM fk JOIN truth USING (qid, vec_id) GROUP BY rerank_r, qid)
         |SELECT CAST(rr.rerank_r AS BIGINT) AS rerank_r, q.qid,
         | CAST(coalesce(nc.n_cands, 0) AS BIGINT) AS n_cands,
         | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / $RecallK.0, 4) AS recall
         |FROM q CROSS JOIN rr
         |LEFT JOIN nc ON nc.qid = q.qid
         |LEFT JOIN h ON h.rerank_r = rr.rerank_r AND h.qid = q.qid
         |ORDER BY 1, 2""".stripMargin,
    "x113_weighted_shard_plan" ->
      // x111's chain (shared CTEs) + x99's tail: per-repeat unnest and
      // the same polynomial hash over 'rep_id#epoch' folded into
      // PlanShards
      s"""WITH $weightedPicksCtesSql,
         |e113 AS (SELECT rep_id, weight, unnest(range(0, n_repeats)) AS epoch
         | FROM fin WHERE n_repeats > 0)
         |SELECT rep_id, weight, CAST(epoch AS BIGINT) AS epoch,
         | CAST(${polySql("CAST(rep_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)")} % $PlanShards AS INT) AS shard
         |FROM e113 ORDER BY rep_id, epoch""".stripMargin,
    "x114_stale_index_recall" ->
      // two x106 chains over the same corpus: FRESH = x106's verbatim
      // (sqrt cells, sampled train es, spill serve assignment); STALE =
      // seeds and training both restricted to the pre-arrival base
      // (vec_id % 5 <> 0, trained on the FULL base — the engine passes
      // train = None for the stale build), cells sized for the full
      // corpus, and the full corpus (arrivals included) spill-assigned
      // into the stale cells. Same per-(arm, qid) recall tail as x106.
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cl AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS cells,
         |  greatest(1, CAST(count(*) AS BIGINT) // (50 * CAST(ceil(sqrt(count(*))) AS BIGINT))) AS tmod FROM e),
         |eb AS (SELECT vec_id, v FROM e WHERE vec_id % $StaleArrivalMod <> 0),
         |fc0 AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id < (SELECT cells FROM cl)),
         |es AS (SELECT vec_id, v FROM e WHERE vec_id % (SELECT tmod FROM cl) = 0),
         |${ivfAssignSql("fc0", "fa1", "es")},
         |${ivfUpdateSql("fa1", "fc1")},
         |${ivfAssignSql("fc1", "fa2", "es")},
         |${ivfUpdateSql("fa2", "fc2")},
         |${ivfSpillAssignSql("fc2", "fassigned", ProdSpill)},
         |sc0 AS (SELECT vec_id AS cell_id, v AS cv FROM eb WHERE vec_id < (SELECT cells FROM cl)),
         |${ivfAssignSql("sc0", "sa1", "eb")},
         |${ivfUpdateSql("sa1", "sc1")},
         |${ivfAssignSql("sc1", "sa2", "eb")},
         |${ivfUpdateSql("sa2", "sc2")},
         |${ivfSpillAssignSql("sc2", "sassigned", ProdSpill)},
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tp) WHERE rnk <= $RecallK),
         |fqc AS (SELECT qid, qv, cell_id FROM (
         | SELECT q.qid, q.qv, fc2.cell_id,
         |  row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(q.qv, fc2.cv), 6) DESC, fc2.cell_id) AS arnk
         | FROM q CROSS JOIN fc2) WHERE arnk <= ${ProdNprobes.max}),
         |sqc AS (SELECT qid, qv, cell_id FROM (
         | SELECT q.qid, q.qv, sc2.cell_id,
         |  row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(q.qv, sc2.cv), 6) DESC, sc2.cell_id) AS arnk
         | FROM q CROSS JOIN sc2) WHERE arnk <= ${ProdNprobes.max}),
         |cand AS (
         | SELECT 'fresh' AS arm, c.qid, a.vec_id,
         |  round(list_cosine_similarity(c.qv, a.v), 6) AS cos
         | FROM fqc c JOIN fassigned a ON a.cell_id = c.cell_id AND a.vec_id <> c.qid
         | UNION ALL
         | SELECT 'stale' AS arm, c.qid, a.vec_id,
         |  round(list_cosine_similarity(c.qv, a.v), 6) AS cos
         | FROM sqc c JOIN sassigned a ON a.cell_id = c.cell_id AND a.vec_id <> c.qid),
         |cd AS (SELECT DISTINCT arm, qid, vec_id, cos FROM cand),
         |nc AS (SELECT arm, qid, CAST(count(*) AS BIGINT) AS n_cands FROM cd GROUP BY arm, qid),
         |ak AS (SELECT arm, qid, vec_id FROM (
         |  SELECT arm, qid, vec_id,
         |   row_number() OVER (PARTITION BY arm, qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM cd) WHERE rnk <= $RecallK),
         |h AS (SELECT arm, qid, CAST(count(*) AS BIGINT) AS n_hit
         | FROM ak JOIN truth USING (qid, vec_id) GROUP BY arm, qid),
         |arms AS (SELECT unnest(['fresh', 'stale']) AS arm)
         |SELECT a.arm, q.qid,
         | CAST(coalesce(nc.n_cands, 0) AS BIGINT) AS n_cands,
         | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / $RecallK.0, 4) AS recall
         |FROM q CROSS JOIN arms a
         |LEFT JOIN nc ON nc.arm = a.arm AND nc.qid = q.qid
         |LEFT JOIN h ON h.arm = a.arm AND h.qid = q.qid
         |ORDER BY 1, 2""".stripMargin,
    "x115_weighted_temperature_mix" ->
      // x104's cluster chain (same CTEs) aggregated to per-source
      // duplication-corrected token mass (each cluster once, at its
      // rep: weight * the rep's ws), then x63's exact-integer
      // temperature kernel over those masses (HUGEINT quotas, largest
      // remainder, source tie-break). Base ids are < 120, synthetic
      // copies offset by multiples of 100000 -> id % 100000 recovers
      // the source of every copy.
      s"""WITH $DupClusterCtesSql,
         |hq AS (SELECT doc_id,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM corpus),
         |qq AS (SELECT doc_id, $QualitySql AS quality FROM hq),
         |allq AS (SELECT c.doc_id, CAST(coalesce(l.label, c.doc_id) AS BIGINT) AS cluster, q.quality
         | FROM corpus c LEFT JOIN lab4 l ON l.id = c.doc_id JOIN qq q ON q.doc_id = c.doc_id),
         |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS weight FROM allq GROUP BY cluster),
         |reps AS (SELECT cluster, doc_id AS rep_id FROM (
         |  SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn FROM allq)
         | WHERE rn = 1),
         |wsrc AS (SELECT doc_id AS base_id, source FROM documents WHERE doc_id < 120),
         |wmass AS (SELECT s2.source, CAST(SUM(z.weight * h.ws) AS BIGINT) AS mass
         | FROM reps r JOIN sizes z USING (cluster) JOIN hq h ON h.doc_id = r.rep_id
         | JOIN wsrc s2 ON s2.base_id = r.rep_id % $DedupBaseSpan
         | GROUP BY s2.source),
         |wraw AS (SELECT s2.source, CAST(SUM(h.ws) AS BIGINT) AS raw_tokens
         | FROM hq h JOIN wsrc s2 ON s2.base_id = h.doc_id % $DedupBaseSpan
         | GROUP BY s2.source),
         |wmw AS (SELECT source, mass,
         |  CAST(floor(power(CAST(mass AS DOUBLE), $MixAlpha) * 1000000.0) AS BIGINT) AS w FROM wmass),
         |wmt AS (SELECT SUM(CAST(w AS HUGEINT)) AS tw FROM wmw),
         |wmq AS (SELECT source, mass, w,
         |  (CAST($MixBudget AS HUGEINT) * w) // tw AS base_q,
         |  (CAST($MixBudget AS HUGEINT) * w) % tw AS rem FROM wmw CROSS JOIN wmt),
         |wms AS (SELECT $MixBudget - SUM(base_q) AS short FROM wmq),
         |wmr AS (SELECT wmq.*, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM wmq),
         |wma AS (SELECT source, mass, w,
         |  CAST(base_q + CASE WHEN rk <= (SELECT short FROM wms) THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM wmr)
         |SELECT wma.source, wraw.raw_tokens, wma.mass, wma.w, wma.alloc
         |FROM wma JOIN wraw USING (source) ORDER BY source""".stripMargin,
    "x116_rebuild_trigger" ->
      // x114's stale-arm CTEs verbatim (base-trained 2-round k-means,
      // full-corpus spill assignment), query set = the RecallQ
      // lowest-id ARRIVALS, then the one-row summary + the rebuildDue
      // threshold arithmetic over the rounded audit columns (floor
      // 0.9, cap = 2x the sqrt-cell design fraction).
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cl AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(ceil(sqrt(count(*))) AS BIGINT) AS cells FROM e),
         |eb AS (SELECT vec_id, v FROM e WHERE vec_id % $StaleArrivalMod <> 0),
         |sc0 AS (SELECT vec_id AS cell_id, v AS cv FROM eb WHERE vec_id < (SELECT cells FROM cl)),
         |${ivfAssignSql("sc0", "sa1", "eb")},
         |${ivfUpdateSql("sa1", "sc1")},
         |${ivfAssignSql("sc1", "sa2", "eb")},
         |${ivfUpdateSql("sa2", "sc2")},
         |${ivfSpillAssignSql("sc2", "sassigned", ProdSpill)},
         |q AS (SELECT vec_id AS qid, v AS qv FROM e
         | WHERE vec_id % $StaleArrivalMod = 0 ORDER BY vec_id LIMIT $RecallQ),
         |tp AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos
         | FROM e, q WHERE vec_id <> qid),
         |truth AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tp) WHERE rnk <= $RecallK),
         |sqc AS (SELECT qid, qv, cell_id FROM (
         | SELECT q.qid, q.qv, sc2.cell_id,
         |  row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(q.qv, sc2.cv), 6) DESC, sc2.cell_id) AS arnk
         | FROM q CROSS JOIN sc2) WHERE arnk <= ${ProdNprobes.max}),
         |cd AS (SELECT DISTINCT c.qid, a.vec_id,
         |  round(list_cosine_similarity(c.qv, a.v), 6) AS cos
         | FROM sqc c JOIN sassigned a ON a.cell_id = c.cell_id AND a.vec_id <> c.qid),
         |nc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cands FROM cd GROUP BY qid),
         |ak AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |  FROM cd) WHERE rnk <= $RecallK),
         |h AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_hit
         | FROM ak JOIN truth USING (qid, vec_id) GROUP BY qid),
         |sm AS (SELECT
         |  (SELECT n FROM cl) AS n_corpus,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e WHERE vec_id % $StaleArrivalMod = 0) AS n_arrivals,
         |  (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_sample,
         |  (SELECT CAST(coalesce(SUM(n_hit), 0) AS BIGINT) FROM h) AS sum_hits,
         |  (SELECT CAST(coalesce(SUM(n_cands), 0) AS BIGINT) FROM nc) AS sum_cands),
         |sv AS (SELECT n_corpus, n_arrivals, n_sample, sum_hits, sum_cands,
         |  round(CAST(sum_hits AS DOUBLE) / ($RecallK.0 * n_sample), 4) AS recall_arrivals,
         |  round(CAST(sum_cands AS DOUBLE) / CAST(n_sample * n_corpus AS DOUBLE), 6) AS cand_fraction,
         |  round(${(ProdSpill * ProdNprobes.max).toDouble} / ceil(sqrt(CAST(n_corpus AS DOUBLE))), 6) AS design_fraction
         | FROM sm)
         |SELECT sv.*,
         | CAST(recall_arrivals < ${AnnModels.DefaultRecallFloor}
         |   OR cand_fraction > 2.0 * design_fraction AS INT) AS rebuild_due
         |FROM sv ORDER BY n_corpus""".stripMargin,
    "x117_ipf_mix_corrected" -> {
      // x104's cluster chain (x115's CTEs) aggregated to per-(lang,
      // source) duplication-corrected token mass; BOTH temperature
      // marginals run the exact HUGEINT kernel over those masses (the
      // generalized tempAlloc CTEs with SUM(mass) in place of count),
      // then the identical unrolled IPF rounds rake the mass cells —
      // x75's oracle discipline over the corrected surface.
      val rounds = (1 to IpfRounds)
        .map(r => ipfRoundSql(if (r == 1) "q0" else s"q${r - 1}", r)).mkString(",\n")
      s"""WITH $DupClusterCtesSql,
         |hq AS (SELECT doc_id,
         |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS pu,
         |  CAST(length(regexp_extract_all(lower(text), '$StopEn')) AS BIGINT) AS st
         | FROM corpus),
         |qq AS (SELECT doc_id, $QualitySql AS quality FROM hq),
         |allq AS (SELECT c.doc_id, CAST(coalesce(l.label, c.doc_id) AS BIGINT) AS cluster, q.quality
         | FROM corpus c LEFT JOIN lab4 l ON l.id = c.doc_id JOIN qq q ON q.doc_id = c.doc_id),
         |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS weight FROM allq GROUP BY cluster),
         |reps AS (SELECT cluster, doc_id AS rep_id FROM (
         |  SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn FROM allq)
         | WHERE rn = 1),
         |dms AS (SELECT doc_id AS base_id, lang, source FROM documents WHERE doc_id < 120),
         |cm AS MATERIALIZED (SELECT d.lang, d.source, CAST(SUM(z.weight * h.ws) AS BIGINT) AS mass
         | FROM reps r JOIN sizes z USING (cluster) JOIN hq h ON h.doc_id = r.rep_id
         | JOIN dms d ON d.base_id = r.rep_id % $DedupBaseSpan
         | GROUP BY d.lang, d.source),
         |${tempAllocCtesSql("lang", "tl", MixBudget, from = "cm", agg = "SUM(mass)")},
         |${tempAllocCtesSql("source", "ts", MixBudget, from = "cm", agg = "SUM(mass)")},
         |q0 AS MATERIALIZED (SELECT cm.lang, cm.source, cm.mass AS n_docs, lt.alloc AS lt, st.alloc AS st,
         |  CAST(cm.mass AS DOUBLE) AS q
         | FROM cm JOIN tlalc lt ON lt.k = cm.lang JOIN tsalc st ON st.k = cm.source),
         |$rounds
         |SELECT lang, source, n_docs AS mass, lt, st, round(q, 6) AS quota
         |FROM q$IpfRounds ORDER BY lang, source""".stripMargin
    })
}
