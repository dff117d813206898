package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), n-gram Jaccard, MinHash + LSH banding, and SimHash.
  *
  * Scale posture:
  *  - exact dedup shuffles on a 128-bit content hash, never on the text
  *    itself (shuffle payload = hash + id, not documents);
  *  - signature computation (shingles -> MinHash/SimHash) is per-row
  *    map-side expression work, no shuffle;
  *  - candidate generation shuffles on LSH band keys only — the all-pairs
  *    Jaccard join exists for verification/small corpora and is clearly
  *    marked quadratic.
  * All hashes are deterministic arithmetic (TextOps.polyHash + affine
  * permutations mod 2^31-1) so the DuckDB oracle reproduces them exactly.
  */
object Dedup {

  /** 128-bit content key for exact dedup — group/shuffle on this, not on
    * raw text.
    */
  def contentKey(text: Column): Column = md5(text)

  /** Exact duplicate groups: content hash -> smallest id kept + copy count.
    * Only groups with >1 copy are returned.
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(contentKey(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .filter(col("copies") > 1)

  /** Distinct word n-gram shingles (default 3) of the lower-cased text.
    * Native [[graft.functions.WordShingles]] expression;
    * [[shinglesComposed]] is the built-ins-only twin for spec
    * cross-validation.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.TextExprs.wordShingles(text, n)

  /** HOF twin of [[shingles]] (interpreted — spec use only). */
  def shinglesComposed(text: Column, n: Int = 3): Column = {
    val tk = TextOps.tokens(text)
    when(
      size(tk) >= n,
      array_distinct(transform(
        sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(tk, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Polynomial hashes of the shingle set (base for MinHash). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), s => TextOps.polyHash(s))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    inter / union
  }

  // --- MinHash -------------------------------------------------------------

  /** Mersenne prime 2^31-1; affine permutation coefficients are a fixed
    * function of the component index, so signatures of ANY width k are
    * reproducible across engines and runs (widening k extends the family,
    * it never re-keys existing components).
    */
  val MinHashP = 2147483647L

  /** Default signature width / band count. The k/bands trade is per-corpus:
    * more bands of fewer rows = higher recall, more candidate pairs; the
    * defaults (8 = 4 bands x 2 rows) target Jaccard ~0.5 at fixture scale.
    * Every operator below takes explicit k/bands with these as defaults —
    * see the width probe table in SURVEY §8 for measured precision/recall
    * at other widths.
    */
  val MinHashK = 8
  val LshBands = 4

  /** Corpus statistics the width decision needs: document count and the
    * expected near-dup fraction (estimate from a sample or a prior run's
    * exact-dedup rate).
    */
  final case class CorpusStats(nDocs: Long, dupRate: Double)

  /** (k, bands, rowsPerBand) sized from the measured probe table
    * (SURVEY §8, `tools.LshWidthProbe`) — the 100x-corpus knob turn as a
    * function call with provenance, not a judgment call:
    *
    *  - large corpora (>= 100k docs): 16/4/4 — same recall class as the
    *    default (0.916 vs 0.986) at ~2.4x the precision (0.429 vs 0.190),
    *    i.e. ~2.4x less candidate shuffle, which is what dominates cost
    *    once the band join is the big shuffle;
    *  - small corpora hunting RARE dups (dupRate < 1%): 16/8/2 — recall
    *    0.998; with few true pairs the extra candidate volume is cheap
    *    and a missed dup is the expensive outcome;
    *  - otherwise: the measured default 8/4/2 (recall 0.986).
    *
    * Size precedence beats rarity: at >= 100k docs the candidate-volume
    * cost of 8 narrow bands is what melts the shuffle, so the
    * precision-leaning row wins even for rare dups.
    */
  def suggestWidths(stats: CorpusStats): (Int, Int, Int) = {
    require(stats.nDocs >= 0, "nDocs must be >= 0")
    require(stats.dupRate >= 0.0 && stats.dupRate <= 1.0, "dupRate must be in [0, 1]")
    if (stats.nDocs >= 100000L) (16, 4, 4)
    else if (stats.dupRate < 0.01) (16, 8, 2)
    else (MinHashK, LshBands, 2)
  }

  /** One row of the x108 measured calibration table: for signature width
    * k, the p99 of |signature estimate - exact Jaccard| over the LSH
    * candidate set (the TAIL, not the mean — a single band collision can
    * put a near-zero-Jaccard pair in the candidate set with a high
    * estimate, and the mean hides exactly that pair).
    */
  final case class WidthCalibration(k: Int, p99Err: Double)

  /** Default p99 error budget at the 0.5 near-dup cutoff: with p99 <= this
    * bound, at most 1% of candidate pairs can carry an estimate further
    * than the bound from their true Jaccard — the misclassification band
    * a corpus-scale dedup tolerates around its threshold before the
    * sketch, not the threshold, decides what survives.
    */
  val CalibTargetP99 = 0.25

  /** Width selection driven by the MEASURED calibration (x108's table)
    * instead of the static probe rows: the narrowest signature whose
    * measured p99 abs_err meets the budget wins (sketch cost is linear
    * in k — hash, shuffle bytes, and comparison work all scale with it);
    * if no measured width meets the budget the widest measured one is
    * taken (the least-wrong option — callers wanting a hard guarantee
    * check the returned width's calibration row). Bands follow the
    * [[suggestWidths]] size precedence: at >= 100k docs rows-per-band 4
    * (precision-leaning — candidate volume is what melts the shuffle),
    * else 2 (recall-leaning).
    */
  def suggestWidthsMeasured(
      stats: CorpusStats,
      calib: Seq[WidthCalibration],
      targetP99: Double = CalibTargetP99): (Int, Int, Int) = {
    require(stats.nDocs >= 0, "nDocs must be >= 0")
    require(calib.nonEmpty, "calibration table must be non-empty")
    require(targetP99 > 0.0, "targetP99 must be positive")
    val meeting = calib.filter(_.p99Err <= targetP99).map(_.k)
    val k = if (meeting.nonEmpty) meeting.min else calib.map(_.k).max
    val rowsPerBand = if (stats.nDocs >= 100000L) 4 else 2
    (k, math.max(1, k / rowsPerBand), rowsPerBand)
  }

  def minHashA(i: Int): Long = (2654435761L * (i + 1)) % MinHashP
  def minHashB(i: Int): Long = (40503L * (i + 1) * 9973L) % MinHashP

  /** First-MinHashK coefficient vectors (oracle SQL builders index these). */
  val MinHashA: IndexedSeq[Long] = (0 until MinHashK).map(minHashA)
  val MinHashB: IndexedSeq[Long] = (0 until MinHashK).map(minHashB)

  /** MinHash signature component i: min over shingle hashes of
    * (A_i * h + B_i) mod P. Null for docs with no shingles.
    */
  def minhashComponent(hashes: Column, i: Int): Column =
    array_min(transform(hashes, h => (lit(minHashA(i)) * h + lit(minHashB(i))) % lit(MinHashP)))

  /** Full k-component signature as flat columns mh0..mh{k-1}. */
  def minhashSig(hashes: Column, k: Int = MinHashK): Seq[Column] =
    (0 until k).map(i => minhashComponent(hashes, i).as(s"mh$i"))

  /** LSH band key b over a signature split into bands of `rowsPerBand`
    * components; docs sharing any band key are candidate pairs. Banding
    * turns near-dup search from O(n^2) into a shuffle on band keys.
    */
  def bandKey(b: Int, rowsPerBand: Int = 2): Column =
    concat_ws(":",
      lit(b) +: (0 until rowsPerBand).map(j => col(s"mh${rowsPerBand * b + j}")): _*)

  /** Document-frequency cap for shingle/band hot keys: a key shared by df
    * documents generates O(df^2) candidate pairs, so one viral key melts a
    * shuffle partition at 100 TB. Keys above the cap are dropped before
    * pair generation — dup detection barely notices (a shingle in >1000
    * docs carries no near-dup signal; a band bucket that big means an
    * exact-dup cluster better handled by exact dedup first).
    */
  val ShingleDfCap = 1000

  /** (id, band) LSH keys straight from raw text — shingle, hash, minhash,
    * band in one map-only projection. Docs too short to shingle produce no
    * rows (a null signature would otherwise give every short doc the same
    * band key and weld them into one giant false-dup bucket).
    */
  def bandKeysFor(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = MinHashK, bands: Int = LshBands): DataFrame = {
    require(k % bands == 0, s"signature width $k must split evenly into $bands bands")
    val r = k / bands
    val sigs = df.select(
      (col(idCol) +:
        (0 until k).map(i =>
          minhashComponent(
            transform(shingles(col(textCol)), x => TextOps.polyHash(x)), i).as(s"mh$i"))): _*)
    sigs
      .filter(col("mh0").isNotNull)
      .select(col(idCol), explode(array((0 until bands).map(bandKey(_, r)): _*)).as("band"))
  }

  /** Candidate near-dup pairs via LSH banding over a (id, sig-columns)
    * frame: explode band keys, self-join per band, dedupe pairs.
    * Buckets larger than `maxBucket` are dropped before the self-join
    * (hot-key guard — see [[ShingleDfCap]]); the count uses map-side
    * partial aggregation, so the guard itself is skew-safe.
    */
  def lshCandidates(
      sigs: DataFrame, idCol: String, maxBucket: Int = ShingleDfCap,
      bands: Int = LshBands, rowsPerBand: Int = 2): DataFrame = {
    val banded = sigs.select(
      col(idCol),
      explode(array((0 until bands).map(bandKey(_, rowsPerBand)): _*)).as("band"))
    // ONE shuffle via the shared single-pass pair generator (the previous
    // count-subplan + self-join shape evaluated the signature projection
    // three times); hot bands above maxBucket are dropped inside it.
    Similarity.bucketMemberPairs(banded, "band", struct(col(idCol).as("id")), maxBucket)
      .filter(col("m1.id") < col("m2.id"))
      .select(col("m1.id").as("id1"), col("m2.id").as("id2"))
      .distinct()
  }

  // --- SimHash -------------------------------------------------------------

  /** 16-bit SimHash over the token multiset: for each bit position, sum
    * +1/-1 votes from each token hash's bit, then assemble the sign
    * vector into an integer fingerprint. Near-dups have small Hamming
    * distance. 16 bits keeps the expression tree codegen-friendly; widen
    * by composing two calls over different salts if needed.
    */
  val SimHashBits = 16
  def simhash(text: Column): Column = {
    val th = transform(TextOps.tokens(text), t => TextOps.polyHash(t))
    val votes = (0 until SimHashBits).map { i =>
      aggregate(
        th,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
    }
    votes.zipWithIndex.map { case (v, i) =>
      when(v > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** 64-bit SimHash — salted composition of four 16-bit hash families in a
    * single native pass ([[graft.functions.SimHash64]]). At corpus scale
    * 16 bits collide constantly (2^16 buckets); 64 bits is the production
    * fingerprint width.
    */
  def simhash64(text: Column): Column = graft.functions.TextExprs.simHash64(text)

  /** Hamming distance between two SimHash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Duplicate-cluster resolution: given near-dup PAIRS (id1, id2), assign
    * every id the minimum id of its connected component (the canonical
    * "keep" document), so transitive duplicates (a~b, b~c) collapse to one
    * cluster even when a~c was never compared.
    *
    * Iterative label propagation (the large-star/small-star style loop):
    * each round every node adopts the smallest label among itself and its
    * neighbours; converges in O(diameter) rounds. Each round is one
    * shuffle on id; the driver only checks a scalar convergence count —
    * no data is collected. Dup clusters from LSH are tiny (diameter a few
    * hops), so `maxIter` default 10 is generous.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 10, failOnNonConvergence: Boolean = false): DataFrame = {
    val edges = pairs.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
    // Undirected adjacency including self-loops so isolated updates keep ids.
    val adj = edges
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .cache()
    // Lazy cut (round-20 job thinning): the labelSum below is a FULL
    // aggregate pass (every partition computed — the safe shape for lazy
    // localCheckpoint), so it materializes the generation in the same job
    // instead of a separate eager materialization job per round.
    var labels = Checkpoints.cutLazy(
      adj.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")))
    // Convergence via the LABEL-SUM fixpoint: every round each node's label
    // is least(own, neighbour labels), so labels are monotonically
    // non-increasing and the total sum strictly decreases until the
    // fixpoint — sum unchanged <=> no label changed. This replaces the
    // per-round updated-vs-old equality JOIN (two more shuffles per round
    // — the dominant cost of the loop at small scale, and an extra
    // id-keyed shuffle at any scale) with a single aggregate over the
    // frame the round materializes anyway. Decimal-exact so node counts
    // past 2^63/maxId cannot overflow the comparison.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // coalesce: sum over ZERO rows is null — empty `pairs` (a corpus with
      // no duplicate candidates) must converge cleanly, not NPE
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // SHUFFLE_HASH on the node-sized label vector (round-21, guide
      // §3.1): the cut generations carry no size stats, so the planner
      // defaulted to sort-merge — re-sorting the edge-sized adjacency
      // every round; the hash build is label-vector-sized per partition
      // at any scale.
      val neighbourMin = adj
        .join(labels.hint("SHUFFLE_HASH"), adj("b") === labels("id"))
        .groupBy(adj("a").as("id"))
        .agg(min(col("label")).as("nmin"))
      val next = labels.alias("l")
        .join(neighbourMin.hint("SHUFFLE_HASH").alias("n"),
          col("l.id") === col("n.id"), "left_outer")
        .select(
          col("l.id").as("id"),
          least(col("l.label"), coalesce(col("n.nmin"), col("l.label"))).as("label"))
      // Checkpoints.cut EVERY round: materializes the generation AND
      // truncates lineage to a LogicalRDD, which makes it immune to the
      // next line's unpersist of its parent. A cache()d generation is
      // PLAN-dependent on the superseded generation's cache — Spark
      // re-caches dependents when a parent is unpersisted, which silently
      // turned every later round and every consumer of the returned labels
      // into a full recomputation of the entire propagation history
      // (measured in tools.X26Probe: rounds degraded 0.7 -> 2.5 s within
      // 3 iterations and the downstream aggregate re-paid ~8 s). The
      // checkpointed blocks of dropped generations are reclaimed by the
      // ContextCleaner once unreferenced. Lazy cut: the labelSum right
      // after is the materializing full pass (round-20 job thinning).
      val updated = Checkpoints.cutLazy(next)
      val newSum = labelSum(updated)
      labels.unpersist(blocking = false)
      labels = updated
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      i += 1
    }
    adj.unpersist(blocking = false)
    if (!converged) {
      val msg = s"duplicateClusters did not converge within $maxIter rounds; " +
        "labels may span unresolved components (component diameter > maxIter)"
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels
  }

  /** Per-cluster representative selection over `labeled` (id, cluster,
    * quality): the member with the highest quality, ties to the lowest
    * id — the x66/x104 "keep the best copy" argmax as two hash
    * aggregates + one cluster-key equi-join (no window over members).
    *
    * NULL-SAFE by construction: `max(quality)` ignores nulls, so the
    * per-cluster best is null only when EVERY member's quality is null —
    * the null-safe equality (<=>) then keeps those all-null rows and
    * the min(id) tie-break still elects exactly one rep, matching an
    * oracle's total row_number ordering (nulls sort after non-nulls,
    * ties fall to the id). A plain === here would DROP an all-null
    * cluster entirely (null === null is null, filtered out) — a latent
    * engine/oracle divergence if the quality column ever becomes
    * nullable.
    *
    * @return (cluster, rep_id)
    */
  def clusterReps(labeled: DataFrame): DataFrame = {
    val best = labeled.groupBy(col("cluster")).agg(max(col("quality")).as("bq"))
    // SHUFFLE_HASH (round-21, guide §3.1): cluster-keyed best-quality
    // build side, bounded by clusters / shuffle.partitions at any scale;
    // statless inputs otherwise fall to sort-merge over the member side.
    labeled.join(best.hint("SHUFFLE_HASH"), "cluster")
      .filter(col("quality") <=> col("bq"))
      .groupBy(col("cluster")).agg(min(col("id")).as("rep_id"))
  }

  /** [[clusterReps]] fused with the cluster-size aggregate (round-20):
    * the x104 family used to run `clusterReps` plus a separate
    * `groupBy(cluster).count()` and join the two cluster-keyed frames
    * back together — three aggregates and two shuffles-worth of plan for
    * what is ONE pass over `labeled`: max(quality) and count(1) share the
    * first aggregate, and the weight rides the rep election through a
    * per-cluster max (it is constant within the cluster). Identical
    * values to clusterReps ⋈ sizes by construction — same null-safe
    * argmax (`<=>` keeps all-null-quality clusters), same min-id
    * tie-break (DedupSpec pins the equality).
    *
    * @return (cluster, rep_id, weight = cluster member count)
    */
  def clusterRepsWeighted(labeled: DataFrame): DataFrame = {
    val best = labeled.groupBy(col("cluster"))
      .agg(max(col("quality")).as("bq"), count(lit(1)).as("w"))
    // SHUFFLE_HASH (round-21, guide §3.1): cluster-keyed best-quality
    // build side, bounded by clusters / shuffle.partitions at any scale;
    // statless inputs otherwise fall to sort-merge over the member side.
    labeled.join(best.hint("SHUFFLE_HASH"), "cluster")
      .filter(col("quality") <=> col("bq"))
      .groupBy(col("cluster"))
      .agg(min(col("id")).as("rep_id"), max(col("w")).as("weight"))
  }

  /** Exact substring (shared-passage) dedup: find maximal runs of >=
    * `windowTokens` consecutive tokens shared verbatim between two
    * documents — the passage-level complement to document-level MinHash
    * (the standard "suffix-array" exact-substring pass of training-data
    * pipelines, e.g. the 50-token rule of Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"; window width is a
    * parameter here because corpus documents can be shorter than 50
    * tokens).
    *
    * Shape, all shuffles key-bounded:
    *  1. tokenize (map-side), emit every `windowTokens`-wide sliding
    *     window as a polynomial hash with its token position — O(tokens)
    *     windows per doc, carried as (hash, doc, pos), never the text;
    *  2. windows sharing a hash are matches: ONE shuffle on the window
    *     hash via [[graft.ops.Similarity.bucketMemberPairs]], with the
    *     [[ShingleDfCap]] hot-key cap (a window shared by thousands of
    *     docs is boilerplate — a pair explosion with no dedup signal,
    *     same rationale as the LSH band cap);
    *  3. chain overlapping window matches into maximal spans: matches of
    *     a pair lying on the same alignment diagonal (p1 - p2) with
    *     consecutive positions are one shared passage — the classic
    *     gaps-and-islands merge, partitioned by (pair, diagonal), so the
    *     window state is per-pair-diagonal, never global.
    *
    * Output: (id1, id2, start1, start2, span_tokens, n_windows) — one row
    * per maximal shared passage, span_tokens >= windowTokens.
    */
  def exactSubstringSpans(
      df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, maxDf: Int = ShingleDfCap): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    val tk = df.select(col(idCol).cast("long").as("doc_id"), TextOps.tokens(col(textCol)).as("t"))
    val wins = tk
      .filter(size(col("t")) >= windowTokens)
      .select(
        col("doc_id"),
        explode(sequence(lit(0), size(col("t")) - windowTokens)).as("p"),
        col("t"))
      .select(
        col("doc_id"), col("p"),
        TextOps.polyHash(concat_ws(" ", slice(col("t"), col("p") + 1, lit(windowTokens)))).as("wh"))
    val matches = graft.ops.Similarity.bucketMemberPairs(
      wins, "wh", struct(col("doc_id"), col("p")), maxDf)
      .filter(col("m1.doc_id") < col("m2.doc_id"))
      .select(
        col("m1.doc_id").as("id1"), col("m2.doc_id").as("id2"),
        col("m1.p").as("p1"), col("m2.p").as("p2"))
    matches
      .withColumn("diag", col("p1") - col("p2"))
      .withColumn("grp", col("p1") - org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("id1"), col("id2"), col("diag")).orderBy(col("p1"))))
      .groupBy(col("id1"), col("id2"), col("diag"), col("grp"))
      .agg(
        min(col("p1")).cast("long").as("start1"),
        min(col("p2")).cast("long").as("start2"),
        (max(col("p1")) - min(col("p1")) + windowTokens).cast("long").as("span_tokens"),
        count(lit(1)).as("n_windows"))
      .select(
        col("id1"), col("id2"), col("start1"), col("start2"),
        col("span_tokens"), col("n_windows"))
  }

  /** Exact set-similarity join via prefix filtering — AllPairs (Bayardo,
    * Ma, Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007).
    *
    * Every document's token set is ordered by global rarity (document
    * frequency, then token — the (df, token) tuple is the total order, so
    * no global rank table and no global sort); Jaccard >= t forces overlap
    * >= t*|x| for both sets of a qualifying pair, so the pair must share a
    * token inside the `|x| - ceil(t*|x|) + 1` rarest of each — the PREFIX.
    * Candidate pairs come from equi-joining prefixes on the token and
    * verify against the full sets, which makes the join EXACT: unlike the
    * MinHash/LSH path it misses nothing, and unlike the capped equi-join
    * it needs no ShingleDfCap semantics change — a hot token lands in a
    * prefix only for documents where it is among the rarest.
    *
    * Scale shape: df is a token-key aggregate; the rarity sort is a
    * per-document window (doc-key partitioning, bounded by doc length);
    * the candidate join touches the (1-t) prefix fraction of the exploded
    * corpus, concentrated on RARE tokens, so per-key fan-out stays small
    * by construction; verification is candidate-sized.
    *
    * @param sets (doc_id, s) with `s` a token array (deduplicated here —
    *             set semantics); empty sets are dropped (Jaccard undefined)
    * @param t    Jaccard threshold in (0, 1]
    * @return (id1 < id2, jac) for every pair with Jaccard >= t — exactly.
    */
  def prefixSimilarityJoin(sets: DataFrame, t: Double): DataFrame = {
    require(t > 0 && t <= 1, s"threshold must be in (0, 1], got $t")
    // Three consumers (the explode below and both verification joins)
    // would each replay the caller's shingling lineage — materialize once,
    // same convention as the triangle join's oriented edge list; the
    // between-query CacheHygiene sweep reclaims the blocks, so callers
    // need no .cache()/unpersist of their own.
    val sh = Checkpoints.cut(
      sets.select(col("doc_id"), array_distinct(col("s")).as("s"))
        .filter(size(col("s")) > 0))
    val ex = sh.select(col("doc_id"), size(col("s")).as("sz"), explode(col("s")).as("tok"))
    val dfreq = ex.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
    val prefixes = ex.join(dfreq, "tok")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("sz") - ceil(col("sz") * lit(t)) + 1)
      .select(col("tok"), col("doc_id"))
    val cand = prefixes.as("ca").join(
        prefixes.as("cb"),
        col("ca.tok") === col("cb.tok") && col("ca.doc_id") < col("cb.doc_id"))
      .select(col("ca.doc_id").as("id1"), col("cb.doc_id").as("id2"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("id1"), col("s").as("s1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("s").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("s1"), col("s2"))).cast("double").as("o"),
        size(col("s1")).cast("double").as("n1"), size(col("s2")).cast("double").as("n2"))
      .select(col("id1"), col("id2"), (col("o") / (col("n1") + col("n2") - col("o"))).as("jac"))
      .filter(col("jac") >= t)
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    * over each document's positional n-gram hashes, slide a w-gram window
    * and select the window's minimum hash — RIGHTMOST position on ties —
    * recording each selected position once. Guarantees: at least one
    * fingerprint per window (so any shared token run of length
    * >= w + n - 1 across two documents produces at least one matching
    * (gh) fingerprint), with expected density 2/(w+1) — the bounded
    * sketch for passage-level overlap that [[exactSubstringSpans]]
    * detects exactly.
    *
    * The window argmin is pure scalar algebra over `lead` columns (w is
    * a small constant), so selection is deterministic and an oracle can
    * mirror it expression-for-expression. Per-document ordered windows
    * only — a document bounds the partition; no pair space.
    *
    * @return (id, pos, gh): 0-based selected gram positions + hashes
    *
    * WIDEN CONTRACT (this overload defaults `widen = true`): the input is
    * routed through [[graft.util.Width.atLeastCores]], which probes the
    * planned partition count. Streaming inputs pass through unwidened
    * automatically; BATCH callers should pass exchange-free frames (scans,
    * filters, projections) or call the `widen = false` overload — probing
    * an exchange-bearing plan materializes its query stages at planning
    * time under AQE (early, duplicated execution).
    */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int): DataFrame =
    winnowFingerprints(docs, idCol, textCol, n, w, widen = true)

  /** As the public overload; `widen = false` skips the core-width
    * repartition of the input — for per-micro-batch callers (streaming)
    * whose inputs are latency-bound and tiny, where an extra exchange
    * per batch costs more than the single-task map it spreads.
    */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int, widen: Boolean): DataFrame = {
    require(n >= 1, s"ngram width must be >= 1, got $n")
    require(w >= 2, s"winnow window must be >= 2, got $w")
    // Selection runs entirely in the array domain per document — no
    // per-document window, no shuffle at all: each window start's
    // argmin (rightmost tie) is scalar algebra over the materialized
    // hash array, and the per-window picks dedupe with array_distinct
    // BEFORE the explode (selections are per-document by construction).
    // The two intermediate projections are deliberate boundaries: the
    // token array and the hash array each materialize once per row, so
    // the per-position lambdas index attributes instead of re-running
    // the tokenizer/hasher (see TextOps.positionalGramHashesOfTokens).
    val sels = {
      val h = col("_h")
      val m = size(h)
      when(m >= w,
        array_distinct(transform(sequence(lit(1), m - (w - 1)), s => {
          val mn = least((0 until w).map(k => element_at(h, s + lit(k))): _*)
          // rightmost tie: probe h[s+w-1] first, fall back leftward
          val off = (w - 1 to 1 by -1).foldRight(lit(0)) {
            (k, acc) => when(element_at(h, s + lit(k)) === mn, lit(k)).otherwise(acc)
          }
          struct((s - 1 + off).as("pos"), mn.as("gh")) // 0-based positions
        })))
        .otherwise(array().cast("array<struct<pos:int,gh:bigint>>"))
    }
    // Core-width input (round-20): the tokenizer + positional gram hash
    // + selection lambdas are the most compute-dense map stage in the
    // engine, and the fixture corpus scans at ONE split (single row
    // group) — without the widening the whole sweep ran on one core
    // (profiled: x85's two jobs = 1.2 s + 0.85 s, single-task each).
    // Width.atLeastCores is a no-op whenever the scan is already at
    // core width, i.e. at any real corpus scale.
    val in =
      if (widen)
        graft.util.Width.atLeastCores(
          docs.select(col(idCol).as("id"), col(textCol).as("__wtxt")))
      else docs.select(col(idCol).as("id"), col(textCol).as("__wtxt"))
    in
      .select(col("id"), TextOps.tokens(col("__wtxt")).as("_tk"))
      .select(col("id"), TextOps.positionalGramHashesOfTokens(col("_tk"), n).as("_h"))
      .select(col("id"), explode(sels).as("sel"))
      .select(col("id"), col("sel.pos").as("pos"), col("sel.gh").as("gh"))
  }

  /** Matched-fingerprint span localization: for every (bench doc,
    * train doc) pair sharing winnowing fingerprints, the merged bench
    * token intervals those matches cover — WHERE the shared passage
    * sits, not just that it exists. Positions come free from
    * [[winnowFingerprints]]; merging is gaps-and-islands over matched
    * gram positions: a new span starts when the gap to the previous
    * match exceeds `mergeGap` (sized by the caller from the winnow
    * theorem: within one shared passage consecutive selections are
    * <= w apart, and a single edited token voids n gram positions, so
    * n + 2(w-1) bridges isolated edits without merging distinct
    * passages). Spans with fewer than `minFp` matches drop — one
    * shared fingerprint is a common phrase or an 8-byte coincidence,
    * not passage evidence.
    *
    * Scale shape: fingerprinting is map-only per doc; the candidate
    * join is an 8-byte gh equi-join whose per-hash fan-out is bounded
    * by `dfCap` (fingerprints in more DISTINCT train docs than that are
    * boilerplate — duplication evidence, not contamination evidence —
    * and are dropped from the index, the posting-list-cap discipline);
    * the islands window partitions by (bench, train) pair over the
    * sparse matched set, never a doc-pair cross space.
    *
    * @return (id, train_id, span_start, span_end, span_tokens, n_fp) —
    *         token intervals are inclusive, 0-based; end covers the
    *         last matched gram's n tokens
    */
  /** Merged matched-fingerprint spans of `docs` against a fingerprint
    * SET (`indexFp`, one `gh` column; no per-index-doc identity — the
    * x98/ingest-scrub direction, where removal doesn't care WHICH
    * benchmark item leaked). Same gaps-and-islands merge as
    * [[fingerprintSpans]], partitioned by doc alone.
    *
    * @return (id, s, e): inclusive 0-based token intervals, never
    *         overlapping within a doc (consecutive islands sit further
    *         apart than a span extends past its last matched gram)
    */
  def fingerprintSpansAgainst(
      docs: DataFrame, indexFp: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int, mergeGap: Int, minFp: Long,
      widen: Boolean = true): DataFrame = {
    require(mergeGap >= 0, s"mergeGap must be >= 0, got $mergeGap")
    require(minFp >= 1, s"minFp must be >= 1, got $minFp")
    val docFp = winnowFingerprints(docs, idCol, textCol, n, w, widen)
      .select(col("id"), col("pos"), col("gh")).distinct()
    val matched = docFp.join(indexFp.select(col("gh")).distinct(), "gh")
      .select(col("id"), col("pos")).distinct()
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    matched
      .withColumn("_prev", lag(col("pos"), 1).over(byPos))
      .withColumn("_new",
        when(col("pos") - col("_prev") > mergeGap, 1).otherwise(0))
      .withColumn("_island", sum(col("_new")).over(byPos.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("id"), col("_island"))
      .agg(min(col("pos")).cast("long").as("s"),
        (max(col("pos")) + n - 1).cast("long").as("e"),
        count(lit(1)).as("n_fp"))
      .filter(col("n_fp") >= minFp)
      .select(col("id"), col("s"), col("e"))
  }

  /** Cut `spans` (id, s, e — non-overlapping inclusive token intervals)
    * out of `docs` and rebuild the text: the REMOVAL step of
    * decontamination. Only implicated docs return; text is the
    * lowercased token stream rejoined (the fingerprint tokenization —
    * the form a training pipeline tokenizes anyway). Token marking is a
    * doc-keyed equi-join with a BETWEEN residual; the rebuild sorts
    * inside the aggregate, so the output is deterministic under any
    * partitioning.
    *
    * Scale shape: the output is implicated-docs-only, so the INPUT is
    * pruned to match BEFORE anything text-bearing explodes — a
    * left_semi join of `docs` against the span doc ids. Catalyst
    * cannot push the final inner join below the rebuild groupBy, so
    * without this prune the posexplode/mark/collect_list pipeline
    * shuffles the FULL corpus token stream to rebuild a sliver of it
    * (measured at sf100: 2.7B token rows for 41k implicated docs out
    * of 50M). The fingerprint sweep that PRODUCES `spans` is
    * inherently corpus-wide; the rebuild never is.
    *
    * The non-overlap precondition is enforced, not assumed: a
    * windowed `assert_true` over `spans` (ordered by start per doc)
    * fails the job if any span starts at or before its predecessor's
    * end — overlapping intervals (e.g. raw per-(bench,train)
    * [[fingerprintSpans]] output not collapsed per doc) would
    * double-count `n_spans` silently otherwise. The check rides the
    * id-partitioned shuffle `spans` already needs for the mark join.
    *
    * @return (id, n_spans, n_tokens, tokens_removed, clean_text)
    */
  /** `spans` (id, s, e) with the non-overlap precondition ENFORCED: a
    * windowed assert_true fails the job if any span starts at or before
    * its predecessor's end within a doc. Materialized with a
    * [[Checkpoints.cutLazy]] because every caller reads the result from
    * THREE plan branches (the prune semi-join, the mark join, the
    * n_spans aggregate) — without the cut each branch re-evaluates the
    * spans lineage, which for the scrub queries is the corpus-wide
    * fingerprint sweep, and the assert window with it. The cut is LAZY
    * (materializes at the consumer's first action, then serves all
    * three branches from the persisted generation): an eager cut would
    * run the full spans computation at DataFrame-CONSTRUCTION time,
    * charging plan-only consumers (explain, plan pins) the whole sweep.
    * Exposed private[graft] so the streaming per-batch kernel
    * ([[graft.streaming.DocStreams.scrubBatch]]) can hold the handle
    * and [[Checkpoints.unpersist]] it once the batch is written —
    * foreachBatch outlives every between-query hygiene sweep, so
    * without the explicit release a long-running scrub stream
    * accumulates one generation of checkpoint blocks per micro-batch.
    */
  private[graft] def checkSpans(spans: DataFrame): DataFrame = {
    val byS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("s"))
    Checkpoints.cutLazy(spans
      .withColumn("_pe", lag(col("e"), 1).over(byS))
      .withColumn("_ok", assert_true(col("_pe").isNull || col("s") > col("_pe"),
        lit("scrubSpans: spans must be non-overlapping per doc " +
          "(collapse fingerprintSpans output per doc first)")))
      .filter(col("_ok").isNull)
      .select(col("id"), col("s"), col("e")))
  }

  def scrubSpans(
      docs: DataFrame, spans: DataFrame,
      idCol: String, textCol: String): DataFrame =
    scrubSpansChecked(docs, checkSpans(spans), idCol, textCol)

  /** [[scrubSpans]] body over an ALREADY-checked spans frame (the
    * [[checkSpans]] output) — callers that manage the cut frame's
    * lifetime themselves (streaming) enter here.
    */
  private[graft] def scrubSpansChecked(
      docs: DataFrame, checked: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .join(checked.select(col("id").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("_t"))
      .select(col("id"), posexplode(col("_t")).as(Seq("tpos", "tok")))
    val marked = toks
      .join(checked, toks("id") === checked("id") &&
        col("tpos") >= col("s") && col("tpos") <= col("e"), "left_semi")
      .select(col("id"), col("tpos"))
    toks
      .join(marked.withColumn("_rm", lit(1)), Seq("id", "tpos"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_rm"), lit(0))).cast("long").as("tokens_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("_rm").isNull,
            struct(col("tpos"), col("tok"))))),
          p => p.getField("tok")), " ").as("clean_text"))
      .join(checked.groupBy(col("id")).agg(count(lit(1)).as("n_spans")), "id")
      .select(col("id"), col("n_spans"), col("n_tokens"),
        col("tokens_removed"), col("clean_text"))
  }

  /** Byte-preserving segment view of `docs`: one row per maximal
    * whitespace OR token run ([[TextOps.SegmentRe]] — concatenating
    * segments in order reproduces the original string byte-for-byte).
    * Columns: id, si (0-based segment ordinal), seg (the run's original
    * bytes), is_tok, tcnt (running count of token segments up to and
    * INCLUDING this one — a token segment's 0-based token index is
    * tcnt - 1, matching [[TextOps.tokens]] order exactly since both
    * split on the same whitespace class), coff (0-based char offset of
    * the segment in the original string, from a running length sum).
    *
    * Scale shape: the explode is map-only; the two running sums share
    * one id-partitioned window — callers prune `docs` to the implicated
    * slice BEFORE calling, so the window never sees the full corpus.
    */
  private def segments(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bySi = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("si"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol).as("id"),
        posexplode(regexp_extract_all(col(textCol), lit(TextOps.SegmentRe), lit(0)))
          .as(Seq("si", "seg")))
      .withColumn("is_tok", not(col("seg").rlike("^" + TextOps.WsClass)))
      .withColumn("tcnt",
        sum(when(col("is_tok"), 1L).otherwise(0L)).over(bySi))
      .withColumn("coff",
        (sum(length(col("seg")).cast("long")).over(bySi) -
          length(col("seg"))).cast("long"))
  }

  /** Byte-original scrub: cut `spans` (id, s, e — non-overlapping
    * inclusive TOKEN intervals) out of `docs` while preserving the
    * original bytes (casing, punctuation, newlines) of everything kept
    * — the production form of [[scrubSpans]], whose output is the
    * lowercased token stream. Removal rule, deterministic and
    * byte-exact: a removed span takes its tokens AND the whitespace run
    * immediately following each removed token (interior whitespace of
    * the span, plus the seam after its last token); whitespace BEFORE
    * the span's first token survives, as does all leading whitespace.
    * Equivalently: a segment is cut iff the nearest token at-or-before
    * it falls inside a span. Unscrubbed regions are byte-identical to
    * the original by the [[TextOps.SegmentRe]] reconstruction property.
    *
    * Scale shape: same as [[scrubSpans]] — the corpus prunes to
    * implicated docs with a left_semi BEFORE the segment explode, the
    * mark is a doc-keyed equi-join with a BETWEEN residual on the
    * governing token index, and the rebuild aggregate sorts inside
    * collect_list, deterministic under any partitioning.
    *
    * @return (id, n_spans, n_tokens, tokens_removed, chars_removed,
    *         clean_text)
    */
  def scrubSpansBytes(
      docs: DataFrame, spans: DataFrame,
      idCol: String, textCol: String): DataFrame =
    scrubSpansBytesChecked(docs, checkSpans(spans), idCol, textCol)

  /** [[scrubSpansBytes]] body over an ALREADY-checked spans frame — see
    * [[scrubSpansChecked]].
    */
  private[graft] def scrubSpansBytesChecked(
      docs: DataFrame, checked: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val sg = segments(
      docs.join(checked.select(col("id").as(idCol)).distinct(),
        Seq(idCol), "left_semi"),
      idCol, textCol)
    val marked = sg
      .join(checked,
        sg("id") === checked("id") && col("tcnt") >= 1 &&
          col("tcnt") - 1 >= col("s") && col("tcnt") - 1 <= col("e"),
        "left_semi")
      .select(col("id"), col("si"))
    sg
      .join(marked.withColumn("_rm", lit(1)), Seq("id", "si"), "left")
      .groupBy(col("id"))
      .agg(max(col("tcnt")).cast("long").as("n_tokens"),
        sum(when(col("_rm").isNotNull && col("is_tok"), 1L).otherwise(0L))
          .cast("long").as("tokens_removed"),
        sum(when(col("_rm").isNotNull, length(col("seg")).cast("long"))
          .otherwise(0L)).cast("long").as("chars_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("_rm").isNull,
            struct(col("si"), col("seg"))))),
          p => p.getField("seg")), "").as("clean_text"))
      .join(checked.groupBy(col("id")).agg(count(lit(1)).as("n_spans")), "id")
      .select(col("id"), col("n_spans"), col("n_tokens"),
        col("tokens_removed"), col("chars_removed"), col("clean_text"))
  }

  /** Character offsets of token `spans` (id, s, e — inclusive token
    * intervals) in the ORIGINAL string: char_start = offset of span's
    * first token's first char, char_end = offset of its last token's
    * last char (both 0-based inclusive), so
    * `substring(text, char_start + 1, char_end - char_start + 1)` is the
    * span's original bytes. Spans whose token indices fall outside the
    * doc's token range drop (inner joins) — [[fingerprintSpansAgainst]]
    * output never does by construction (e = last gram start + n - 1
    * <= token count - 1).
    *
    * Scale shape: prune-then-segment as [[scrubSpansBytes]]; the two
    * lookups are id+token-index equi-joins against the implicated
    * slice's token segments only.
    *
    * @return (id, s, e, char_start, char_end)
    */
  def spanCharOffsets(
      docs: DataFrame, spans: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val checked = checkSpans(spans)
    val tokSegs = segments(
      docs.join(checked.select(col("id").as(idCol)).distinct(),
        Seq(idCol), "left_semi"),
      idCol, textCol)
      .filter(col("is_tok"))
      .select(col("id"), (col("tcnt") - 1).as("tix"), col("coff"),
        length(col("seg")).cast("long").as("len"))
    val a = tokSegs.select(col("id").as("_ida"), col("tix").as("_tixa"),
      col("coff").as("char_start"))
    val b = tokSegs.select(col("id").as("_idb"), col("tix").as("_tixb"),
      (col("coff") + col("len") - 1).as("char_end"))
    checked
      .join(a, col("id") === col("_ida") && col("s") === col("_tixa"))
      .join(b, col("id") === col("_idb") && col("e") === col("_tixb"))
      .select(col("id"), col("s"), col("e"),
        col("char_start"), col("char_end"))
  }

  def fingerprintSpans(
      bench: DataFrame, train: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int, mergeGap: Int, minFp: Long, dfCap: Long): DataFrame = {
    require(mergeGap >= 0, s"mergeGap must be >= 0, got $mergeGap")
    require(minFp >= 1, s"minFp must be >= 1, got $minFp")
    require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
    val trainFp0 = winnowFingerprints(train, idCol, textCol, n, w)
      .select(col("id").as("train_id"), col("gh")).distinct()
    val rareGh = trainFp0.groupBy(col("gh"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= dfCap)
      .select(col("gh"))
    val trainFp = trainFp0.join(rareGh, "gh")
    val benchFp = winnowFingerprints(bench, idCol, textCol, n, w)
      .select(col("id"), col("pos"), col("gh")).distinct()
    val matches = benchFp.join(trainFp, "gh")
      .select(col("id"), col("train_id"), col("pos")).distinct()
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"), col("train_id")).orderBy(col("pos"))
    matches
      .withColumn("_prev", lag(col("pos"), 1).over(byPos))
      // first row of a pair: _prev null -> otherwise(0) -> island 0
      .withColumn("_new",
        when(col("pos") - col("_prev") > mergeGap, 1).otherwise(0))
      .withColumn("_island", sum(col("_new")).over(byPos.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("id"), col("train_id"), col("_island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + n - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_fp"))
      .filter(col("n_fp") >= minFp)
      .select(col("id"), col("train_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"), col("n_fp"))
  }
}
