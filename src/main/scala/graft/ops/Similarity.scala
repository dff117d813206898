package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; O(|corpus| * |queries| * dim) map-side work,
  *    no corpus shuffle. The correctness baseline.
  *  - [[lshBucketCandidates]]: random-hyperplane LSH — each vector gets a
  *    b-bit signature from deterministic pseudo-random planes; candidates
  *    share a signature bucket. Turns all-pairs search into a shuffle on
  *    bucket keys; the scale path for corpus-vs-corpus near-dup at 100 TB.
  *
  * All dot products run in double (cast up from float32) as left-to-right
  * array folds — deterministic and mirrored by the oracle's
  * list_cosine_similarity over DOUBLE[].
  */
object Similarity {

  /** float32 embedding -> double vector (deterministic widening). */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Native dot product ([[graft.functions.VectorDot]]): one expression
    * node with a primitive loop + codegen, instead of an interpreted HOF
    * fold or a 64-node element_at tree (both measured 100+ s on a 2.9M-pair
    * join; the native expression runs it in seconds). Identical left-to-
    * right widen-multiply-add semantics, so oracle results are unchanged.
    */
  def dotNative(a: Column, b: Column): Column = graft.functions.VectorExprs.vectorDot(a, b)

  /** Cosine with precomputable norms: pass norm columns computed once per
    * row so pair joins do one dot, not three. Identical IEEE result to
    * [[cosine]]. `dim` is kept for API stability (the native dot reads the
    * runtime array length).
    */
  def cosineStatic(a: Column, b: Column, normA: Column, normB: Column, dim: Int): Column =
    dotNative(a, b) / (normA * normB)

  def norm(v: Column, dim: Int): Column = sqrt(dotNative(v, v))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), rank ties broken by id for determinism.
    *
    * @param widen round-21 (guide §2.5): widen a narrower-than-cores
    *              map-only corpus before the |corpus| x |queries|
    *              scoring fan-out — the local single-row-group
    *              embeddings scan otherwise serializes the whole pass
    *              onto one task. Callers whose query set is a handful
    *              of vectors used once (x08's 10, x34's 1, the
    *              feasibility probe's single summary) opt out: there
    *              the widen exchange costs more than the single-task
    *              pass it spreads (measured x08 0.67x, x34 0.80x,
    *              x109 0.80x WITH the widen). No-op at real corpus
    *              width and on non-map-only inputs.
    */
  def bruteForceTopK(corpus0: DataFrame, queries: DataFrame, k: Int, idCol: String = "vec_id", vecCol: String = "v", dim: Int = -1, widen: Boolean = true): DataFrame = {
    val corpus = if (widen) graft.util.Width.atLeastCores(corpus0) else corpus0
    // Norms factored out of the pair fan-out (round-20): inline they were
    // recomputed once per (corpus, query) pair — two extra dot products
    // per pair. Same expressions, same IEEE doubles, computed once per
    // side.
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val (corp2, q2, cosExpr) =
      if (dim > 0) (
        corpus.withColumn("__vn", norm(col(vecCol), dim)),
        q.withColumn("__qn", norm(col("qv"), dim)),
        cosineStatic(col("qv"), col(vecCol), col("__qn"), col("__vn"), dim))
      else (corpus, q, cosine(col("qv"), col(vecCol)))
    val pairs = corp2
      .crossJoin(broadcast(q2))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), round(cosExpr, 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Maximal-marginal-relevance greedy selection over a candidate frame
    * (columns: id, rel — the rounded query relevance — and vec): k rounds,
    * each picking argmax of `lambda * rel - (1 - lambda) * max sim(d,
    * selected)`, ties to the lower id. The relevance-vs-redundancy
    * re-rank run between retrieval and a context window.
    *
    * Candidates are top-N output (bounded by construction), so the whole
    * selection packs into one row via `collect_list` and runs as a single
    * imperative pass inside the native [[graft.functions.MmrSelect]]
    * expression — one aggregate stage instead of k scheduled rounds
    * (measured 4.8 s -> sub-second for one 20-candidate query). At scale,
    * generate candidates with [[bruteForceTopK]] / [[ivfProbe]] and
    * re-rank per query group: `groupBy(qid).agg(collect_list(...))`, one
    * MmrSelect per group. All similarities round to 6 dp before any
    * comparison, making the greedy argmax partition- and
    * engine-independent (the x34 DuckDB oracle unrolls the same rounds in
    * SQL).
    *
    * Output: (id, rel, rnd, mmr) — one row per selection round, 1-based.
    */
  def mmrSelect(
      candidates: DataFrame,
      k: Int,
      lambda: Double,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "v"): DataFrame = {
    val packed = candidates
      .select(struct(
        col(idCol).cast("long").as("id"),
        col("rel").cast("double").as("rel"),
        col(vecCol).cast("array<double>").as("v")).as("c"))
      .agg(collect_list(col("c")).as("cand"))
    packed
      .select(explode(graft.functions.VectorExprs.mmrSelect(col("cand"), k, lambda)).as("e"))
      .select(col("e.vec_id"), col("e.rel"), col("e.rnd"), col("e.mmr"))
      .orderBy(col("rnd"))
  }

  /** Batch MMR: [[mmrSelect]] per query group. Candidates carry a query id
    * (`qidCol`); each group packs via `collect_list` and re-ranks
    * independently inside one aggregate stage — a million queries re-rank
    * with one shuffle on qid, no per-query driver coordination. Output:
    * (qid, vec_id, rel, rnd, mmr).
    */
  def mmrSelectGrouped(
      candidates: DataFrame,
      k: Int,
      lambda: Double,
      qidCol: String = "qid",
      idCol: String = "vec_id",
      vecCol: String = "v"): DataFrame =
    candidates
      .select(col(qidCol).as("qid"), struct(
        col(idCol).cast("long").as("id"),
        col("rel").cast("double").as("rel"),
        col(vecCol).cast("array<double>").as("v")).as("c"))
      .groupBy(col("qid"))
      .agg(collect_list(col("c")).as("cand"))
      .select(col("qid"), explode(graft.functions.VectorExprs.mmrSelect(col("cand"), k, lambda)).as("e"))
      .select(col("qid"), col("e.vec_id"), col("e.rel"), col("e.rnd"), col("e.mmr"))
      .orderBy(col("qid"), col("rnd"))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed integer mix mapped into [-1, 1]. Reproducible anywhere —
    * public so the oracle SQL can embed the identical plane literals.
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = (plane.toLong * 131071L + dim.toLong * 524287L + 12345L) % 1000003L
    (h.toDouble / 1000003.0) * 2.0 - 1.0
  }

  /** b-bit random-hyperplane signature of a double vector column.
    * `planeOffset` selects an independent plane set (planes
    * [offset, offset+bits)) so callers can union several hash tables —
    * the standard LSH recall knob: P(candidate) = 1 - (1 - p^bits)^tables.
    */
  def lshSignature(vec: Column, bits: Int, dim: Int, planeOffset: Int = 0): Column = {
    val bitCols = (0 until bits).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(planeOffset + p, d))): _*)
      when(dotNative(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** IVF-style coarse quantization: assign every vector to its nearest
    * "centroid" (highest cosine), search only within the probed cell.
    * Centroids here are a deterministic subset of the corpus (first
    * `nCells` ids) rather than k-means output — same plan shape and
    * pruning behavior, but reproducible on any engine, which lets the
    * DuckDB oracle verify cell assignment exactly. Swapping in trained
    * centroids is a data change, not a code change.
    *
    * Scale: assignment is a broadcast join (corpus x small centroid set,
    * map-side); the search join shuffles on cell id only.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, dim: Int, idCol: String = "vec_id", vecCol: String = "v"): DataFrame =
    ivfProbe(corpus, centroids, dim, 1, idCol, vecCol)

  /** IVF probing with the standard `nprobe` recall/cost knob: each vector
    * keeps its `nprobe` NEAREST cells (one output row per kept cell).
    * nprobe=1 is index ASSIGNMENT (each corpus vector lives in exactly one
    * cell); at query time a larger nprobe widens the search to neighboring
    * cells, trading candidate volume (shuffle + verify cost scales
    * linearly in nprobe) for recall of matches that fell across a Voronoi
    * boundary. Deterministic: ties break to the lower cell id on the
    * rounded cosine, so probed candidate sets are engine-reproducible like
    * everything else in this family.
    */
  def ivfProbe(
      corpus: DataFrame, centroids: DataFrame, dim: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    // NOT widened here (round-21 A/B): an op-internal Width.atLeastCores
    // was measured NET WORSE on the ANN family — ivfProbe's callers are
    // mostly tiny filtered query frames and single spill-assign passes
    // whose corpus x cells scoring is too small to amortize the widen
    // exchange (x102 0.82x, x116 0.79x, x13 0.83x with it). The k-means
    // loop — where the assign repeats per iteration — widens its corpus
    // ONCE at [[kmeansCentroids]] entry instead.
    // Norms factored OUT of the broadcast-join fan-out (round-20): the old
    // inline form recomputed the vector's norm once per (vector, cell) row
    // and every centroid's norm once per corpus row — a full extra dot
    // product per scored pair. Same expressions, same IEEE doubles, just
    // computed once per side.
    val c = centroids.select(col(idCol).as("cell_id"), col(vecCol).as("cv"))
      .withColumn("cnorm", norm(col("cv"), dim))
    val scored = corpus
      .select(col(idCol), col(vecCol), norm(col(vecCol), dim).as("vnorm"))
      .crossJoin(broadcast(c))
      .select(
        col(idCol), col(vecCol),
        col("cell_id"),
        round(cosineStatic(col(vecCol), col("cv"), col("vnorm"), col("cnorm"), dim), 6).as("cscore"))
    if (nprobe == 1) {
      // Assignment (the k-means inner op and every full-corpus index
      // build) as a map-side argmax instead of a window (round-20, guide
      // §2.3 "aggregate before you shuffle"): partial aggregation
      // collapses the N x cells scored rows to N best-rows BEFORE the
      // exchange, where the window shuffled and sorted all N x cells.
      // max(struct(cscore, -cell_id)) reproduces the window's total order
      // exactly — Spark sorts NaN above all doubles and null fields first
      // in both struct comparison and sort, and the negated cell id is the
      // ascending tie-break — so the selected cell is identical row for
      // row.
      // The vector rides INSIDE the max struct (round-21, ADVICE): a
      // separate first(vec) is non-deterministic per group when the
      // corpus holds duplicate ids with different vectors — it could
      // pair one row's vector with another row's best cell. Struct
      // comparison short-circuits on (cscore, nc), which are distinct
      // per cell, so the vector field is only consulted on exact
      // duplicate-id ties and the winning row stays self-consistent.
      scored
        .groupBy(col(idCol))
        .agg(
          max(struct(col("cscore"), (-col("cell_id")).as("nc"),
            col(vecCol).as("v"))).as("best"))
        .select(col(idCol), col("best.v").as(vecCol), (-col("best.nc")).as("cell_id"))
    } else {
      val w = Window.partitionBy(col(idCol)).orderBy(col("cscore").desc, col("cell_id"))
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= nprobe)
        .select(col(idCol), col(vecCol), col("cell_id"))
    }
  }

  /** Production IVF cell count: ceil(sqrt(n)) — the standard sizing that
    * makes per-probe candidate volume (n / cells = sqrt(n)) and centroid
    * scan cost (cells = sqrt(n)) meet, so total serve cost per query is
    * O(spill * nprobe * sqrt(n)): a vanishing corpus fraction at scale.
    */
  def sqrtCells(n: Long): Int = {
    require(n >= 1, "corpus must be non-empty")
    math.ceil(math.sqrt(n.toDouble)).toInt
  }

  /** Deterministic training-sample modulus for the IVF k-means build:
    * keep vectors with vec_id % m == 0, sized so roughly `perCell`
    * training points land on each centroid (the standard IVF build
    * trains on a bounded sample and assigns the full corpus — training
    * on all N costs O(iters * N * cells) for no centroid-quality gain
    * once the per-cell sample is statistically enough). m == 1 (full
    * corpus) whenever the corpus is small enough that the sample target
    * exceeds it — so fixture-scale results are bit-identical to a
    * full-corpus train, and the sampling only engages where it pays.
    *
    * BIAS CAVEAT (measured, r18): `id % m` sampling assumes row ids
    * are uncorrelated with cluster structure. On a fixture whose
    * labels were `id mod 140`, the m = 2 sample contained ONLY the
    * even-label clusters and sampled-train recall collapsed
    * 1.000 -> 0.896 (odd-cluster queries probed centroids that had
    * never seen their cluster). If your ids carry structure (sorted by
    * source, sharded by class), pass an explicitly hashed or shuffled
    * `train` frame to [[AnnModels.ivfCentroids]] instead of relying on
    * the modulus.
    */
  def trainSampleMod(n: Long, cells: Int, perCell: Int = 50): Long = {
    require(n >= 1 && cells >= 1 && perCell >= 1, "n, cells, perCell must be >= 1")
    math.max(1L, n / (perCell.toLong * cells))
  }

  /** (cells, spill, nprobe) for a target recall@10, sized from the
    * measured sweep table (tools.AnnSweep, sf0.1 / N=2000, ISOTROPIC
    * fixture — the worst case: within-label and cross-label cosine both
    * ~0, so these are recall floors; clustered real-world embeddings do
    * strictly better at the same cost). Measured rows at
    * cells=sqrt(N), spill=2: nprobe 1 -> 0.862, 2 -> 0.896, 4 -> 0.930,
    * 8 -> 0.968, 12 -> 0.984. Spill-2 dominates single assignment at
    * equal candidate volume everywhere in the table (it converts the
    * Voronoi-boundary misses), so it is unconditional here; training
    * iterations measured as noise (2 vs 5 within +-0.02), so the cheap
    * 2-round build stands. The serve cost implied by the choice is
    * spill * nprobe * sqrt(n) candidates per query.
    *
    * SCALE TRANSFER (r17 ADVICE, measured r18 —
    * logs/ANNSWEEP_r18_*.log): the table is a FLOOR as N grows, not a
    * point estimate. At cells = sqrt(N) each probe's candidate count
    * grows as sqrt(N), so recall at fixed nprobe RISES with corpus
    * size on the same geometry — measured isotropic at N=20k:
    * nprobe 1 -> 0.982, 2 -> 0.986, 4 -> 0.990, 8 -> 0.994,
    * 12 -> 0.998, every row above its N=2k twin (1 -> 0.826,
    * 2 -> 0.862, 4 -> 0.916, 8 -> 0.956, 12 -> 0.976). On the
    * planted-cluster fixture (the realistic regime, x109
    * indexable = 1) every (N, nprobe) point dominates its isotropic
    * twin, saturating to 1.000 (nprobe 4 at 2k; from nprobe 1 at 20k,
    * 1.4% scanned — structure pays more at scale). The returned nprobe
    * therefore meets targetRecall at any N >= 2k on
    * isotropic-or-better geometry; the
    * one regime it cannot promise is a corpus measured BELOW the
    * isotropic line, which [[indexFeasibilitySummary]] /
    * [[AnnModels.ivfCentroidsGated]] exist to catch before the build.
    */
  /** Highest recall the measured table covers; targets above it return
    * the FULL-PROBE configuration (nprobe = cells), which is the
    * exact-equals-brute-force anchor ([[ivfSearchTopK]]'s spec-pinned
    * identity) — the only configuration that can honestly promise
    * recall 1.0.
    */
  val SuggestTableMaxRecall = 0.984

  def suggestIvf(nCorpus: Long, targetRecall: Double = 0.9): (Int, Int, Int) = {
    require(targetRecall > 0.0 && targetRecall <= 1.0, "targetRecall must be in (0, 1]")
    val cells = sqrtCells(nCorpus)
    val nprobe =
      if (targetRecall > SuggestTableMaxRecall) cells
      else if (targetRecall <= 0.86) 1
      else if (targetRecall <= 0.89) 2
      else if (targetRecall <= 0.93) 4
      else if (targetRecall <= 0.96) 8
      else 12
    (cells, 2, math.min(nprobe, cells).max(1))
  }

  /** Candidate set of the production IVF serve path: `queries` probe
    * their `nprobe` nearest cells and meet the (already spill-)
    * `assigned` corpus — (vec_id, v, cell_id), from [[ivfProbe]] with
    * the profile's spill — in a cell-keyed equi-join; each surviving
    * pair is scored with exact cosine and deduped (a spilled corpus
    * vector can meet a query through two shared cells). Output:
    * (qid, vec_id, cos), the frame both the top-k serve and the x106
    * recall/cost certification read. Self-pairs are excluded.
    *
    * Scale: the probe side is sample-sized and broadcasts; the join
    * carries spill * nprobe * |corpus| / cells rows per query —
    * with [[sqrtCells]] sizing, an O(sqrt(corpus)) fraction.
    */
  def ivfCandidates(
      assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      dim: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val probed = ivfProbe(queries, centroids, dim, nprobe, idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("cell_id").as("qcell"))
    assigned.join(broadcast(probed),
        col("cell_id") === col("qcell") && col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(cosineStatic(col("qv"), col(vecCol),
          norm(col("qv"), dim), norm(col(vecCol), dim), dim), 6).as("cos"))
      .dropDuplicates("qid", idCol)
  }

  /** Production ANN top-k: exact-cosine re-rank of [[ivfCandidates]],
    * ties to the lower id — the approximate twin of [[bruteForceTopK]]
    * (identical output schema: qid, vec_id, cos, rnk). When the probe
    * covers every cell the candidate set is the full corpus and this
    * EQUALS brute force (spec-pinned); narrower probes trade the
    * x106-measured recall for the measured candidate fraction.
    */
  def ivfSearchTopK(
      assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, dim: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    ivfCandidates(assigned, queries, centroids, dim, nprobe, idCol, vecCol)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Inverted lists of the composed IVF-PQ layout (the x112-certified
    * deployment format): the corpus spill-assigns into its cells and
    * each list entry carries the vector's PQ RECONSTRUCTION — at
    * deployment, m small codes plus a broadcast codebook table (the
    * 32x scan-bandwidth compression x110 certified), never the raw
    * vectors. Output: (idCol, cell_id, rv). Build once, serve many —
    * the lists are the serving index [[pqSearchTopK]] scans.
    *
    * Scale: the probe is the broadcast centroid join (map-side); the
    * encode is one broadcast codebook pass; the final join is id-keyed
    * between two corpus-sized frames that were both derived map-side.
    */
  def pqLists(
      corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      dim: Int, subDim: Int, spill: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame =
    ivfProbe(corpus, centroids, dim, spill, idCol, vecCol)
      .select(col(idCol), col("cell_id"))
      .join(pqReconstruct(pqEncode(corpus, codebooks, subDim, idCol, vecCol), codebooks, idCol),
        idCol)

  /** Composed IVF-PQ top-k serve — the first-class API of the x112
    * certification: probe the query's `nprobe` nearest cells, PQ-score
    * ONLY those cells' list entries (approximate cosine against the
    * reconstruction — candidate-bounded scan at compressed bandwidth),
    * keep the top `rerankR` per query, then re-rank those R survivors
    * with EXACT cosine against the raw `corpus` vectors. Output schema
    * is identical to [[ivfSearchTopK]] (qid, vec_id, cos, rnk) — `cos`
    * is the exact score, so a consumer can swap serve paths without a
    * schema change.
    *
    * Identity anchor (spec-pinned, the property x112 demonstrates at
    * R = 100): when `rerankR` covers every candidate the probe
    * generates, the shortlist IS the candidate set and the result is
    * row-identical to the exact IVF serve over the same `lists`
    * assignment — quantization then costs nothing and R is purely the
    * recall/bandwidth knob downward.
    *
    * Scale: the PQ pass touches spill * nprobe * N / cells rows per
    * query at code bandwidth; the exact pass touches rerankR * |Q|
    * rows of raw vectors (an id-keyed join — at 1B vectors this is
    * the only stage that reads float data, and it reads R rows per
    * query). Windows are rank-limited per qid (WindowGroupLimit —
    * nothing corpus-sized sorts).
    */
  def pqSearchTopK(
      lists: DataFrame, corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, rerankR: Int, dim: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    require(rerankR >= k, s"rerankR ($rerankR) must be >= k ($k): the exact pass can only return ids the shortlist kept")
    val probed = ivfProbe(queries, centroids, dim, nprobe, idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("cell_id").as("qcell"))
    val scored = lists.join(broadcast(probed),
        col("cell_id") === col("qcell") && col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(cosineStatic(col("qv"), col("rv"),
          norm(col("qv"), dim), norm(col("rv"), dim), dim), 6).as("acos"))
      .dropDuplicates("qid", idCol)
    val byApprox = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col(idCol))
    val shortlist = scored
      .withColumn("prk", row_number().over(byApprox))
      .filter(col("prk") <= rerankR)
      .select(col("qid"), col(idCol))
    exactRerankTopK(shortlist, corpus, queries, k, dim, idCol, vecCol)
  }

  /** Shared exact-re-rank tail of the composed serves: fetch the
    * shortlist's raw vectors by id, score with exact cosine against the
    * broadcast queries, keep the top k per query (ties to the lower id).
    * The only stage of a compressed serve that reads float data — R rows
    * per query.
    */
  private def exactRerankTopK(
      shortlist: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, dim: Int, idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val byExact = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    shortlist
      .join(corpus.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(q), "qid")
      .select(col("qid"), col(idCol),
        round(cosineStatic(col("qv"), col(vecCol),
          norm(col("qv"), dim), norm(col(vecCol), dim), dim), 6).as("cos"))
      .withColumn("rnk", row_number().over(byExact).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Pack [[pqEncode]]'s (id, subspace, code) rows into one
    * subspace-ordered code vector per id: (idCol, codes: array<smallint>)
    * — m small ids per vector, the on-disk PQ payload (codebookK <= 256
    * fits a byte per code; smallint is the parquet-friendly carrier).
    */
  def pqPackCodes(codes: DataFrame, idCol: String = "vec_id"): DataFrame =
    codes
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("subspace"), col("code")))),
        e => e.getField("code").cast("smallint")).as("codes"))

  /** Inverted lists in the DEPLOYABLE compressed layout: each list entry
    * carries the vector's m PQ CODES — not the reconstruction
    * ([[pqLists]]), and never the raw floats — so the index on disk and
    * the candidate scan are smaller by the full x110 compression factor
    * (~32x at the 64-float / 64-bit-code geometry). Output:
    * (idCol, cell_id, codes: array<smallint>). Serve with
    * [[pqSearchTopKCodes]], which rebuilds the scores from the broadcast
    * codebook via the standard per-query lookup table (ADC) instead of
    * reading reconstructed vectors.
    *
    * Scale: identical plan shape to [[pqLists]] (broadcast centroid
    * probe, one broadcast codebook encode pass, id-keyed join of two
    * map-side-derived corpus frames) — only the payload width changes.
    */
  def pqListsCodes(
      corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      dim: Int, subDim: Int, spill: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame =
    ivfProbe(corpus, centroids, dim, spill, idCol, vecCol)
      .select(col(idCol), col("cell_id"))
      .join(pqPackCodes(pqEncode(corpus, codebooks, subDim, idCol, vecCol), idCol),
        idCol)

  /** Flat slot index of a (subspace, code) pair in the ADC tables:
    * subspace * codebookK + code. Codebook cell ids are seeded 0..k-1 and
    * k-means only ever drops cells, so codes stay < codebookK and the
    * flat layout is dense-with-holes (a dropped code's slot is never
    * referenced — no vector encodes to a codeword that does not exist).
    */
  private def adcSlot(kMax: Int)(sub: Column, code: Column): Column =
    sub.cast("long") * kMax + code

  /** Per-query ADC lookup table: for each query, the m * codebookK flat
    * array of partial dot products between the query's subspace slices
    * and every codeword — the table asymmetric-distance search sums per
    * candidate instead of touching any stored vector. Query-sized x
    * (m * k) work, assembled map-side against the broadcast codebook.
    * Output: (qid, lutd: array<double>).
    */
  private def adcQueryLut(
      queries: DataFrame, codebooks: DataFrame, dim: Int, subDim: Int, kMax: Int,
      idCol: String, vecCol: String): DataFrame = {
    val m = dim / subDim
    val cb = codebooks.select(col("subspace"), col("cell_id").as("code"), col("cv"))
    val sl = slice(col("qv"), col("subspace") * lit(subDim) + lit(1), lit(subDim))
    queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cb))
      .select(col("qid"),
        adcSlot(kMax)(col("subspace"), col("code")).as("slot"),
        dotNative(sl, col("cv")).as("pd"))
      .groupBy(col("qid"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("pd")))).as("lm"))
      .select(col("qid"),
        transform(sequence(lit(0L), lit((m * kMax - 1).toLong)),
          i => coalesce(element_at(col("lm"), i), lit(0.0))).as("lutd"))
  }

  /** Query-independent codeword self-dot table (one row, m * codebookK
    * doubles): the reconstruction's squared norm decomposes as the sum of
    * its codewords' self-dots, so the candidate-side norm is m table
    * lookups too — no stored vector is ever read during the PQ pass.
    */
  private def adcNormTable(codebooks: DataFrame, dim: Int, subDim: Int, kMax: Int): DataFrame = {
    val m = dim / subDim
    codebooks
      .select(adcSlot(kMax)(col("subspace"), col("cell_id")).as("slot"),
        dotNative(col("cv"), col("cv")).as("nn"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("nn")))).as("nm"))
      .select(transform(sequence(lit(0L), lit((m * kMax - 1).toLong)),
        i => coalesce(element_at(col("nm"), i), lit(0.0))).as("lutn"))
  }

  /** [[pqSearchTopK]] over the compressed [[pqListsCodes]] layout: the
    * candidate scan reads m small codes per entry and scores them by
    * LUT/ADC — per query, the m * k sub-distance table
    * ([[adcQueryLut]]) is precomputed against the broadcast codebook and
    * each candidate's approximate cosine is m table lookups (plus m
    * norm-table lookups), never a stored vector read. The top `rerankR`
    * survivors re-rank with exact cosine against the raw `corpus`
    * exactly as before. Output schema identical to [[ivfSearchTopK]] /
    * [[pqSearchTopK]]: (qid, vec_id, cos, rnk).
    *
    * Score agreement with the reconstruction-based serve: the ADC sum
    * accumulates per-subspace partial dots (each a left-to-right fold)
    * in subspace order, where [[pqSearchTopK]] folds the full
    * reconstruction left-to-right — the same real-number value, with
    * float reassociation noise ~1e-16 between them, far below the
    * 6-decimal rounding both serve paths apply before any comparison
    * (spec-pinned row-identical on the fixtures). With `rerankR`
    * covering every candidate the x112 identity holds verbatim: the
    * shortlist IS the candidate set, so the result is row-identical to
    * the exact IVF serve regardless of approximate-score noise.
    *
    * Scale: the PQ pass touches spill * nprobe * N / cells CODE rows per
    * query (the ~32x bandwidth cut the layout buys); the broadcast side
    * per query is one (m * k)-double table instead of the query vector;
    * the exact pass and windows are unchanged from [[pqSearchTopK]].
    */
  def pqSearchTopKCodes(
      lists: DataFrame, corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: DataFrame,
      k: Int, rerankR: Int, dim: Int, subDim: Int, codebookK: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    require(rerankR >= k, s"rerankR ($rerankR) must be >= k ($k): the exact pass can only return ids the shortlist kept")
    require(dim % subDim == 0, s"dim ($dim) must be a multiple of subDim ($subDim)")
    val m = dim / subDim
    val probed = ivfProbe(queries, centroids, dim, nprobe, idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("cell_id").as("qcell"))
      .withColumn("qn", norm(col("qv"), dim))
      .join(adcQueryLut(queries, codebooks, dim, subDim, codebookK, idCol, vecCol), "qid")
      .select(col("qid"), col("qcell"), col("qn"), col("lutd"))
    // subspace-ordered lookup sums (left-to-right, matching the
    // reconstruction fold's subspace order); element_at is 1-based
    def lookupSum(table: Column): Column =
      (0 until m).map(sub =>
        element_at(table,
          lit(sub * codebookK + 1) + element_at(col("codes"), sub + 1).cast("int")))
        .reduce(_ + _)
    val scored = lists
      .join(broadcast(probed), col("cell_id") === col("qcell") && col(idCol) =!= col("qid"))
      .crossJoin(broadcast(adcNormTable(codebooks, dim, subDim, codebookK)))
      .select(col("qid"), col(idCol),
        round(lookupSum(col("lutd")) / (col("qn") * sqrt(lookupSum(col("lutn")))), 6)
          .as("acos"))
      .dropDuplicates("qid", idCol)
    val byApprox = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col(idCol))
    val shortlist = scored
      .withColumn("prk", row_number().over(byApprox))
      .filter(col("prk") <= rerankR)
      .select(col("qid"), col(idCol))
    exactRerankTopK(shortlist, corpus, queries, k, dim, idCol, vecCol)
  }

  /** Feasibility-gate threshold: a corpus is `indexable` when the
    * sample's median exact top-1 cosine EXCEEDS the isotropic
    * random-match line by at least this much. The excess is ADDITIVE
    * (not a ratio) and MEASURED, not a priori: cluster-structure top-1
    * cosine is a property of the geometry and N-independent, while the
    * line grows as sqrt(ln N) — so any fixed RATIO gate drifts with
    * corpus size (a 2x ratio gate read the r18 planted-cluster fixture
    * as non-indexable while the sqrt(N)/spill-2 index served it at
    * recall 1.000 from the narrowest probe). Measured excesses
    * (logs/ANNSWEEP_r18_*.log): isotropic -0.08 at BOTH N=2k and
    * N=20k (the median sits slightly below the extreme-value line, and
    * the deficit is scale-stable); planted clusters (within-cluster
    * cosine 0.67) +0.29 at N=2k and +0.23 at N=20k, served at recall
    * 1.000 (nprobe 4 / 11.9% scanned at 2k; nprobe 1 / 1.4% at 20k —
    * structure pays MORE at scale); the replicated sf1 fixture
    * +0.44 — and its duplicate groups ARE servable structure (measured
    * recall 0.992 at 1.5% scanned), so the positive verdict there is
    * correct, not an artifact. 0.15 sits between the isotropic and
    * every structured regime with headroom both ways.
    *
    * GRAY ZONE (measured r19, logs/ANNSWEEP_r19_gray{25,50,75}.log —
    * ClusterGen noiseFrac mixes a pure-noise row fraction into the
    * clustered 20k fixture): the median statistic is a MAJORITY vote,
    * and it transitions sharply — excess +0.21 at 25 % noise
    * (indexable, like the clean fixture's +0.23), -0.04 / -0.05 at
    * 50 % / 75 % (not indexable, like the pure-isotropic -0.08). No
    * measured mixture lands anywhere near the 0.15 line, so the
    * threshold stands un-moved. What the gray fixtures DO expose is a
    * per-population asymmetry the one-bit verdict cannot carry: a
    * MINORITY-noise query against a majority-clustered index is the
    * expensive tail (its true matches scatter across many clusters'
    * cells, so the probe correlation that saves pure-isotropic corpora
    * breaks — recall_min rows 0.0-0.4 at 25 % noise while the cluster
    * majority serves at 1.000). Budgeting for a mixed corpus should
    * therefore read the verdict as the majority population's regime
    * and treat the minority as paying the OTHER regime's floor. The
    * summary now CARRIES that statistic: `p10_top1` /
    * `tail_indexable` ([[indexFeasibilitySummary]]) are the p10 rank
    * twin of the median vote — a corpus whose median clears the line
    * while its p10 does not has a minority population in the other
    * regime, and [[regimeFloors]] / [[suggestIvfWithFloors]] turn the
    * two verdicts into the budgetable per-population floors.
    */
  val FeasibilityExcess = 0.15

  /** Lowest measured recall of the production (sqrt-cells, spill-2)
    * profile on a corpus the gate measured INDEXABLE — the replicated
    * sf1 fixture's 0.992 at 1.5 % scanned (every planted-cluster row
    * measured 1.000; see the [[suggestIvf]] doc's sweep table). The
    * clustered-regime budgeting anchor of [[regimeFloors]].
    */
  val ClusteredRecallFloor = 0.992

  /** Measured isotropic recall floor of the production profile at a
    * given nprobe — the N=2k sweep rows [[suggestIvf]] is sized from
    * (floors as N grows: every N=20k row measured above its 2k twin).
    */
  def isotropicRecallFloor(nprobe: Int): Double =
    if (nprobe >= 12) 0.984
    else if (nprobe >= 8) 0.968
    else if (nprobe >= 4) 0.930
    else if (nprobe >= 2) 0.896
    else 0.862

  /** Expected recall floors per population for a (possibly mixed)
    * corpus, read from the feasibility summary's TWO verdicts:
    * (majority floor, minority-tail floor). A uniform corpus (both
    * verdicts agree) pays one floor; a mixed one (median clears the
    * line, p10 does not — the r19 gray-zone regime) budgets its
    * minority at the OTHER regime's floor instead of discovering it in
    * production. CAVEAT (measured, gray sweep): a minority-NOISE
    * population inside a clustered majority can undershoot even the
    * isotropic line (recall_min 0.0-0.4 at 25 % noise — its true
    * matches scatter across many clusters' cells), so the returned
    * minority floor there is the budget line, not a guarantee; serving
    * that tail at target recall takes a wider probe or an exact
    * fallback for flagged queries.
    */
  def regimeFloors(
      nprobe: Int, medianIndexable: Boolean, tailIndexable: Boolean): (Double, Double) = {
    val majority = if (medianIndexable) ClusteredRecallFloor else isotropicRecallFloor(nprobe)
    val minority =
      if (tailIndexable == medianIndexable) majority
      else if (medianIndexable) isotropicRecallFloor(nprobe)
      else ClusteredRecallFloor
    (majority, minority)
  }

  /** [[suggestIvf]] plus the two regimes' expected floors:
    * (cells, spill, nprobe, majorityFloor, minorityFloor). Callers get
    * the same profile the sweep table sizes AND the per-population
    * budget the r19 gray-zone measurement showed the one-bit verdict
    * cannot carry.
    */
  def suggestIvfWithFloors(
      nCorpus: Long, targetRecall: Double,
      medianIndexable: Boolean, tailIndexable: Boolean): (Int, Int, Int, Double, Double) = {
    val (c, sp, np) = suggestIvf(nCorpus, targetRecall)
    val (maj, mino) = regimeFloors(np, medianIndexable, tailIndexable)
    (c, sp, np, maj, mino)
  }

  /** One-row summary of the x109 index-feasibility audit: does this
    * embedding corpus have the cluster structure an ANN index needs to
    * be sublinear? Measures the fixed sample's exact top-1 cosine
    * median (a DISCRETE rank statistic — engine-reproducible) against
    * the closed-form isotropic random-match line sqrt(2 ln N / d);
    * `indexable` = median >= line + [[FeasibilityExcess]]. The
    * per-query form is the x109 query; this summary is the BUILD-PATH
    * consumer
    * ([[AnnModels.ivfCentroidsGated]]): the measurement becomes the
    * decision, the x103 -> x108 pattern applied to index builds.
    *
    * Scale: one corpus scan against the broadcast fixed sample plus
    * sample-sized aggregates — the standard certification cost, paid
    * once per corpus (the caller persists the row as a model artifact).
    * Unlike x109's per-query form, the stats frame here has a SINGLE
    * consumer (the median rank window; the sample count comes from the
    * query frame itself), so no lineage cut is held — the summary
    * leaves no persisted blocks behind, which lets stream starts that
    * consult it pin zero-leak storage hygiene. Corpus must have >= 2
    * vectors (each sample query needs a non-self neighbour).
    */
  def indexFeasibilitySummary(
      corpus: DataFrame, dim: Int, sampleQ: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val q = corpus.filter(col(idCol) < sampleQ)
    // widen=false (round-21 A/B): one fixed-sample pass consumed by
    // sample-sized aggregates — the widen exchange measured NET slower
    // here (x109 0.80x, and x116's gated build pays it too).
    val top = bruteForceTopK(corpus, q, 10, idCol, vecCol, dim, widen = false)
    val perQ = top.groupBy(col("qid")).agg(
      max(when(col("rnk") === 1L, col("cos"))).as("top1_cos"))
    val nq = q.agg(count(lit(1)).as("n_q"))
    val n = corpus.agg(count(lit(1)).as("n_corpus"))
    val byTop1 = Window.orderBy(col("top1_cos"), col("qid"))
    // median = the majority vote; p10 = the minority-tail twin the r19
    // gray-zone sweep measured (a mixed corpus's minority population
    // lives in the other regime — see [[FeasibilityExcess]]). Both are
    // DISCRETE rank statistics over the same window.
    perQ
      .withColumn("rn", row_number().over(byTop1).cast("long"))
      .crossJoin(broadcast(nq))
      .agg(
        max(when(col("rn") === ceil(lit(0.5) * col("n_q")).cast("long"), col("top1_cos")))
          .as("median_top1"),
        max(when(col("rn") === ceil(lit(0.1) * col("n_q")).cast("long"), col("top1_cos")))
          .as("p10_top1"))
      .crossJoin(broadcast(n))
      .select(col("n_corpus"), col("median_top1"), col("p10_top1"),
        round(sqrt(lit(2.0) * log(col("n_corpus").cast("double")) / lit(dim.toDouble)), 6)
          .as("iso_baseline"))
      .withColumn("indexable",
        (col("median_top1") >= col("iso_baseline") + lit(FeasibilityExcess)).cast("int"))
      .withColumn("tail_indexable",
        (col("p10_top1") >= col("iso_baseline") + lit(FeasibilityExcess)).cast("int"))
  }

  /** Deterministic k-means training for IVF centroids: fixed iteration
    * count, deterministic seed set (caller-provided init vectors), and
    * decimal-quantized means, so the trained centroids — and therefore the
    * final cell assignment — are bit-reproducible on any engine, any
    * partitioning (the property that keeps x13 oracle-checkable with
    * TRAINED centroids, not just a corpus subset).
    *
    * Per iteration: (1) assign — broadcast the <=k centroid frame against
    * the corpus, keep each vector's best cell (highest cosine, ties to the
    * lower cell id); (2) update — per-(cell, dimension) mean via posexplode
    * + decimal-exact sum (x14's machinery: summation-order independent),
    * reassembled into centroid arrays with a deterministic sort. Shuffle
    * keys are (cell, dim) — k*dim groups regardless of corpus size; the
    * corpus itself never shuffles. Empty cells drop out (standard k-means).
    */
  def kmeansCentroids(
      corpus0: DataFrame, init: DataFrame, iters: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    // Round-21 widen (guide §2.5): EVERY training iteration's assign pass
    // re-reads this frame map-side, so a single-split local scan
    // serialized iters full corpus x cells scoring passes onto one task
    // (profiled in x112: ~1 s single-task jobs per iteration). Widened
    // once at entry — the probe runs once, the widen exchange replays
    // inside each iteration's job (corpus-sized bytes, trivial where this
    // fires), and at real scan width the whole thing is a no-op.
    val corpus = graft.util.Width.atLeastCores(corpus0)
    var cents = init.select(col(idCol).as("cell_id"), toDouble(col(vecCol)).as("cv"))
    // rolling release (the MLlib iteration pattern): once generation i+1
    // is eagerly materialized, generation i's blocks are dead weight —
    // without this a training loop leaves iters-1 stale model frames
    // persisted until driver GC. Only the loop's OWN cuts are released
    // (never the caller's init/corpus frames, whose lineage the first
    // generation still shares).
    var prevOwn: DataFrame = null
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(
        corpus, cents.select(col("cell_id").as(idCol), col("cv").as(vecCol)), dim, idCol, vecCol)
      cents = assigned
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "xf")))
        .select(col("cell_id"), col("pos"), col("xf").cast("double").as("xv"))
        .groupBy(col("cell_id"), col("pos"))
        .agg((sum(col("xv").cast("decimal(18,8)")).cast("double") / count(lit(1))).as("m"))
        .groupBy(col("cell_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("cv"))
        // Materialize the k-row model and cut its lineage (the MLlib
        // pattern): without this each iteration stacks assign+update onto
        // one growing DAG, and every downstream use of the centroids
        // replays the entire training history. The frame is k*dim values —
        // at any corpus scale this is a fixed-size model, not data.
        .transform(Checkpoints.cut)
      if (prevOwn != null) Checkpoints.unpersist(prevOwn)
      prevOwn = cents
    }
    cents
  }

  /** Product-quantization codebooks: split a `m * subDim`-dim vector into
    * `m` independent subspaces and train a deterministic k-means codebook
    * of `k` codewords per subspace ([[kmeansCentroids]] on the slice). A
    * vector is then representable as m small codes (log2 k bits each)
    * instead of `m * subDim` floats — with 64-dim float32 and m=4, k=8
    * that is 256 bytes -> 4 codes, the memory/bandwidth compression
    * behind billion-vector ANN indexes (IVF-PQ). Init per subspace = the
    * slices of the first k corpus ids, so the oracle can retrain the
    * identical codebooks in SQL (the x13 unrolled-k-means trick, once per
    * subspace). Returns (subspace, cell_id, cv).
    *
    * The m subspace models are mathematically independent, so training is
    * FUSED: one exploded (id, subspace, slice) frame advances every
    * codebook per iteration — one broadcast-join assignment, one
    * (subspace, cell, dim) decimal-mean update, one model checkpoint,
    * instead of m separate k-means DAGs (m-fold fewer jobs; x28 measured
    * 4.7 s -> ~1.5 s). Assignment math per subspace is identical to the
    * sequential form, so trained codebooks — and the oracle — are
    * unchanged. The (m * k)-row model is lineage-cut each iteration.
    */
  def pqCodebooks(
      corpus0: DataFrame, m: Int, subDim: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    require(m >= 1 && subDim >= 1 && k >= 1, "m, subDim, k must be >= 1")
    // Round-21 widen (guide §2.5): every training iteration's scoring
    // join + argmax window re-reads this frame map-side; a single-split
    // corpus scan serialized all m subspaces' training onto one task.
    val corpus = graft.util.Width.atLeastCores(corpus0)
    val sliced = corpus
      .select(col(idCol), explode(array((0 until m).map(sub =>
        struct(
          lit(sub).as("subspace"),
          slice(col(vecCol), sub * subDim + 1, subDim).as("sv"))): _*)).as("s"))
      .select(col(idCol), col("s.subspace").as("subspace"), col("s.sv").as("sv"))
    var cents = sliced.filter(col(idCol) < k)
      .select(col("subspace"), col(idCol).as("cell_id"), toDouble(col("sv")).as("cv"))
    // rolling release of the loop's own cut generations (see
    // kmeansCentroids — same pattern, same caller-frame safety rule)
    var prevOwn: DataFrame = null
    for (_ <- 0 until iters) {
      val scored = sliced.join(broadcast(cents), "subspace")
        .select(
          col(idCol), col("subspace"), col("cell_id"), col("sv"),
          round(
            cosineStatic(col("sv"), col("cv"), norm(col("sv"), subDim), norm(col("cv"), subDim), subDim),
            6).as("cscore"))
      val w = Window.partitionBy(col(idCol), col("subspace"))
        .orderBy(col("cscore").desc, col("cell_id"))
      val assigned = scored
        .withColumn("arnk", row_number().over(w))
        .filter(col("arnk") === 1)
        .select(col("subspace"), col("cell_id"), col("sv"))
      cents = assigned
        .select(col("subspace"), col("cell_id"), posexplode(col("sv")).as(Seq("pos", "xf")))
        .select(col("subspace"), col("cell_id"), col("pos"), col("xf").cast("double").as("xv"))
        .groupBy(col("subspace"), col("cell_id"), col("pos"))
        .agg((sum(col("xv").cast("decimal(18,8)")).cast("double") / count(lit(1))).as("m"))
        .groupBy(col("subspace"), col("cell_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("cv"))
        .transform(Checkpoints.cut)
      if (prevOwn != null) Checkpoints.unpersist(prevOwn)
      prevOwn = cents
    }
    cents.select(col("subspace"), col("cell_id"), col("cv"))
  }

  /** PQ encoding: each vector's nearest codeword per subspace (highest
    * rounded cosine, ties to the lower cell id — the [[ivfProbe]] rule, so
    * assignment is engine-reproducible). ONE broadcast pass scores every
    * (vector, subspace, codeword) triple against the m*k-row codebook
    * frame; the per-(vector, subspace) argmax is a rank-1 window, which
    * Spark executes with WindowGroupLimit (bounded per-group state — the
    * corpus never sorts). Output: (idCol, subspace, code).
    */
  def pqEncode(
      corpus0: DataFrame, codebooks: DataFrame, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    // Same round-21 widen as ivfProbe: the (vector, subspace, codeword)
    // scoring pass is map-side compute over the corpus scan.
    val corpus = graft.util.Width.atLeastCores(corpus0)
    val cb = codebooks.select(col("subspace"), col("cell_id"), col("cv"))
    val sl = slice(col(vecCol), col("subspace") * lit(subDim) + lit(1), lit(subDim))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cb))
      .select(
        col(idCol), col("subspace"), col("cell_id"),
        round(cosineStatic(sl, col("cv"), norm(sl, subDim), norm(col("cv"), subDim), subDim), 6)
          .as("cscore"))
    val w = Window.partitionBy(col(idCol), col("subspace"))
      .orderBy(col("cscore").desc, col("cell_id"))
    scored
      .withColumn("arnk", row_number().over(w))
      .filter(col("arnk") === 1)
      .select(col(idCol), col("subspace"), col("cell_id").as("code"))
  }

  /** PQ reconstruction: codes -> the concatenation of their codewords, the
    * approximation target asymmetric-distance search scores against (the
    * query side stays uncompressed). Broadcast join on (subspace, code);
    * the full-dim vector reassembles with a deterministic subspace sort.
    */
  def pqReconstruct(codes: DataFrame, codebooks: DataFrame, idCol: String = "vec_id"): DataFrame =
    codes
      .join(
        broadcast(codebooks.select(col("subspace"), col("cell_id").as("code"), col("cv"))),
        Seq("subspace", "code"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("subspace"), col("cv")))),
        e => e.getField("cv"))).as("rv"))

  /** Shared single-pass bucket-pair generator: collect each bucket's
    * members ONCE (the self-join form evaluated the upstream projection on
    * both sides), drop buckets above `maxBucket`, and emit (m1, m2) member
    * pairs via a double explode. The cap is load-bearing at scale twice
    * over: it bounds the single collect_list aggregation row (an
    * unbounded hot bucket would otherwise OOM the task), and it is the
    * hot-key guard against one viral bucket emitting O(n^2) pairs — same
    * rationale as [[Dedup.ShingleDfCap]]. The explodes themselves pipeline
    * row-at-a-time, so peak memory is one bucket array, not bucket^2.
    * Callers using an oracle must mirror the cap (HAVING count <= cap).
    */
  def bucketMemberPairs(
      bucketed: DataFrame, bucketCol: String, member: Column, maxBucket: Int): DataFrame =
    bucketed
      .groupBy(col(bucketCol))
      .agg(collect_list(member).as("ms"))
      .filter(size(col("ms")) <= maxBucket)
      .select(explode(col("ms")).as("m1"), col("ms"))
      .select(col("m1"), explode(col("ms")).as("m2"))

  /** Bucket corpus vectors by LSH signature; same-bucket pairs are
    * near-neighbour candidates (verify with exact cosine downstream).
    * Single pass via [[bucketMemberPairs]]; buckets above `maxBucket`
    * are dropped (hot-bucket guard — for near-dup detection a bucket that
    * hot is an exact-dup cluster better handled by exact dedup first).
    */
  def lshBucketCandidates(
      corpus: DataFrame, bits: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "v",
      maxBucket: Int = Dedup.ShingleDfCap): DataFrame =
    bucketMemberPairs(
      // norms ride along in the bucket struct (computed once per vector,
      // map-side) so the verify stage is ONE native dot per candidate pair
      // instead of three interpreted HOF folds — for array<double> input
      // cosineStatic's op order (dot / (nA * nB), n = sqrt(self-dot)) is
      // IEEE-identical to the HOF cosine, so scores/hashes are unchanged.
      // For array<float> input the native dot widens each element BEFORE
      // multiplying (the HOF multiplied in float first), so float callers
      // (Multimodal.nearDupMedia) get the slightly MORE precise cosine —
      // last-ULP deltas, inside every caller's threshold tolerance
      corpus.select(
        col(idCol), col(vecCol),
        lshSignature(col(vecCol), bits, dim).as("bucket"),
        norm(col(vecCol), dim).as("nrm")),
      "bucket",
      struct(col(idCol).as("id"), col(vecCol).as("vec"), col("nrm").as("nrm")), maxBucket)
      .filter(col("m1.id") < col("m2.id"))
      .select(
        col("m1.id").as("id1"), col("m2.id").as("id2"),
        round(
          cosineStatic(col("m1.vec"), col("m2.vec"), col("m1.nrm"), col("m2.nrm"), dim),
          6).as("cos"))
}
