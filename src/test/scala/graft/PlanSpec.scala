package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical-plan hygiene assertions — the properties that make these
  * queries survive a 100x scale-up, pinned as tests so a refactor that
  * silently de-optimizes a plan (lost pushdown, lost broadcast, lost
  * map-side combine) fails loudly.
  */
class PlanSpec extends AnyFunSuite with Matchers with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Final adaptive plan: AQE re-plans joins from runtime sizes (the scale-
    * correct broadcast decisions are AQE's, not hardcoded hints), so these
    * assertions execute the query and read the final plan.
    */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection push into the parquet scan") {
    val p = plan("q02_filter_sort_limit")
    p should include("PushedFilters: [IsNotNull(p_size), GreaterThanOrEqual(p_size,30)")
    // Column pruning: the scan must read only the needed columns.
    p should include("ReadSchema")
    p should not include "p_brand"
  }

  test("q01: aggregation is partial then final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    p should include("partial_")   // partial aggregate functions present
    p should include("HashAggregate")
  }

  test("q03: AQE converts the small filtered sides to broadcast at runtime") {
    val p = finalPlan("q03_join_agg_topk")
    p should include("BroadcastHashJoin")
  }

  test("q04/q05: semi and anti joins go broadcast under AQE at test scale") {
    val p4 = finalPlan("q04_semi_join")
    p4 should include("LeftSemi")
    p4 should include("BroadcastHashJoin")
    finalPlan("q05_anti_join") should include("LeftAnti")
  }

  test("q06: selective filters reach the lineitem scan") {
    val p = plan("q06_selective_sum")
    // (plan toString elides long filter lists; match the stable prefix)
    p should include("PushedFilters: [IsNotNull(l_shipdate)")
    p should include("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate")
  }

  test("r04: voxel aggregate broadcasts the 1-row min, keeps hash aggregation") {
    val p = plan("r04_voxel_subsample")
    p should include("BroadcastNestedLoopJoin") // 1-row mins x points, no shuffle of points
    p should include("HashAggregate")
  }

  test("x03: exact dedup shuffles on the content hash, not the text") {
    val p = plan("x03_exact_dedup")
    p should include("md5")
    p should include("HashAggregate")
  }

  test("x04: pair generation is an equi join on the shingle (no nested-loop pair join)") {
    val p = plan("x04_ngram_jaccard_pairs")
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x09: near-dup is LSH-bucketed — no quadratic nested-loop pair join") {
    val p = finalPlan("x09_embedding_neardup")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q21: KMV sketch aggregates one-pass via ObjectHashAggregate, no distinct expand") {
    val p = plan("q21_sketch_agg")
    p should include("kmin_values")
    p should include("ObjectHashAggregate")
    p should not include "Expand" // the exact-distinct rewrite never appears
  }

  test("x08: cosine top-k uses the native vector_dot expression, queries broadcast") {
    val p = plan("x08_cosine_topk")
    p should include("vectordot")
    p should include("Broadcast")
  }

  test("r07: polygon-crop bbox conjuncts reach the parquet scan; ray cast stays codegen'd") {
    val p = plan("r07_polygon_crop")
    // The bbox pre-filter must push to the scan so row groups outside the
    // polygon's envelope are pruned before any per-edge arithmetic.
    p should include("PushedFilters: [IsNotNull(l_extendedprice), IsNotNull(l_quantity)")
    p should include("GreaterThanOrEqual(l_extendedprice,10000.0)")
    // The unrolled even-odd predicate is plain arithmetic — the Filter sits
    // inside a whole-stage-codegen span (the `*(n)` prefix in the final
    // adaptive plan), not in a UDF island.
    val fp = finalPlan("r07_polygon_crop")
    fp should include regex """\*\(\d+\) Filter"""
    fp should not include "UDF"
  }

  test("q20: percentiles run histogram-refine (hash aggs + tiny windows), no percentile buffer agg") {
    val p = finalPlan("q20_percentiles")
    // The scale-unsafe shape this replaces was an ObjectHashAggregate over
    // `percentile(...)` — a per-group value->count map in executor memory.
    // Histogram-refine: data-sized stages are HashAggregates (bin counts);
    // windows (bin cumsum + candidate re-rank) touch only per-group bins
    // and ~n/10k candidate rows.
    p should include("HashAggregate")
    p should include("Window")
    p should include("row_number")
    p should not include "percentile("
  }

  test("x01/x16: native text expressions stay inside whole-stage codegen") {
    // PolyHash/SimHash64/WordShingles implement doGenCode — the Project
    // evaluating them must carry the `*(n)` whole-stage-codegen prefix. A
    // CodegenFallback regression would print the node without it (and
    // de-codegen the entire enclosing stage).
    def exprLineCodegend(planStr: String, expr: String): Boolean =
      planStr.linesIterator.exists(l => l.contains(expr) && l.matches(""".*\*\(\d+\) \w+.*"""))
    exprLineCodegend(finalPlan("x01_text_stats"), "polyhash") shouldBe true
    exprLineCodegend(finalPlan("x16_simhash64"), "simhash64") shouldBe true
  }

  test("x18: PII scrub is map-only — no exchange before the final order") {
    val p = plan("x18_pii_scrub")
    // one rangepartitioning exchange for the ORDER BY, nothing else
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
    p should include("rangepartitioning")
  }

  test("x22: LM scoring joins on the token hash-side, total is a broadcast") {
    val p = finalPlan("x22_unigram_logprob")
    p should include("BroadcastExchange") // the 1-row total
    p should include("HashAggregate")     // vocab counts with partial agg
    p should not include "CartesianProduct"
  }

  test("x21: quantization stats broadcast; only the tiny query set nested-loops") {
    val p = finalPlan("x21_quantized_topk")
    p should include("BroadcastExchange")
    // any BNLJ line must be the 5-row query-side broadcast, never the corpus
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => l should include("BuildRight"))
  }

  test("top-k windows get WindowGroupLimit (bounded per-group heaps, not full sorts)") {
    // Declarative rank-filter shapes let Catalyst insert WindowGroupLimit:
    // each group retains only k rows before the sort — the free scale win
    // a hand-scheduled top-k would have to reimplement. Pin it so a
    // refactor to a shape the rule can't see fails loudly.
    Seq("x08_cosine_topk", "q07_window_topn", "x13_ann_ivf", "x21_quantized_topk").foreach { q =>
      withClue(q) { plan(q) should include("WindowGroupLimit") }
    }
  }

  test("q23: sessionization is ONE data shuffle — window and both aggs reuse the user partitioning") {
    val p = plan("q23_sessionize_batch")
    // The user_id window shuffles once; groupBy(user_id, session_id) and
    // groupBy(user_id) are both satisfied by hashpartitioning(user_id)
    // (partitioning exprs subset of clustering), so no further hash
    // exchange — only the presentation sort's range exchange remains.
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("user_id")
    p should include("Window")
  }

  test("q27: session windows aggregate partially before the user shuffle") {
    val p = plan("q27_session_window")
    // Spark's native session-window pipeline: partial session agg,
    // ONE exchange keyed on user_id, then the spillable sort + merge.
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("session_window")
    p should include("partial_")
  }

  test("x42: burst dedup is one (user, type) shuffle; the gap filter needs no second pass") {
    val p = plan("x42_burst_dedup")
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("event_type")
    p should include("Window")
  }

  test("r10: DEM raster is one scan + one partial/final hash aggregate") {
    val p = plan("r10_dem_raster")
    // All six statistics bands (incl. idw and stdev from decimal sums)
    // compute in a single partial+final aggregate over the cell key —
    // shuffle volume ~#cells. The only other exchange is the
    // presentation sort's range partitioning.
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("partial_")
    p should include("HashAggregate")
  }

  test("q31: attribution join hash-joins on the user key; time bound is a residual") {
    // The equi key (user_id) must be the join key — a BETWEEN-only plan
    // would nested-loop. RewriteRangeJoin deliberately skips equi-keyed
    // joins, so this pins that the planner's hash path is what runs.
    val p = finalPlan("q31_attribution")
    p should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[v_user"""
    p should not include "BroadcastNestedLoopJoin"
    // event_type filters reach the parquet scan
    p should include("PushedFilters: [IsNotNull(event_type)")
  }

  test("x26: pipeline stages are hash-shuffles, never data-sized nested loops") {
    val p = plan("x26_dedup_pipeline")
    p should not include "CartesianProduct"
    // label propagation + LSH stage joins are all equi (hash/sort-merge);
    // the only BNLJ-free requirement: no join line carries the text column
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => l should not include "text")
  }

  test("x94: two hash exchanges, broadcast-only blocklist, pushed scan") {
    // The domain gate's scale contract: per-row URL/domain algebra fuses
    // into the scan; aggregation is (domain, canon) -> (domain), each
    // with map-side combine — exactly two corpus-sized hash shuffles (a
    // third exchange is the final ORDER BY's range partitioning); the
    // blocklist joins as a broadcast, never shuffling the corpus on it.
    // Static plan, not finalPlan: AQE's final string re-prints exchanges
    // inside materialized query stages, double-counting them.
    val p = plan("x94_domain_gate")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") should be <= 2
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should include("partial_") // map-side combine on the (domain, canon) stage
  }

  test("x96: fingerprint-span sweep is equi-join only, no pair cross space") {
    // Localization must keep x95's candidate discipline: the bench x
    // train pairing comes ONLY from the 8-byte gh equi-join (hash or
    // sort-merge, both key-partitioned) — any nested-loop/cartesian
    // shape would be the doc-pair cross space the operator exists to
    // avoid.
    val p = plan("x96_contamination_spans")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x97: allocation joins broadcast; no corpus-keyed nested loop") {
    // The materializer's scale contract: the dimension-sized allocation
    // table reaches the ranked corpus via broadcast (never shuffling
    // the corpus on source for a 20-row join), and nothing in the
    // ranking decomposition degenerates to a cross product.
    val p = plan("x97_epoch_mix_materialize")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x98: scrub is equi-joins only; token mark never goes nested-loop") {
    // The rewrite's scale contract: the fingerprint sweep and the token
    // marking are both doc/hash-keyed equi-joins (the BETWEEN on spans
    // is a residual over a doc_id equi key, not a join condition on its
    // own) — no cross space anywhere in the pipeline.
    val p = plan("x98_decontamination_scrub")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // The rebuild is implicated-docs-only: scrubSpans prunes the corpus
    // with a left_semi against the span ids BEFORE tokenizing, so the
    // plan carries TWO LeftSemi joins (prune + token mark). One would
    // mean the prune regressed and the collect_list aggregate is back
    // to shuffling the full corpus token stream (the r15 scale defect).
    val semis = p.linesIterator.count(_.contains("LeftSemi"))
    semis should be >= 2
  }

  test("x100: byte scrub keeps the implicated-only prune and equi-join discipline") {
    // Same contract as x98 plus the byte path: the segment explode and
    // rebuild run over the left_semi-pruned implicated slice (two
    // LeftSemi joins: prune + segment mark), and nothing in the
    // sweep/mark/rebuild goes nested-loop or cartesian.
    val p = plan("x100_byte_scrub")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p.linesIterator.count(_.contains("LeftSemi")) should be >= 2
  }

  test("x101: span char offsets are equi-joins over the pruned slice") {
    val p = plan("x101_span_offsets")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p.linesIterator.count(_.contains("LeftSemi")) should be >= 2
  }

  test("x102: recall audit — truth is broadcast-sample brute force, no cartesian") {
    // The certification sample must ride as the BROADCAST side of both
    // the truth scan and the probe join; the hit join is an equi-join.
    // A CartesianProduct here means the sample stopped broadcasting and
    // the audit became corpus x corpus.
    val p = finalPlan("x102_ann_recall")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // the brute truth scan (corpus x broadcast sample)
    p should include("WindowGroupLimit")        // top-k windows are rank-limited, never full sorts
  }

  test("x103: calibration pairs come from the banded equi-join, never all-pairs") {
    val p = plan("x103_minhash_calibration")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x104: soft-dedup weights are hash aggregates on the cluster key") {
    // The size agg and the two-phase argmax must stay codegen'd hash
    // aggregation (a struct-typed min/max silently plans a SortAggregate
    // — the x66 trap); the cluster machinery stays equi-join only.
    val p = plan("x104_soft_dedup_weights")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "SortAggregate"
    p should include("HashAggregate")
  }

  test("x105: fusion arms end in TakeOrdered depth caps, no cartesian pair space") {
    // Each arm must reach its depth-50 cap via TakeOrdered (never a full
    // global sort); the only nested-loop joins are the scalar-total
    // broadcasts (BM25 totals, the 1-row query vector).
    val p = plan("x105_rrf_fusion")
    p should not include "CartesianProduct"
    p should include("TakeOrderedAndProject")
  }

  test("x106: production ANN profile keeps x102's audit shape with spill assignment") {
    // Same discipline as x102 — the sample broadcasts into the truth scan
    // and the probe join (the only nested-loop joins allowed), candidate
    // generation is the cell-keyed equi-join, and every top-k window is
    // rank-limited. A CartesianProduct means corpus x corpus.
    val p = finalPlan("x106_ann_recall_prod")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // brute truth: corpus x broadcast sample
    p should include("WindowGroupLimit")
  }

  test("x107: multi-query fusion — postings sliced semi-join, rank-limited windows") {
    // The lexical arm must slice postings to the selected terms BEFORE
    // the tf shuffle (LeftSemi against the broadcast term set), every
    // per-qid top-k window must be rank-limited, and the only
    // nested-loop joins are the broadcast scalar totals / query sample.
    val p = plan("x107_rrf_multiquery")
    p should not include "CartesianProduct"
    p should include("LeftSemi")
    p should include("WindowGroupLimit")
    p should include("HashAggregate")
  }

  test("x108: calibration pairs from the banded equi-join; scalar-only nested loops") {
    // Candidates must come from x06's banded machinery (equi-join on
    // band keys, never all-pairs); the only nested-loop join is the
    // 1-row chosen_k broadcast onto the 3-row table.
    val p = plan("x108_calibrated_widths")
    p should not include "CartesianProduct"
    p should include("HashAggregate")
  }

  test("x109: feasibility audit is one broadcast-sample corpus scan") {
    // The per-query stats frame is lineage-cut (three consumers), so the
    // final plan shows only the tail: every join there must be a 1-row
    // scalar broadcast (n_corpus, n_q, the median row), never a
    // cartesian. The brute scan's own shape (broadcast sample +
    // rank-limited window) is pinned by x102's finalPlan and the
    // ivfProbe isolation test below — same operator.
    val p = finalPlan("x109_index_feasibility")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin")
  }

  test("x110: shortlist and re-rank windows are rank-limited; no cartesian") {
    // The PQ-approx frame is lineage-cut (feeds both depth arms); the
    // visible tail must keep the per-qid shortlist/re-rank windows
    // rank-limited and join the shortlist back to the corpus by id.
    val p = finalPlan("x110_pq_rerank_recall")
    p should not include "CartesianProduct"
    p should include("WindowGroupLimit")
  }

  test("x111: weighted materialization serves broadcast allocation joins, no corpus sort") {
    // x97's discipline applied to the soft-dedup consumer: the
    // catalog-sized stratum allocation reaches the ranked rep frame via
    // broadcast hash join (the quota windows ran once inside the cut
    // generation), and the rank decomposition never degenerates to a
    // cross product or a single-partition corpus window.
    val p = finalPlan("x111_weighted_epoch_mix")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x112: composed serving scores PQ reconstructions over the cell equi-join only") {
    // The composition's scale contract: candidates come from the
    // broadcast-probe cell equi-join over the cut lists (which carry
    // reconstructions, not raw vectors); shortlist and re-rank windows
    // stay rank-limited; the only nested-loop join is the brute truth
    // scan (corpus x broadcast sample). A CartesianProduct means the PQ
    // scan went corpus-wide.
    val p = finalPlan("x112_ivfpq_rerank")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // brute truth only
    p should include("WindowGroupLimit")
  }

  test("x113: the shard plan stays map-only past the broadcast allocation join") {
    // x99's discipline on the weighted chain: after the catalog-sized
    // allocation broadcast, the epoch explode and shard hash fuse into
    // the scan — no new shuffle, no cartesian, no corpus sort.
    val p = finalPlan("x113_weighted_shard_plan")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x114: both staleness arms keep the x106 audit shape") {
    // Two index arms, one discipline: candidates from cell-keyed
    // equi-joins over the cut assignments, rank-limited windows, the
    // broadcast-sample truth scan as the only nested-loop join.
    val p = finalPlan("x114_stale_index_recall")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // brute truth only
    p should include("WindowGroupLimit")
  }

  test("x115: corrected-mass apportionment is catalog-sized past the rep frame") {
    // x63's discipline on the soft-dedup consumer: the cluster machinery
    // runs inside cut generations (ExistingRDD scans); the only file
    // scans left in the served plan are the doc_id-pruned documents
    // source lookups (one per attribution side — mass and raw each
    // broadcast their own build), pruned at the parquet reader, so at
    // 100 TB the attribution reads 120-row slices, not the table.
    val p = finalPlan("x115_weighted_temperature_mix")
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin")
    "FileScan parquet".r.findAllIn(p).size should be <= 2
    p should include("LessThan(doc_id,120)")
    p should not include "lineitem"
  }

  test("x117: corrected-mass IPF raking is corpus-free past the cell frame") {
    // x75's plan discipline over the corrected surface: the whole x104
    // chain AND the (lang, source) attribution live inside the cut
    // cell-mass generation, so the served plan reads only ExistingRDD
    // scans — both temperature marginals, the quota windows, and all
    // six raking half-rounds are dimension-sized, corpus-independent
    // work at any scale.
    val p = finalPlan("x117_ipf_mix_corrected")
    "FileScan parquet".r.findAllIn(p).size shouldBe 0
    p should include("ExistingRDD")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("x116: the trigger audit keeps the x106 serve shape") {
    // x114's stale arm + a one-row aggregate: candidates from the
    // cell-keyed equi-join over the cut assignment, rank-limited
    // windows, the broadcast-sample truth scan as the only nested-loop
    // join — the verdict costs one certification pass, never a
    // corpus x corpus scan.
    val p = finalPlan("x116_rebuild_trigger")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // brute truth only
    p should include("WindowGroupLimit")
  }

  test("ivfProbe: the assignment window itself gets WindowGroupLimit") {
    // The inner assignment window (row_number <= nprobe partitioned by
    // vec_id) ranks |corpus| x |cells| scored rows; without the group
    // limit every vector's candidate list is fully sorted — a per-vector
    // sort that surfaces at billion-vector scale. The x13/x25 pins above
    // only prove SOME window in the composed query got the limit; this
    // pins the operator in isolation.
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), ops.Similarity.toDouble(col("embedding")).as("v"))
    val cents = emb.filter(col("vec_id") < 16)
    val p = ops.Similarity.ivfProbe(emb, cents, 64, nprobe = 2)
      .queryExecution.executedPlan.toString
    p should include("WindowGroupLimit")
  }

  test("pqEncode: the per-(vector, subspace) assignment window gets WindowGroupLimit") {
    // Same rationale as the ivfProbe pin: encoding ranks |corpus| x m x k
    // scored rows; the rank-1 filter must bound per-group state or every
    // vector sorts its codeword candidates at billion-vector scale.
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = ops.Similarity.pqCodebooks(emb, m = 4, subDim = 16, k = 8, iters = 1)
    val p = ops.Similarity.pqEncode(emb, cb, subDim = 16)
      .queryExecution.executedPlan.toString
    p should include("WindowGroupLimit")
  }

  test("x30: chunking is map-only — the presentation sort is the only exchange") {
    val p = plan("x30_doc_chunk")
    p should include("Generate")  // posexplode of the chunk starts
    // tokenize -> sequence -> posexplode -> slice -> hash all fuse into the
    // scan; at 100 TB the chunker adds zero shuffles.
    "Exchange".r.findAllIn(p).size shouldBe 1
  }

  test("x31: BM25 df/totals broadcast; term filter precedes the tf shuffle") {
    val p = finalPlan("x31_bm25_topk")
    p should include("BroadcastHashJoin") // df-per-term joins broadcast
    // the explode's term filter must run before the (doc, term) aggregate:
    // the IN filter appears under Generate, not after the exchange
    p.indexOf("tok#") should be > 0
    p should not include "CartesianProduct"
  }

  test("x32: CDC merge is a single key-shuffle full-outer join") {
    val p = finalPlan("x32_cdc_merge")
    p should include("FullOuter")
    p should include("SortMergeJoin")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("x35: the data-sized cumulative window is bucket-partitioned, never a global sort") {
    val p = plan("x35_budget_select")
    // the corpus shuffles on the quality bucket (bounded partitions);
    // only the <= 1001-row bucket histogram may pass through a single
    // partition. A corpus-wide ORDER BY window would show the doc frame
    // exchanging into SinglePartition instead.
    p should include("hashpartitioning(bucket")
    p should include("Window")
  }

  test("x36: per-user stats re-join events via broadcast under AQE") {
    val p = finalPlan("x36_user_anomaly")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("x41: weighted sampling is map-side scoring + TakeOrdered — no corpus shuffle") {
    val p = plan("x41_weighted_sample")
    p should include("TakeOrderedAndProject")
    p should not include "Exchange hashpartitioning"
  }

  test("x44: substring dedup pairs via the window-hash equi-join, span merge per (pair, diagonal)") {
    val p = finalPlan("x44_substring_dedup")
    // pair generation is the capped bucket aggregate on the window hash —
    // never an all-pairs nested loop over documents
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    p should include("hashpartitioning(wh")
    // the islands merge partitions by (pair, diagonal) — no global Window
    p should include("hashpartitioning(id1")
  }

  test("x45: BPE rounds keep the corpus off the driver — pair-count shuffle + broadcast argmax") {
    val p = finalPlan("x45_bpe_merges")
    // per-round pair counting is a partial/final hash aggregate on the pair
    p should include("partial_")
    p should include("hashpartitioning(pair")
    // the chosen pair reaches the merge as a broadcast of a 1-ROW frame
    // (a keyless cross join by design — the broadcast side is the argmax
    // pick, so the "nested loop" is 1 x vocabulary); never an unbroadcast
    // cartesian shuffle
    p should include("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
  }

  test("x46: segmentation serves the persisted vocab — word join + per-doc agg, no retrain") {
    val p = finalPlan("x46_bpe_segment")
    // the merged vocabulary comes from the model store (a parquet scan of
    // the persisted table), so the serving plan has no per-round argmax
    // broadcasts — that is the training plan (x45)
    p should include("graft_models")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    // per-doc token totals aggregate with map-side combine on doc_id
    p should include("partial_")
    p should include("hashpartitioning(doc_id")
  }

  test("x47: semantic dedup — broadcast model assign, bucket-key shuffle, no all-pairs") {
    val p = finalPlan("x47_semantic_dedup")
    // cell assignment is the 16-row persisted model broadcast against the
    // corpus (the keyless cross join is 16 x corpus by design)
    p should include("graft_models")
    p should include("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
    // pair generation shuffles on the (cell, signature) sub-bucket key
    p should include("hashpartitioning(sb")
  }

  test("x48: DSIR — 256-bucket histogram, broadcast ratio table, TakeOrdered selection") {
    val p = finalPlan("x48_dsir_select")
    // bucket histogram and per-doc weights both combine map-side
    p should include("partial_")
    p should include("hashpartitioning(b#")
    p should include("hashpartitioning(doc_id")
    // the 256-row log-ratio table reaches the corpus as a broadcast join,
    // and selection is top-K, never a global sort
    p should include("BroadcastHashJoin")
    p should include("TakeOrderedAndProject")
  }

  test("x49: bigram LM — map-side bigram extract, vocab-sized score joins, 1-row totals broadcast") {
    val p = finalPlan("x49_bigram_lm")
    // bigrams come from an array transform in the scan projection — the
    // only per-doc shuffle is the final doc_id aggregate
    p should include("hashpartitioning(prev")
    p should include("hashpartitioning(doc_id")
    p should include("partial_")
    // the (tt, vv) totals reach the score table as a 1-row broadcast
    // (keyless by design); nothing data-sized cartesians
    p should include("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
  }

  test("x50: the served result is the checkpointed weight trajectory, corpus-free") {
    // training rounds materialize behind per-round localCheckpoints
    // (the kmeansCentroids lineage-cut), so the RESULT plan must be just
    // the union of 1-row model frames — no corpus scan, no data-sized
    // join or shuffle downstream of training
    val p = finalPlan("x50_quality_classifier")
    p should include("Union")
    p should not include "CartesianProduct"
    p should not include "parquet"
  }

  test("x51: the served ranks are the checkpointed vector + TakeOrdered, corpus-free") {
    // iterations materialize behind per-round localCheckpoints (the
    // Pregel superstep pattern), so the RESULT plan is a top-K over the
    // final node-sized rank vector — no re-derivation of the edge build
    val p = finalPlan("x51_pagerank")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
    p should not include "parquet"
  }

  test("x52: corpus never shuffles — bloom probe feeds broadcast-only confirm joins") {
    // the bloom prefilter must sit in the plan (map-only candidate cut),
    // and both confirm joins must broadcast the candidate-sized side so
    // the corpus scan stays exchange-free
    val p = finalPlan("x52_bloom_membership")
    p should include("bloom_might_contain")
    p should include("BroadcastHashJoin")
    p should include("LeftAnti")
    p should not include "SortMergeJoin"
  }

  test("x54: SCD2 history is ONE data shuffle — every window shares the user partitioning") {
    val p = plan("x54_scd2_history")
    // Ordering, lag change-detection, per-user totals, version numbering
    // and lead() close-off all partition by user_id alone; the change
    // filter between the two window passes preserves that distribution,
    // so the only other exchange is the presentation sort's range
    // partitioning.
    p.sliding("Exchange hashpartitioning".length).count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("user_id")
    p should include("Window")
  }

  test("x55: profiler is per-column two-phase — hash-agg histograms, no Expand") {
    val p = plan("x55_table_profile")
    // Round-20 shape: one column-pruned scan per profiled column (11
    // total — together the same bytes as one full-width scan), each
    // feeding a map-side-combined HASH aggregate on the column's values;
    // the old multi-distinct Expand (rows x columns replication with full
    // TEXTS in a SortAggregate grouping key) must stay gone.
    "FileScan parquet".r.findAllIn(p).size shouldBe 11
    p should not include "Expand"
    p should include("HashAggregate")
    p should include("partial_")
  }

  test("x60: sketch profiler keeps x55's one-scan-per-table but drops the Expand entirely") {
    val p = plan("x60_table_profile_sketch")
    // The KMV swap's whole point: the exact multi-distinct's rows x columns
    // Expand is gone — each row feeds bounded sketch updates inside ONE
    // ObjectHashAggregate pass per table (partials are k longs per column,
    // so a trillion-row profile moves O(partitions x columns x k) longs).
    "FileScan parquet".r.findAllIn(p).size shouldBe 2
    p should not include "Expand"
    p should include("ObjectHashAggregate")
    p should include("partial_")
  }

  test("x61: incremental components joins on node/component keys, no nested loops") {
    val p = finalPlan("x61_incremental_cc")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("component")
  }

  test("x62: served plan is corpus-free — counts are cut once, grid/pairs are dimension-sized") {
    val p = plan("x62_source_divergence")
    // The corpus-sized tokenize+count runs EXACTLY once, inside the
    // Checkpoints.cut in jsDivergenceMatrix; the served plan's four
    // consumers all read the materialized dimension-sized generation.
    // (This pin originally read `shouldBe 1` against an uncut build and
    // caught the corpus lineage replaying FOUR times.)
    "FileScan parquet".r.findAllIn(p).size shouldBe 0
    p should include("ExistingRDD") // the cut counts generation
    p should include("Window").or(include("HashAggregate"))
  }

  test("x63: served apportionment is corpus-free — weights cut once, windows dimension-sized") {
    val p = finalPlan("x63_temperature_mix")
    // Same shape: the per-source corpus count runs once inside the cut;
    // total-weight aggregate and quota windows read the 20-row generation.
    "FileScan parquet".r.findAllIn(p).size shouldBe 0
    p should include("ExistingRDD")
    p should include("Window")
  }

  test("x64: percent ranks come from the bucket decomposition, not a per-source sort") {
    val p = finalPlan("x64_quality_calibration")
    // The whole point of Ranks.groupPercentRank: the naive window
    // function never appears, and the data-sized window partitions on
    // the 1000x-finer (source, bucket) key.
    p should not include "percent_rank"
    p should include("_bkt")
    p should include("Window")
    // stats and histogram frames are dimension-sized broadcasts
    p should include("BroadcastHashJoin")
  }

  test("x65: held-out scoring is equi-joined on tokens; only the totals attach crosses") {
    // static plan for the count (the AQE toString repeats subtrees)
    val p0 = plan("x65_lm_holdout_filter")
    "BroadcastNestedLoopJoin".r.findAllIn(p0).size shouldBe 1 // the 1-row (tt, vv) attach
    val p = finalPlan("x65_lm_holdout_filter")
    p should not include "CartesianProduct"
    // the unseen-bigram floor rides on LEFT joins, not inner
    p should include("LeftOuter")
  }

  test("x66: representative selection is a cluster-key hash aggregate, no per-cluster window") {
    val p = finalPlan("x66_cluster_canonical")
    // the oracle picks reps via row_number() over each cluster; the
    // engine must use the two-phase max(quality)+min(doc_id) hash
    // aggregates (a struct min/max would plan as SortAggregate)
    p should not include "row_number"
    p should include("HashAggregate")
    p should not include "CartesianProduct"
  }

  test("x67: the kNN scan runs once (cut); the vote argmax serves corpus-free hash aggregates") {
    val p = plan("x67_knn_label_vote")
    // the train x eval cosine scan materializes inside the Checkpoints.cut
    // — its two vote consumers must read the generation, not replay it.
    // The eval side is the FIXED-COUNT hash sample (25 rows at any
    // corpus size — CorpusVersionSpec pins the count), so the broadcast
    // inside the scan is bounded, never corpus-proportional.
    p should include("ExistingRDD")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "SortAggregate"
  }

  test("x68: the cosine grid cuts once; ranks are group-limit-pruned windows") {
    val p = plan("x68_bitext_margin")
    p should include("ExistingRDD")      // the cut cross-language grid
    p should include("WindowGroupLimit") // top-k pruned before the full sort
    p should not include "SortAggregate"
  }

  test("x68b: candidates come from the IVF cell equi-join — no cartesian grid, no corpus broadcast") {
    // The generation stage (pre-cut — the served query hides it behind
    // the ExistingRDD): both cross joins broadcast the fixed-k persisted
    // centroid model (the x47 assignment shape), never a language corpus
    // — x68's corpus-sized Spanish broadcast is exactly what this plan
    // must NOT contain; the pair join itself is keyed on cell_id.
    val cand = ExtensionQueries.x68bCandidates(spark, dir)
    cand.collect()
    val g = cand.queryExecution.executedPlan.toString
    g should not include "CartesianProduct"
    g should include("graft_models")
    g should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[cell_id"""
    g should include("WindowGroupLimit") // probe/assignment ranks pruned
    // The served margin tail over the cut grid, as for x68:
    val p = plan("x68b_bitext_ann")
    p should include("ExistingRDD")
    p should include("WindowGroupLimit")
    p should not include "SortAggregate"
  }

  test("x69: per-source pick ranks come from the bucket decomposition, windows on (source, bucket)") {
    val p = finalPlan("x69_mix_materialize")
    p should include("_bkt")
    p should include("Window")
    p should include("BroadcastHashJoin") // allocs + histogram frames broadcast
    p should not include "CartesianProduct"
  }

  test("x70: the diff is a doc_id-keyed full outer join over hashes — no text through the join") {
    val p = finalPlan("x70_corpus_diff")
    p should include("FullOuter")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // only (doc_id, md5) reach the join: the projection drops `text`
    // before the shuffle, so 32-byte keys move, never document bodies
    "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findFirstIn(p) should not be empty
    // whichever join operator AQE/stats picked, it must not ship bodies
    // (checking only SortMergeJoin lines would pass vacuously if the
    // plan flipped to a broadcast/shuffled hash join)
    p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin"))
      .foreach(_ should not include "text")
  }

  test("x71: one map pass + one 9-key hash aggregate, no extra shuffles") {
    val p = plan("x71_padding_waste")
    p should include("HashAggregate")
    p should include("partial_")       // map-side combine before the 9-key exchange
    p should not include "SortAggregate"
    p should not include "Window"
    // exactly two exchanges: the aggregate's hash partitioning and the
    // final ORDER BY's range partitioning — nothing else shuffles
    "Exchange".r.findAllIn(p).size should be <= 2
  }

  test("x72: extraction is map-only — expressions fused into the scan, no shuffle but the sort") {
    val p = plan("x72_html_extract")
    p should not include "HashAggregate"
    p should not include "Join"
    p should not include "Window"
    // two exchanges: the round-21 core-width widen of the single-split
    // scan (RoundRobin — the extraction expressions are the heaviest
    // per-row work in the suite, a no-op at real corpus width) and the
    // final ORDER BY's range partitioning — the extraction itself still
    // never moves a payload byte between tasks beyond that widen
    "Exchange".r.findAllIn(p).size should be <= 2
    p should include("RoundRobinPartitioning")
    p should include("rangepartitioning")
  }

  test("x75: IPF iteration is corpus-free — cells cut once, rounds are dimension-sized") {
    val p = finalPlan("x75_ipf_mix")
    // the ONE corpus scan lives inside the Checkpoints.cut; all six
    // half-rounds (marginal aggregate + broadcast rescale join) read the
    // dimension-sized generation, so at 100 TB the iteration cost is
    // independent of corpus size
    "FileScan parquet".r.findAllIn(p).size shouldBe 0
    p should include("ExistingRDD")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("x73: canonicalization fuses into the scan — one hash aggregate, no joins") {
    val p = plan("x73_url_canonical")
    p should not include "Join"
    p should not include "Window"
    p should include("HashAggregate")
    p should include("partial_")       // map-side combine on canon_url
    // exactly two exchanges: the aggregate's hash partitioning and the
    // final ORDER BY's range partitioning
    "Exchange".r.findAllIn(p).size should be <= 2
  }

  test("x74: line df joins back by 8-byte hash — no line text through the df join") {
    val p = finalPlan("x74_line_dedup")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("HashAggregate")
    // the df side of the join carries (lh, line_df) only — a join line
    // shipping `line` would shuffle document text twice
    p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin"))
      .foreach(_ should not include "line#")
  }

  test("x76/x77: cluster-riding ops stay on x26's equi-join shapes — no nested loops") {
    Seq("x76_cluster_split", "x77_curation_funnel").foreach { q =>
      withClue(q) {
        val p = plan(q)
        p should not include "CartesianProduct"
        p should not include "BroadcastNestedLoopJoin"
      }
    }
    // x77's own stage windows (exact-hash and cluster group-min) sit
    // OUTSIDE the cut and partition on hash/cluster keys — one duplicate
    // group per partition, never a corpus-wide constant (x76's windows
    // live inside dupLabels' cut and are pinned by the x26 tests)
    val p77 = plan("x77_curation_funnel")
    p77 should include("Window")
  }

  test("x78: semantic mix serves from the cut assignment — bucket-decomposed picks, broadcast allocs") {
    val p = finalPlan("x78_semantic_mix")
    // the corpus-sized assignment pass lives inside the cut; the serve
    // side is the Ranks bucket decomposition (windows on (cell, bucket)
    // keys) plus the dimension-sized allocation broadcast
    p should include("ExistingRDD")
    p should include("_bkt")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("x79: dup-rate shuffles 8-byte gram hashes, never gram text; counts combine map-side") {
    val p = finalPlan("x79_dup_ngram_rate")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("partial_count")  // global occurrence count combines map-side
    // the occurrence join is keyed on the hash — no join line carries
    // the gram string column
    p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin"))
      .foreach { l => l should include("gh"); l should not include "g#" }
  }

  test("x80: served apportionment is corpus-free — excess-loss weights cut once") {
    val p = finalPlan("x80_doremi_mix")
    // x63's shape: the corpus-sized (source, token) count and the
    // vocab-sized LM join both live inside Checkpoints.cut; the served
    // plan reads the 20-row weighted generation and apportions with
    // dimension-sized windows.
    "FileScan parquet".r.findAllIn(p).size shouldBe 0
    p should include("ExistingRDD")
    p should include("Window")
    p should not include "CartesianProduct"
  }

  test("x81: fertility joins words against the vocab-sized merge table — no pair space") {
    val p = finalPlan("x81_bpe_fertility")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("partial_count") // per-lang aggregate combines map-side
    // the vocab side is the persisted model table (a pruned parquet scan
    // of the tiny merge table), broadcast — not a retrain DAG
    p should include("bpe_vocab")
    p should include("BroadcastHashJoin")
  }

  test("x82: zipf top-k is a WindowGroupLimit, regression sums are dimension-sized") {
    val p = finalPlan("x82_zipf_health")
    p should not include "CartesianProduct"
    // rank <= k pushes a per-partition limit below the window shuffle, so
    // a 1e8-type source ships k rows per map task, not its whole vocab
    p should include("WindowGroupLimit")
    p should include("ExistingRDD") // the (source, token) count is cut once
  }

  test("x83: cluster-size ledger serves from the cut histogram (propagation runs once)") {
    val p = finalPlan("x83_cluster_sizes")
    p should not include "CartesianProduct"
    // the histogram materializes once (it feeds both the total and the
    // join — uncut, the label propagation executed twice); the served
    // plan is the cut generation + the 1-row broadcast total
    p should include("ExistingRDD")
    "FileScan parquet".r.findAllIn(p).size shouldBe 0
  }

  test("x84: ccnet buckets rank via the bucket decomposition, not a per-lang sort") {
    val p = finalPlan("x84_ccnet_buckets")
    // x64's guarantee carried over: the naive window never appears and
    // the data-sized window partitions on the 1000x-finer (lang, bucket)
    p should not include "percent_rank"
    p should include("_bkt")
    p should not include "CartesianProduct"
  }

  test("x85: winnowing selects in the array domain — map-only, no shuffle but the sort") {
    val p = plan("x85_winnowing")
    // argmin + dedupe happen inside per-row array algebra; the plan has
    // no window, no aggregate, no join — rows only move for (a) the
    // conditional core-width widen of the single-split fixture scan
    // (RoundRobin, a no-op at real scan widths) and (b) the final ORDER BY
    p should not include "Window"
    p should not include "HashAggregate"
    p should not include "Join"
    "Exchange".r.findAllIn(p).size should be <= 2
    p should include("RoundRobinPartitioning")
    p should include("rangepartitioning")
  }

  test("x86: gopher rules are map-only — no shuffle but the final sort") {
    val p = plan("x86_gopher_rules")
    p should not include "HashAggregate"
    p should not include "Join"
    p should not include "Window"
    "Exchange".r.findAllIn(p).size should be <= 1
    p should include("rangepartitioning")
  }

  test("x87: c4 cleaning is map-only — no shuffle but the final sort") {
    val p = plan("x87_c4_clean")
    p should not include "HashAggregate"
    p should not include "Join"
    p should not include "Window"
    "Exchange".r.findAllIn(p).size should be <= 1
    p should include("rangepartitioning")
  }

  test("x88: confusion matrix is one tiny aggregate + a broadcast total") {
    val p = finalPlan("x88_langid_confusion")
    p should not include "CartesianProduct"
    p should include("partial_count")
    p should include("BroadcastHashJoin")
  }

  test("x89: outlier ranks come from the bucket decomposition; centroids broadcast") {
    val p = finalPlan("x89_semantic_outliers")
    p should not include "percent_rank"
    p should include("_bkt")
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin") // the k-row centroid model attaches broadcast
  }

  test("x90: novelty joins on 8-byte gram hashes, never gram text") {
    val p = finalPlan("x90_novelty_score")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("partial_count")
    p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin"))
      .foreach { l => l should include("gh"); l should not include "text" }
  }

  test("x91: drift assigns via broadcast centroids; everything after is cell-sized") {
    val p = finalPlan("x91_semantic_drift")
    p should not include "CartesianProduct"
    p should include("partial_count") // both version counts combine map-side
    // the x13 assignment shape: the k-row centroid model attaches via a
    // broadcast nested-loop cross (every vector scores all k), never a
    // data-sized cartesian
    p should include("IdentityBroadcastMode")
  }

  test("x92: taint propagates via cluster-keyed max + join back, no pair space") {
    val p = finalPlan("x92_taint_propagation")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("partial_max") // the cluster flag combines map-side
    p should include("ExistingRDD") // the cut corpus
  }

  test("x56: component serving joins sizes on the component key, no nested loops") {
    val p = finalPlan("x56_connected_components")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("component")
  }

  test("x57: the gap grid is per-key sequence-explode, fill window on the key partition") {
    val p = plan("x57_gap_fill")
    // The dense grid comes from each key's own [min, max] span — never a
    // calendar-dimension cross join — and the forward fill partitions by
    // the series key (a global window would serialize the whole corpus).
    p should include("Generate explode(sequence")
    p should include("windowspecdefinition(key")
    p should include("last(")
    p should not include "CartesianProduct"
  }

  test("x58: triangle sampling filters before the wedge machinery, pair build runs once") {
    val p = finalPlan("x58_triangle_sample")
    // Round-20 shape: the DOULION-sampled pair list is materialized ONCE
    // (Checkpoints.cut — the hash coin and the collect_set pair explosion
    // run in that build job, upstream of everything pinned here), so the
    // serve plan must consume the cut (ExistingRDD scans), derive degrees
    // map-side from ONE pass (explode of both endpoints, no two-branch
    // union re-running the chain), and must NOT re-run the pair build.
    p should include("Scan ExistingRDD")
    p should include("Generate explode(array(s1")
    p should not include "collect_set"
    p should not include "polyhash"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x59: prefix join's rarity sort is a per-doc window; candidate join is an equi-join") {
    val p = plan("x59_prefix_join")
    // The global-rarity order must come from the (df, token) tuple inside a
    // doc-partitioned window — never a global rank sort — and candidates
    // from a token equi-join, never a nested-loop pair scan.
    p should include("windowspecdefinition(doc_id")
    p should include("row_number")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("entry: flagship query produces rows at sf0.001 (driver smoke)") {
    SparkEntry.entry(spark).limit(5).count() should be > 0L
  }
}
