package graft.tools

import java.nio.file.{Files, Paths}

import graft.{ExtensionQueries, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}

/** Sampled oracle verification at probe scales the FULL DuckDB oracle
  * cannot afford (sf100 = 1000x the driver fixture): run each
  * scale-sensitive query in Spark, keep a deterministic key-slice of its
  * OUTPUT, re-sort by every column (the slice breaks the query's own
  * ORDER BY guarantee), and dump the same artifacts `graft.Verify` does —
  * result parquet + oracle_sql.json with the oracle wrapped in the
  * identical slice + `ORDER BY ALL NULLS FIRST` — so `tools/check.py`
  * performs its usual row-exact compare, now against outputs both
  * engines computed at 1000x.
  *
  * This closes the round-5 "correct at 1000x, not just fast" gap: the
  * DuckDB side still executes the full query (correctness is end to
  * end), but compare/sort/dump cost is slice-sized. Queries with LIMIT-
  * bounded outputs keep their full output and their own ordering.
  */
object ScaleVerify {

  /** (query, output slice predicate — identical SQL text in both
    * engines; None = output is small/LIMIT-bounded, compare all rows).
    */
  val Family: Seq[(String, Option[String])] = Seq(
    "q01_pricing_summary" -> None,
    "q20_percentiles" -> None,
    "q22_star_join" -> None,
    "q24_range_join" -> Some("iid % 97 = 0"),
    "r04_voxel_subsample" -> Some("(vx * 31 + vy * 7 + vz) % 97 = 0"),
    "x09_embedding_neardup" -> Some("id1 % 7 = 0"),
    "x13_ann_ivf" -> None,
    "x26_dedup_pipeline" -> Some("keep_id % 97 = 0"),
    "x35_budget_select" -> Some("doc_id % 97 = 0"),
    "x47_semantic_dedup" -> Some("removed_id % 97 = 0"),
    // Event-time family (restored in round 8 after the NTZ fixture drift):
    // sessions and windows are where 100 TB event data actually lives.
    "q23_sessionize_batch" -> Some("user_id % 97 = 0"),
    "q27_session_window" -> Some("user_id % 97 = 0"),
    "q31_attribution" -> Some("purchase_id % 97 = 0"),
    "x42_burst_dedup" -> Some("event_id % 97 = 0"),
    // Text family representative: per-doc token statistics at 50M docs.
    "x19_repetition" -> Some("doc_id % 997 = 0"),
    // Raster family (round 8): cell count is resolution-bound — the
    // replicated fixture multiplies per-cell n 1000x but not the grid,
    // so the full output compares (and the decimal sums must stay exact
    // through 1000x more addends per cell).
    "r10_dem_raster" -> None,
    // Warehouse + series/motif family (round 8 additions):
    "x54_scd2_history" -> Some("user_id % 97 = 0"),
    "x55_table_profile" -> None,
    // x60's oracle reproduces the KMV sketch via DISTINCT+sort+kth —
    // linear work for DuckDB at any scale, unlike the closure oracles.
    "x60_table_profile_sketch" -> None,
    "x57_gap_fill" -> Some("user_id % 97 = 0"),
    // x58's node set is dimension-bounded (suppliers), output compares whole.
    "x58_triangle_sample" -> None,
    // x62/x63 outputs are source-pair / source sized (dimension-bounded).
    // x62's oracle tokenizes + char-folds the whole corpus in SQL — fine
    // to sf1/sf10; at sf100 prefer the engine-side timing alone.
    "x62_source_divergence" -> None,
    // x62s is x62's sf100 gate: the shared 1-in-16 token-hash pre-filter
    // cuts the oracle's unnest volume 16x, so the row-exact compare runs
    // where full x62's cannot (round-11 advice #6).
    "x62s_divergence_slice" -> None,
    "x63_temperature_mix" -> None,
    // x64 output is corpus-sized (one row per doc) — slice like x19;
    // the oracle's per-source window sort is linear-ish DuckDB work.
    "x64_quality_calibration" -> Some("doc_id % 997 = 0"),
    // x65 output is held-out-doc-sized (~20% of corpus).
    "x65_lm_holdout_filter" -> Some("doc_id % 97 = 0"),
    // x66 shares x26's capped engineered corpus — output is 240 rows.
    "x66_cluster_canonical" -> None,
    // x67's output is now fixed-count (25 eval rows) — compare whole;
    // the oracle's train-side cosine scan is (25 x corpus), linear.
    "x67_knn_label_vote" -> None,
    // x68 output is en-side-sized; the oracle's cross-language cosine
    // grid is (en x es) — fine at sf1 (~21k x 7k), engine-only beyond.
    "x68_bitext_margin" -> Some("en_id % 97 = 0"),
    // x69 output is budget-bounded (200 rows).
    "x69_mix_materialize" -> None,
    // x68b's oracle retrains the IVF model in SQL (corpus x 16 scoring,
    // the x13 cost) and scores only the cell-pruned candidates — linear,
    // unlike x68's full grid, so it sweeps wherever x13 does.
    "x68b_bitext_ann" -> Some("en_id % 97 = 0"),
    // x70 output is corpus-sized (one row per doc across both versions).
    "x70_corpus_diff" -> Some("doc_id % 97 = 0"),
    // x71 output is 9 buckets — compare whole.
    "x71_padding_waste" -> None,
    // x72 output is corpus-sized (one row per doc).
    "x72_html_extract" -> Some("doc_id % 97 = 0"),
    // x73 output is dimension-bounded (the synthesized canonical-URL
    // space is sources x id-residues, ~2k rows at any scale) — compare
    // whole; map+agg both engines, linear everywhere.
    "x73_url_canonical" -> None,
    // x75 output is (langs x sources)-sized; the oracle is one corpus
    // count + dimension-sized CTEs — linear everywhere.
    "x75_ipf_mix" -> None,
    // x76 rides x26's capped engineered corpus — output is 240 rows.
    "x76_cluster_split" -> None,
    // x77 shares the same corpus/cluster CTEs — output is 4 funnel rows.
    "x77_curation_funnel" -> None,
    // x78 output is budget-bounded (500 rows); the oracle retrains the
    // IVF index in SQL (the x13 cost) — sweeps wherever x13 does.
    "x78_semantic_mix" -> None,
    // x79 output is source-sized; both engines are one positional-gram
    // explode + two hash aggregates — linear, like x62's shape but
    // without the dense-grid tail.
    "x79_dup_ngram_rate" -> None,
    // x80 output is source-sized; both engines are one (source, token)
    // count + vocab-sized LM join + dimension-sized weight/quota CTEs.
    "x80_doremi_mix" -> None,
    // x81 output is lang-sized; the oracle re-runs the x45/x46 BPE CTE
    // chain (vocab-sized rounds) — sweeps wherever x46's does.
    "x81_bpe_fertility" -> None,
    // x82 output is source-sized; the oracle's window is per-source
    // vocab (QUALIFY top-k) — linear like x23's shape.
    "x82_zipf_health" -> None,
    // x83 rides x26's capped engineered corpus — output is a handful of
    // histogram rows.
    "x83_cluster_sizes" -> None,
    // x84/x85 outputs are doc-/position-sized — slice the compare; both
    // engines share the LM/window algebra so the slice stays exact.
    "x84_ccnet_buckets" -> Some("doc_id % 97 = 0"),
    "x85_winnowing" -> Some("doc_id % 97 = 0"),
    // x86 is map-only rule algebra; doc-level output — slice.
    "x86_gopher_rules" -> Some("doc_id % 97 = 0"),
    // x87 is map-only page construction + line filters; doc-level — slice.
    "x87_c4_clean" -> Some("doc_id % 97 = 0"),
    // x88 output is the (lang, guess) matrix, <= 16 rows at any scale.
    "x88_langid_confusion" -> None,
    // x89 output is vec-sized — slice; the oracle retrains the IVF index
    // in SQL (the x13 cost), so it sweeps wherever x13's does.
    "x89_semantic_outliers" -> Some("vec_id % 97 = 0"),
    // x90 is x79's gram shape with a distinct; doc-level output — slice.
    "x90_novelty_score" -> Some("doc_id % 97 = 0"),
    // x91 output is cell-sized (<= k rows); the oracle retrains the IVF
    // index in SQL — sweeps wherever x13's does.
    "x91_semantic_drift" -> None,
    // x92 rides x26's capped engineered corpus — 240 rows.
    "x92_taint_propagation" -> None,
    // x93 output is source-sized (20 rows); the budget derives from the
    // corpus (9N/5), so cap binding survives fixture replication, and
    // both engines are one corpus count + dimension-sized waterfall CTEs.
    "x93_epoch_mix" -> None,
    // x94 output is registrable-domain-sized (~63 rows at any scale —
    // domains are a catalog); both engines are map-only URL algebra +
    // the two-level (domain, canon) -> (domain) aggregation, linear
    // everywhere (the x73 oracle shape plus one more hash agg).
    "x94_domain_gate" -> None,
    // x95 output is bench-doc-sized — slice; the oracle winnows both
    // corpora with the token-level gram mirror (the x85 sf10 shape, ~2x),
    // so it sweeps wherever x85's does.
    "x95_fuzzy_decontamination" -> Some("doc_id % 97 = 0"),
    // x96 output is span-sized (pairs sharing >= 2 fingerprints); the
    // oracle rides the same winnow mirrors as x95 plus a window — slice
    // on the bench doc like x95's. NOTE the x74 replication caveat
    // applies ABOVE sf1: GenScale clones documents verbatim, so at sf10
    // (100 copies) every fingerprint's train-doc frequency exceeds the
    // 64 boilerplate cap and the index empties — both engines agree on
    // the empty result, but the compare is vacuous there; sf1 (10
    // copies, df ~10) is the largest replicated scale where x96 is
    // semantically meaningful.
    "x96_contamination_spans" -> Some("doc_id % 97 = 0"),
    // x97 output is one row per selected unique doc (~54% of the
    // corpus under the planted supply tiers) — slice; both engines are
    // x93's dimension-sized waterfall + one ranking pass.
    "x97_epoch_mix_materialize" -> Some("doc_id % 97 = 0"),
    // x98 output is one row per implicated train doc — slice; oracle is
    // the x95/x96 winnow shape plus a token unnest of the train slice.
    "x98_decontamination_scrub" -> Some("doc_id % 97 = 0"),
    // x99 output is budget-sized (1.8x corpus rows, ids only) — slice;
    // both engines are x97's chain plus a map-only unnest + hash.
    "x99_epoch_shard_plan" -> Some("doc_id % 97 = 0"),
    // x100/x101 ride x98's sweep; the byte rebuild/offsets add one
    // segment unnest + window over the implicated slice — same
    // implicated-doc-sized output, same slice.
    "x100_byte_scrub" -> Some("doc_id % 97 = 0"),
    "x101_span_offsets" -> Some("doc_id % 97 = 0"),
    // x102 output is fixed-size (2 x 50 sample rows at ANY scale — the
    // point of a fixed certification sample); the oracle's brute truth
    // is (corpus x 50), the same x08 cost class, and the IVF chain is
    // x13's. No slice needed: 100 rows always compare.
    "x102_ann_recall" -> None,
    // x103/x104 corpora are audit-fixture-bounded by construction
    // (plantedDocs/dedupCorpus cap at doc_id < 120 — pair queries never
    // run corpus-wide), so their outputs are ~44/158 rows at ANY scale:
    // compare whole, no slice.
    "x103_minhash_calibration" -> None,
    "x104_soft_dedup_weights" -> None,
    // x105 output is LIMIT-bounded (top-20): compare whole. Both engines
    // pay one term-filtered pass + one scalar-vector pass; the fusion
    // tail is two 50-row frames at any scale.
    "x105_rrf_fusion" -> None,
    // x106 output is the fixed certification universe (2 nprobe arms x
    // 50 sample queries) at ANY scale; the oracle's training unroll is
    // x102's with sqrt(N) cells — feasible to ~sf1, engine-only above.
    "x106_ann_recall_prod" -> None,
    // x107 output is RrfQ x RrfOut (250 rows) at any scale; both engines
    // pay the postings slice + one scalar-vector corpus pass.
    "x107_rrf_multiquery" -> None,
    // x108 corpus is audit-fixture-bounded (plantedDocs caps at
    // doc_id < 120), 3 aggregate rows: compare whole.
    "x108_calibrated_widths" -> None,
    // x109 output is the fixed 50-query sample at any scale; both
    // engines pay one corpus scan against the broadcast sample.
    "x109_index_feasibility" -> None,
    // x110 output is the fixed (2 depth arms x 50 queries) universe; the
    // oracle's per-subspace k-means unroll is feasible to ~sf1.
    "x110_pq_rerank_recall" -> None,
    // x111 rides x104's audit-fixture-bounded corpus (dedupCorpus caps
    // at doc_id < 120), so the output is ~150 rows at any scale:
    // compare whole — the conservation sum is part of the row-exact
    // compare.
    "x111_weighted_epoch_mix" -> None,
    // x112 output is the fixed (2 depth arms x 50 queries) universe; the
    // oracle composes x106's IVF unroll with x110's PQ unroll — feasible
    // to ~sf1 like its parents, engine-only above.
    "x112_ivfpq_rerank" -> None,
    // x113 output is budget-bounded (exactly WMixBudget = 500 rows at
    // any scale — the conservation sum materialized); oracle rides
    // x111's fixture-bounded cluster CTEs.
    "x113_weighted_shard_plan" -> None,
    // x114 output is the fixed (2 arms x 50 queries) universe; the
    // oracle is two x106-class IVF unrolls — feasible to ~sf1,
    // engine-only above.
    "x114_stale_index_recall" -> None,
    // x115 output is source-catalog-sized (one row per source at any
    // scale); the big-table touch is the doc_id-pruned source lookup,
    // the rest rides x104's fixture-bounded cluster CTEs. Compare whole
    // — conservation is part of the row-exact compare.
    "x115_weighted_temperature_mix" -> None,
    // x116 output is ONE row (the rebuild verdict + its audit counts);
    // the oracle is x114's stale-arm IVF unroll — feasible to ~sf1
    // like its parent, engine-only above.
    "x116_rebuild_trigger" -> None,
    // x117 output is (lang, source)-catalog-sized (cells of the audit
    // corpus at any scale); the big-table touch is the doc_id-pruned
    // (lang, source) lookup, the rest rides x104's fixture-bounded
    // cluster CTEs like x115. Compare whole.
    "x117_ipf_mix_corrected" -> None)

  /** Queries whose oracle is only feasible at SPECIFIC scales — excluded
    * from a no-names sweep and run only when explicitly named (round-8
    * advice: a default sweep at sf100 otherwise emits an oracle_sql.json
    * entry whose compare cannot complete, stalling the whole check run).
    *
    * x56: the reachability oracle is a recursive CTE — O(Σ comp²) rows.
    * Feasible at sf1 (dimension-bounded node set, 9,268 s solo); at sf100
    * the densified giant component makes the CTE the bottleneck, and the
    * ENGINE side (contraction) is exactly what removes that quadratic.
    * x61 replays the same closure on the same graph — same bound.
    */
  val ByNameOnly: Map[String, Option[String]] = Map(
    "x56_connected_components" -> Some("node % 97 = 0"),
    "x61_incremental_cc" -> Some("node % 97 = 0"),
    // x74 compares row-exact at any scale, but the GenScale fixtures
    // replicate documents VERBATIM (k=10 copies per text), so above sf0.1
    // every content line's df exceeds the cap and the dedup is
    // semantically degenerate (all lines boilerplate) — run it by name
    // when that's understood, not in a default sweep.
    "x74_line_dedup" -> Some("doc_id % 97 = 0"))

  def main(args: Array[String]): Unit = {
    val Array(sfDir, rawOutDir) = args.take(2)
    // absolute, so oracle SQL read_parquet() references and check-script
    // symlinks resolve regardless of the compare process's cwd
    val outDir = new java.io.File(rawOutDir).getAbsolutePath
    // --json-only: skip query execution and (re)write oracle_sql.json for
    // the selected family over EXISTING result dumps — the recovery path
    // when a later named run clobbered the sweep's oracle JSON (each
    // invocation rewrites the whole file).
    val jsonOnly = args.drop(2).contains("--json-only")
    val names = args.drop(2).filterNot(_ == "--json-only").headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // No-names run = the default sweep (ByNameOnly excluded); explicit
    // names select from BOTH pools, so the scale-gated oracles still run
    // where the caller knows they fit.
    val pool = Family ++ ByNameOnly.toSeq
    val family = pool.filter { case (n, _) =>
      names.map(_.contains(n)).getOrElse(!ByNameOnly.contains(n))
    }
    // Fail fast on any name with no registered query or oracle BEFORE a
    // single query executes: a dangling Family entry (or a typo in an
    // explicit name list) must cost seconds, not an hours-long sf100 run
    // that then dies in the oracle-JSON loop after all the work is done.
    family.foreach { case (name, _) =>
      require(SparkEntry.queries.contains(name),
        s"ScaleVerify: no registered query named '$name'")
      require(SparkEntry.oracleSql.contains(name),
        s"ScaleVerify: no oracle SQL registered for '$name'")
    }
    if (!jsonOnly) family.foreach { case (name, slice) =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val sliced = slice.map(s => df.filter(expr(s))).getOrElse(df)
        // re-sort by ALL columns, asc nulls first (Spark default), the
        // mirror of DuckDB's ORDER BY ALL NULLS FIRST
        sliced.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        println(f"[scale-verify] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $rows%8d sliced rows")
      } catch {
        case e: Throwable =>
          System.err.println(s"[scale-verify] $name failed: ${e.getMessage}")
      }
      // Same hygiene as Bench/Verify — this session runs the iterative
      // localCheckpoint users (x13/x26/x47) at the LARGEST scale, where
      // lingering checkpoint blocks hurt most.
      graft.util.CacheHygiene.clear(spark)
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Probe-scale oracle overrides: x47's full oracle re-trains the IVF
    // model in SQL, which DuckDB cannot afford at sf100 (>50 GB spill).
    // Materialize the engine's persisted centroid model beside the dump
    // and verify the removal decisions GIVEN that model — the
    // persisted-equals-retrained equivalence is pinned separately
    // (AnnModelsSpec; full-retrain oracle at sf<=10).
    val overrides: Map[String, String] =
      if (family.exists(_._1 == "x47_semantic_dedup")) {
        val cdir = s"$outDir/x47_centroids"
        ExtensionQueries.x47Centroids(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(cdir)
        Map("x47_semantic_dedup" -> ExtensionQueries.x47ScaleOracle(s"$cdir/*.parquet"))
      } else Map.empty

    val json = family.map { case (name, slice) =>
      val base = overrides.getOrElse(name, SparkEntry.oracleSql(name))
      val where = slice.map(s => s"WHERE $s ").getOrElse("")
      val wrapped = s"SELECT * FROM (\n$base\n) __g ${where}ORDER BY ALL NULLS FIRST"
      s"${q(name)}: ${q(wrapped)}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
