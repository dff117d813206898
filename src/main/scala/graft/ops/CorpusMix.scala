package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-mix curation operators: the "what do we train on next epoch"
  * layer that sits between per-document filtering (x02/x10/x50) and
  * sampling (x17/x29/x41) in an LLM data pipeline.
  *
  *  - [[jsDivergenceMatrix]] diagnoses DRIFT between per-source token
  *    distributions (which sources are near-duplicates of each other,
  *    which are outliers — the input to dedup-at-source-granularity and
  *    to mix design);
  *  - [[temperatureAllocation]] turns raw source sizes into an exact
  *    integer document budget per source under alpha-temperature
  *    rebalancing (Lample & Conneau, "Cross-lingual Language Model
  *    Pretraining", 2019: w_s ∝ n_s^alpha — alpha < 1 upweights small
  *    sources), via largest-remainder apportionment so the allocations
  *    sum EXACTLY to the budget.
  *
  * Scale shape: the only corpus-sized stage is the (source, bucket)
  * count aggregate feeding the divergence matrix — one map-side-combined
  * shuffle on a bounded key space (sources x 256 buckets). Everything
  * downstream (dense grids, pair joins, apportionment windows) is
  * dimension-sized: sources are a catalog, not data. At 100 TB the same
  * plan moves exactly one corpus scan.
  */
object CorpusMix {

  /** Token-hash bucket count for the divergence distributions: coarse
    * enough that every bucket is populated at fixture scale (smoothing
    * stays a correction, not the signal), fine enough that distinct
    * source styles separate.
    */
  val Buckets = 256

  /** Pairwise Jensen-Shannon divergence between per-source distributions.
    *
    * @param counts (source: string, bucket: long in [0, Buckets),
    *               c: long) — token counts per source and hash bucket
    *               (absent buckets implied zero)
    * @return (src1 < src2, js) one row per unordered source pair;
    *         js in [0, ln 2] computed over add-one-smoothed dense
    *         distributions. Per-bucket terms are decimal-quantized
    *         (scale 12) before the exact sum, so the result is
    *         summation-order independent and engine-reproducible; the
    *         served value is rounded to 6 decimals (libm ulp noise).
    *         The quantization scale sits 6 digits below the rounding
    *         digit: a scale-9 sum lands on an exact ...500 rounding tie
    *         with ~1e-3 probability per pair (where Spark's HALF_UP and
    *         DuckDB's scaled-double round can disagree — the hazard
    *         class [[graft.util.Exact.davg]] documents); at scale 12 the
    *         tie probability is 1e-6 while libm ulp noise (~1e-16 per
    *         term, ≤256 terms) still sits far below the quantum.
    */
  def jsDivergenceMatrix(counts0: DataFrame): DataFrame = {
    // Materialize the (source, bucket) counts ONCE: four downstream
    // consumers (totals, the grid's left join, and the pair join's two
    // sides) would otherwise each replay the caller's corpus-sized
    // tokenize+count lineage — PlanSpec pins the served plan corpus-free.
    // The cut frame is dimension-sized (sources x Buckets rows).
    val counts = Checkpoints.cut(counts0)
    val spark = counts.sparkSession
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    // dense source x bucket grid (dimension-sized), add-one smoothing
    val grid = totals.crossJoin(
        spark.range(Buckets.toLong).select(col("id").as("bucket")))
      .join(counts, Seq("source", "bucket"), "left")
      .select(col("source"), col("bucket"),
        ((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n") + Buckets).cast("double")).as("p"))
    val a = grid.select(col("source").as("src1"), col("bucket"), col("p").as("p1"))
    val b = grid.select(col("source").as("src2"), col("bucket"), col("p").as("p2"))
    val m = (col("p1") + col("p2")) / 2.0
    a.join(b, Seq("bucket")).filter(col("src1") < col("src2"))
      .select(col("src1"), col("src2"),
        (col("p1") * log(col("p1") / m) / 2.0 +
          col("p2") * log(col("p2") / m) / 2.0).as("term"))
      .groupBy(col("src1"), col("src2"))
      .agg(round(graft.util.Exact.dsum(col("term"), 12), 6).as("js"))
  }

  /** Scalar twin of x62's bucket assignment for the STREAMING drift
    * monitor ([[graft.streaming.DocStreams.sourceDriftMonitor]]): same
    * tokenization as [[TextOps.tokens]] (trim → lower → split \s+ →
    * drop empties) and the same polyHash, so per-source bucket counts
    * accumulated in streaming state agree EXACTLY with the batch SQL
    * path — the twin-agreement property the spec pins.
    */
  def bucketCounts(text: String): Array[Long] = {
    val out = new Array[Long](Buckets)
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = graft.functions.TextExprCode.polyHash(
          org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)))
        out((h % Buckets).toInt) += 1L
      }
      i += 1
    }
    out
  }

  /** Add-one-smoothed probability vector of a bucket-count array — the
    * scalar form of the grid stage in [[jsDivergenceMatrix]].
    */
  def smoothed(counts: Array[Long]): Array[Double] = {
    var n = 0L
    var i = 0
    while (i < counts.length) { n += counts(i); i += 1 }
    val denom = (n + counts.length).toDouble
    counts.map(c => (c + 1).toDouble / denom)
  }

  /** Jensen-Shannon divergence of a smoothed count distribution against
    * a fixed reference distribution — sequential fixed-order summation,
    * so the value is a pure function of (counts, reference) and the
    * streaming monitor's output is replay-deterministic.
    */
  def jsVsReference(counts: Array[Long], reference: Array[Double]): Double = {
    require(reference.length == Buckets,
      s"reference must have $Buckets buckets, got ${reference.length}")
    val p = smoothed(counts)
    var js = 0.0
    var i = 0
    while (i < Buckets) {
      val m = (p(i) + reference(i)) / 2.0
      js += p(i) * math.log(p(i) / m) / 2.0
      // x ln x -> 0 as x -> 0: a zero reference bucket contributes nothing
      // (smoothed references are strictly positive; raw ones may not be)
      if (reference(i) > 0.0) js += reference(i) * math.log(reference(i) / m) / 2.0
      i += 1
    }
    js
  }

  /** Exact integer budget apportionment under alpha-temperature weights.
    *
    * Weights w_s = floor(n_s^alpha * 1e6) as longs (the one libm-derived
    * quantity, floored far from knife edges); everything after is pure
    * integer arithmetic: base quota `budget * w div W`, then
    * largest-remainder top-up ranked by (`budget * w mod W` desc, source)
    * — so Σ alloc == budget EXACTLY, deterministically, with no
    * floating-point ties anywhere near the decision points.
    *
    * The quota products run in decimal(38,0), not Long: w ≈ n^alpha * 1e6
    * reaches ~1e14 at 1e8 docs (the 100 TB regime), so `budget * w` —
    * and the corpus-wide Σw — overflow int64 long before the inputs look
    * exotic, and non-ANSI Spark would wrap silently where the int128
    * oracle stays exact. decimal(38,0) holds budget*w up to ~8.5e37
    * (both factors at Long.MaxValue) with no wrap; the DuckDB oracle
    * mirrors with HUGEINT.
    *
    * @param counts (source: string, n_docs: long)
    * @return (source, n_docs, w, alloc) — alloc longs summing to budget
    */
  def temperatureAllocation(
      counts: DataFrame, alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // Duplicates remainderAllocation's check ON PURPOSE: that one runs
    // after the eager Checkpoints.cut below, so an invalid budget would
    // otherwise pay a full corpus-scan materialization before throwing.
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    // Materialized once (dimension-sized): the total-weight aggregate and
    // the quota build would otherwise each replay the caller's corpus
    // count — one corpus scan, not two.
    val weighted = Checkpoints.cut(counts.select(col("source"), col("n_docs"),
      floor(pow(col("n_docs").cast("double"), lit(alpha)) * 1e6).cast("long").as("w")))
    remainderAllocation(weighted, budget)
  }

  /** Epoch-capped (data-constrained) apportionment: the published
    * data-constrained-scaling discipline (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": repeating a source
    * beyond ~4 epochs stops buying loss) applied to the quota kernel.
    * Each source carries a hard `cap` (maxEpochs x its unique supply);
    * the budget is apportioned by [[remainderAllocation]], any source
    * allocated past its cap is frozen AT the cap, and the overflow is
    * re-apportioned over the remaining sources by the same
    * largest-remainder discipline — the cap-and-redistribute waterfall
    * (water-filling), iterated to fixpoint.
    *
    * Termination: every non-final round freezes >= 1 source, so rounds
    * <= #sources; a round that freezes nobody is the fixpoint (and
    * re-running it is a no-op — the idempotence the unrolled SQL oracle
    * relies on). All arithmetic after the caller's weight construction
    * is integer (decimal(38,0) quotas, long caps), so the waterfall is
    * bit-reproducible across engines and partitionings.
    *
    * Scale shape: every per-round frame is dimension-sized (sources are
    * a catalog); the only driver-side values are two scalars per round
    * (over-cap count + freed budget). Nothing corpus-sized moves.
    *
    * @param weighted (source: string, w: long, cap: long) plus
    *                 ride-through columns; Σ cap must cover `budget`
    * @return weighted's columns + alloc (long, Σ == budget) +
    *         capped (int 1 = frozen at its cap)
    */
  def epochCappedAllocation(weighted: DataFrame, budget: Long): DataFrame =
    epochCappedAllocationWithRounds(weighted, budget)._1

  /** [[epochCappedAllocation]] plus the waterfall round count — the spec
    * pins the fixture's convergence depth against the oracle's unroll.
    */
  def epochCappedAllocationWithRounds(
      weighted0: DataFrame, budget: Long): (DataFrame, Int) = {
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    val weighted = Checkpoints.cut(weighted0)
    val cols = weighted.columns.toSeq
    require(Seq("source", "w", "cap").forall(cols.contains),
      s"weighted needs source/w/cap columns, got ${cols.mkString(", ")}")
    // Capacity preflight: with Σ cap < budget the waterfall would freeze
    // every source and strand the remainder — that is a caller error
    // (the budget exceeds what the corpus can supply at this cap), named
    // here rather than surfacing as a silent under-allocation.
    val capacity = weighted
      .agg(coalesce(sum(col("cap")), lit(0L)).cast("long")).head().getLong(0)
    require(capacity >= budget,
      s"total cap capacity $capacity cannot place budget $budget — raise maxEpochs or lower the budget")

    var active = weighted
    var b = budget
    var cappedParts = List.empty[DataFrame]
    var rounds = 0
    var result: DataFrame = null
    while (result == null) {
      rounds += 1
      // Cut per round: the allocation feeds THREE consumers (the over-cap
      // scalar aggregate, the frozen slice, the surviving slice) and is
      // dimension-sized.
      val alloc = Checkpoints.cut(
        remainderAllocation(active, b)
          .select(cols.map(col) :+ col("alloc").cast("long").as("alloc"): _*))
      val over = alloc.filter(col("alloc") > col("cap"))
      val row = over.agg(
        count(lit(1)).as("n"), coalesce(sum(col("cap")), lit(0L)).as("freed")).head()
      if (row.getLong(0) == 0L) result = alloc
      else {
        cappedParts ::= over.select(cols.map(col) :+ col("cap").as("alloc"): _*)
        b -= row.getLong(1)
        active = alloc.filter(col("alloc") <= col("cap")).select(cols.map(col): _*)
      }
    }
    val out = cappedParts
      .map(_.select(cols.map(col) :+ col("alloc") :+ lit(1).as("capped"): _*))
      .foldLeft(result.select(cols.map(col) :+ col("alloc") :+ lit(0).as("capped"): _*))(
        _ union _)
    (out, rounds)
  }

  /** Exact largest-remainder apportionment of `budget` over arbitrary
    * integer weights — the integer tail of [[temperatureAllocation]],
    * factored out so callers with their OWN weighting scheme (x80's
    * excess-loss exponential, vs the n^alpha temperature here) share the
    * overflow-safe decimal(38,0) quota math and the deterministic
    * (remainder desc, source) top-up tie-break verbatim.
    *
    * @param weighted any frame with `source` (string, the tie-break key)
    *                 and `w` (long weight, non-null); extra columns ride
    *                 through untouched. Should be dimension-sized and
    *                 already materialized ([[Checkpoints.cut]]) — the
    *                 total-weight aggregate and the quota build both
    *                 consume it.
    * @return the input columns plus `alloc` (longs summing to budget)
    */
  def remainderAllocation(weighted: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    val tw = weighted.agg(sum(col("w").cast(DecimalType(38, 0))).as("tw"))
    val quotas = weighted.crossJoin(broadcast(tw))
      .select(weighted.columns.map(col) :+
        expr(s"(cast($budget as decimal(38,0)) * w) div tw").as("base") :+
        expr(s"(cast($budget as decimal(38,0)) * w) % tw").as("rem"): _*)
    // Largest-remainder rank + the shortfall are both dimension-sized.
    // The single-partition windows are intentional (sources are a
    // catalog, not data); partitioning on `w pmod 1` — constant 0 for
    // every row, but NOT foldable, so the optimizer can't strip it the
    // way it strips a literal — keeps the partition spec nonempty and
    // WindowExec's no-partition warning meaningful for genuinely
    // unbounded windows elsewhere. coalesce guards the non-null
    // assumption: a null w would otherwise split the "constant" key
    // into two partitions and silently corrupt the cumulative sum
    // (here w is floor(...)-built and never null, but the guard makes
    // the trick safe to copy).
    val onePart = pmod(coalesce(col("w"), lit(0L)), lit(1L))
    val short = lit(budget) - sum(col("base")).over(Window.partitionBy(onePart))
    val rk = row_number().over(
      Window.partitionBy(onePart).orderBy(col("rem").desc, col("source")))
    quotas
      .select(weighted.columns.map(col) :+
        (col("base") + when(rk <= short, 1L).otherwise(0L)).as("alloc"): _*)
  }
}
