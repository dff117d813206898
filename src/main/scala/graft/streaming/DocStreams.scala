package graft.streaming

import graft.ops.{Checkpoints, Dedup, TextOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming document ingest — the unbounded form of the batch curation
  * queries (x02 quality gate, x03 exact dedup): documents arrive on a feed
  * (crawl output, upload queue) and are quality-scored, language-guessed,
  * and exactly-deduplicated before landing in the training corpus.
  *
  * Scale posture: the quality/language stage is map-only (stateless,
  * codegen'd — identical plan to the batch x01/x02 path). Dedup state is the
  * content hash only (16 bytes/doc, never the text), keyed and checkpointed,
  * and `dropDuplicatesWithinWatermark` EVICTS hashes older than the
  * watermark — bounded state on an unbounded feed. That buys at-least-
  * exactly-once *within the dedup horizon*: a duplicate arriving later than
  * the watermark delay is admitted (and left for the periodic batch x03
  * sweep), which is the standard horizon/compaction split for corpus dedup
  * at 100 TB/day ingest rates.
  */
object DocStreams {

  /** Map-only curation columns — reused verbatim from the batch operators
    * so stream and batch score identically (same codegen'd expressions).
    * With `scrubPii` the admitted text is the REDACTED form (x18's exact
    * expressions) plus per-doc hit counts; hashing/scoring stay on the
    * original text so a scrubbed duplicate still dedups against its
    * unscrubbed twin.
    */
  def withCuration(docs: DataFrame, textCol: String = "text", scrubPii: Boolean = false): DataFrame = {
    val curated = docs
      .withColumn("content_hash", Dedup.contentKey(col(textCol)))
      .withColumn("lang_guess", TextOps.langGuess(col(textCol)))
      .withColumn("quality", TextOps.quality(col(textCol)))
    if (!scrubPii) curated
    else curated
      .withColumn("n_emails", TextOps.emailCount(col(textCol)))
      .withColumn("n_phones", TextOps.phoneCount(col(textCol)))
      .withColumn(textCol, TextOps.scrubPii(col(textCol)))
  }

  /** Full ingest pipeline: curate (optionally PII-scrub) -> quality gate ->
    * exact dedup within the watermark horizon. Emits admitted documents in
    * append mode.
    */
  def ingest(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      minQuality: Double = 0.5,
      watermark: String = "1 hour",
      scrubPii: Boolean = false): DataFrame =
    withCuration(docs, textCol, scrubPii)
      .filter(col("quality") >= minQuality)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-dup admission — the unbounded form of the x06 MinHash/
    * LSH batch sweep. Exact streaming dedup ([[ingest]]) can hold its
    * 16-byte hashes in operator state; near-dup state is the full LSH
    * signature store of every admitted document, which at corpus scale
    * belongs on storage, not in the state store. So the stream keeps its
    * index AS A TABLE: per micro-batch,
    *
    *  1. band-key the batch (map-only MinHash/LSH projection);
    *  2. equi-join those keys against the on-disk store of all previously
    *     ADMITTED documents' keys — any collision = near-dup, drop;
    *  3. within the batch, keep the lowest id per band bucket (greedy
    *     first-wins, same tie rule as the batch pipeline);
    *  4. write admitted docs to `sinkPath/batch_id=N` and their band keys
    *     to `storePath/batch_id=N`, both overwrite-by-batch-dir.
    *
    * Exactly-once on replay: the store read prunes `batch_id >= N` (its
    * own partition column), so a re-executed batch N never collides with
    * the keys it wrote before crashing, and both overwrites land
    * idempotently. All joins are equi-joins on band keys; nothing
    * data-sized is broadcast or nested-looped.
    */
  def nearDupIngest(
      docs: DataFrame,
      sinkPath: String,
      storePath: String,
      checkpointPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow(),
      horizonBatches: Option[Long] = None): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val bands = Dedup.bandKeysFor(batch, idCol, textCol).cache()
        // Dedup horizon (the near-dup analog of ingest's watermark
        // eviction): only band keys from the last `horizonBatches` batches
        // gate admission; older dups are re-admitted and left to the
        // periodic batch sweep. Also the bound compactStore evicts by.
        val prior = readStore(spark, storePath, idCol)
          .filter(col("batch_id") < batchId &&
            horizonBatches.map(h => col("batch_id") >= batchId - h).getOrElse(lit(true)))
        val hitStore = bands.join(prior.select("band").distinct(), "band")
          .select(idCol).distinct()
        val firstPerBand = bands.groupBy(col("band")).agg(min(col(idCol)).as("keep_id"))
        val inBatchDup = bands.join(firstPerBand, "band")
          .filter(col(idCol) =!= col("keep_id"))
          .select(idCol).distinct()
        val dupIds = hitStore.union(inBatchDup).distinct()
        // admitted chains the store scan + three joins; both writes consume
        // it, so materialize once instead of re-running the tree per write.
        val admitted = batch.join(dupIds, Seq(idCol), "left_anti").cache()
        admitted.write.mode("overwrite")
          .parquet(new Path(sinkPath, s"batch_id=$batchId").toString)
        bands.join(admitted.select(idCol), Seq(idCol), "left_semi")
          .write.mode("overwrite")
          .parquet(new Path(storePath, s"batch_id=$batchId").toString)
        admitted.unpersist(false)
        bands.unpersist(false)
        () // foreachBatch wants Unit; unpersist returns the frame
      }
      .start()

  case class PackDoc(source: String, doc_id: Long, tok: Long)
  case class PackedDoc(source: String, doc_id: Long, tok: Long, bin: Long)
  // public (not private): the state ENCODER's generated code constructs
  // instances reflectively and cannot see a private constructor
  case class PackState(cum: Long)

  /** Streaming context-window packing — the unbounded form of the x20
    * batch packer (pretraining concat-and-chunk): each source's documents
    * accumulate token counts and every doc is assigned the bin its
    * cumulative-before offset falls in (`floor(cum_before / budget)`),
    * the identical binning rule as x20's window-cumsum form, so a doc
    * stream packed incrementally lands in the same bins the batch job
    * would produce over the same arrival order (spec-pinned).
    *
    * State is ONE long per source (the running token offset) — bounded on
    * an unbounded feed regardless of document volume, checkpointed by the
    * state store, and sources pack independently so the operator
    * parallelizes by shard exactly like the batch window. Within a
    * micro-batch docs are processed in doc_id order (the batch form's
    * ORDER BY); cross-batch order is arrival order, which a monotonic
    * upstream id makes deterministic.
    */
  def packIngest(docs: Dataset[PackDoc], budget: Long = 512L): Dataset[PackedDoc] = {
    require(budget >= 1, "budget must be >= 1")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[PackDoc], state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val bin = cum / budget
            cum += d.tok
            PackedDoc(src, d.doc_id, d.tok, bin)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  case class DriftState(counts: Array[Long])
  case class SourceDrift(source: String, n_tokens: Long, js: Double)

  /** Streaming source-drift monitor — the unbounded twin of batch x62:
    * per source, the token-hash-bucket distribution of everything seen so
    * far, scored each trigger as Jensen-Shannon divergence against a
    * fixed REFERENCE distribution (yesterday's corpus, the accepted mix
    * design — [[graft.ops.CorpusMix.smoothed]] of any bucket-count
    * vector). The ingest-time alarm for "this feed's style shifted":
    * upstream crawl changes, a source going spammy, an encoding break —
    * all show up as a drifting js long before a batch audit runs.
    *
    * Scale posture: the per-doc bucket vector is computed MAP-SIDE
    * ([[graft.ops.CorpusMix.bucketCounts]] — same tokenization and hash
    * as the batch SQL path, so stream and batch counts agree exactly);
    * the shuffle carries one 256-long vector per document, never tokens.
    * State is exactly 256 longs + a count per SOURCE (a dimension key) —
    * bounded forever on an unbounded feed, no watermark needed. Output
    * (Update mode): one (source, n_tokens, js) row per source per
    * trigger, replay-deterministic because the js is a pure sequential
    * function of the accumulated counts.
    */
  def sourceDriftMonitor(
      docs: DataFrame, reference: Array[Double]): Dataset[SourceDrift] = {
    import docs.sparkSession.implicits._
    val perDoc = docs.select(col("source"), col("text")).as[(String, String)]
      .map { case (src, text) => (src, graft.ops.CorpusMix.bucketCounts(text)) }
    perDoc.groupByKey(_._1)
      .mapGroupsWithState[DriftState, SourceDrift](GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Array[Long])], state: GroupState[DriftState]) =>
          val cur = state.getOption.map(_.counts)
            .getOrElse(new Array[Long](graft.ops.CorpusMix.Buckets))
          rows.foreach { case (_, v) =>
            var i = 0
            while (i < cur.length) { cur(i) += v(i); i += 1 }
          }
          state.update(DriftState(cur))
          var n = 0L
          var i = 0
          while (i < cur.length) { n += cur(i); i += 1 }
          SourceDrift(src, n, graft.ops.CorpusMix.jsVsReference(cur, reference))
      }
  }

  /** Per-document benchmark-containment scores (batch semantics): each
    * document's distinct n-grams ([[graft.ops.Dedup.shingles]], the
    * native expression — map-side) exploded and equi-joined against the
    * distinct benchmark shingle set, LEFT-rejoined so clean documents
    * keep flowing with n_hits = 0 (an inner join would silently drop
    * exactly the uncontaminated majority). The x24 containment algebra
    * over an arbitrary benchmark frame — shared by the batch audit shape
    * and [[decontaminateIngest]]'s per-micro-batch admission decision.
    * Benchmark suites are MBs, not TBs, so the broadcast is bounded at
    * any corpus scale.
    */
  def decontaminationScores(
      docs: DataFrame, benchShingles: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 5): DataFrame = {
    val sh = docs.withColumn("_s", graft.ops.Dedup.shingles(col(textCol), n))
    val hits = sh
      .select(col(idCol), explode(col("_s")).as("shingle"))
      .join(broadcast(benchShingles.select(col("shingle")).distinct()), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    sh.withColumn("n_shingles", size(col("_s")).cast("long")).drop("_s")
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("containment",
        when(col("n_shingles") > 0,
          round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 6))
          .otherwise(lit(0.0)))
  }

  /** Streaming eval-decontamination gate — the admission-time twin of
    * batch x24: x24 finds leaked benchmark content after the fact; this
    * stops it at the door. Documents whose 5-grams hit the benchmark
    * set are quarantined for review, clean documents land in the
    * corpus, both under `batch_id=N` overwrite partitions (the
    * nearDupIngest exactly-once discipline: a replayed batch overwrites
    * its own partial output idempotently).
    *
    * The containment join needs a doc-side explode + aggregate + self
    * rejoin — batch semantics, not a stateless stream transform — so it
    * runs inside foreachBatch ([[decontaminationScores]]); the stream
    * itself keeps NO state (no watermark, no state store): admission is
    * a pure function of (document, benchmark), re-derivable on any
    * replay.
    */
  def decontaminateIngest(
      docs: DataFrame,
      benchShingles: DataFrame,
      sinkPath: String,
      quarantinePath: String,
      checkpointPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val scored = decontaminationScores(batch, benchShingles, idCol, textCol, n).cache()
        scored.filter(col("n_hits") === 0).write.mode("overwrite")
          .parquet(new Path(sinkPath, s"batch_id=$batchId").toString)
        scored.filter(col("n_hits") > 0).write.mode("overwrite")
          .parquet(new Path(quarantinePath, s"batch_id=$batchId").toString)
        scored.unpersist(false)
        ()
      }
      .start()

  /** Per-document winnowing-fingerprint containment against a benchmark
    * fingerprint set — the fuzzy (x95) analog of the exact
    * [[decontaminationScores]]: catches PARAPHRASED / partially edited
    * benchmark leakage a verbatim 5-gram threshold misses, at 2/(w+1)
    * of the gram-index size. Containment = |doc fp ∩ bench fp| /
    * |doc fp| over DISTINCT hashes ([[graft.ops.Dedup.winnowFingerprints]]'s
    * batch x95 algebra verbatim). Benchmark suites are MBs, so the
    * 8-byte fingerprint set broadcast is bounded at any corpus scale —
    * and 60% smaller than the exact twin's gram set. Docs too short to
    * fingerprint (< w + n - 1 tokens) score 0 (clean), mirroring the
    * batch operator's empty-fingerprint behavior.
    */
  def fuzzyDecontaminationScores(
      docs: DataFrame, benchFingerprints: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5, w: Int = 4): DataFrame = {
    // n_fp/n_hit/containment are OUTPUT columns; an input frame already
    // carrying one would make the post-join references ambiguous (or
    // silently shadow), so reject it up front. The aggregate rides
    // through the join under _fz_ temporaries as extra insurance.
    val reserved = Seq("n_fp", "n_hit", "containment").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"fuzzyDecontaminationScores: input already carries reserved output " +
        s"column(s) ${reserved.mkString(", ")}")
    val docFp = Dedup.winnowFingerprints(docs, idCol, textCol, n, w, widen = false)
      .select(col("id").as(idCol), col("gh")).distinct()
    val scores = docFp
      .join(broadcast(benchFingerprints.select(col("gh")).distinct())
        .withColumn("hit", lit(1)), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_fz_n_fp"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("_fz_n_hit"))
    docs.join(scores, Seq(idCol), "left")
      .withColumn("n_fp", coalesce(col("_fz_n_fp"), lit(0L)))
      .withColumn("n_hit", coalesce(col("_fz_n_hit"), lit(0L)))
      .withColumn("containment",
        when(col("n_fp") > 0,
          round(col("n_hit").cast("double") / col("n_fp").cast("double"), 6))
          .otherwise(lit(0.0)))
      .drop("_fz_n_fp", "_fz_n_hit")
  }

  /** Streaming fuzzy-decontamination gate — the admission-time twin of
    * batch x95 (as [[decontaminateIngest]] is of x24): arriving
    * documents whose winnowing-fingerprint containment against the
    * benchmark set clears `floor` are quarantined, clean documents land
    * in the corpus, both under idempotent `batch_id=N` overwrite
    * partitions. Like the exact gate, the stream keeps NO state (no
    * watermark, no state store): admission is a pure function of
    * (document, benchmark fingerprint set), re-derivable on any replay —
    * the per-batch join/aggregate runs inside foreachBatch.
    */
  def fuzzyDecontaminateIngest(
      docs: DataFrame,
      benchFingerprints: DataFrame,
      sinkPath: String,
      quarantinePath: String,
      checkpointPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5,
      w: Int = 4,
      floor: Double = 0.3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val scored = fuzzyDecontaminationScores(
          batch, benchFingerprints, idCol, textCol, n, w).cache()
        scored.filter(col("containment") < floor).write.mode("overwrite")
          .parquet(new Path(sinkPath, s"batch_id=$batchId").toString)
        scored.filter(col("containment") >= floor).write.mode("overwrite")
          .parquet(new Path(quarantinePath, s"batch_id=$batchId").toString)
        scored.unpersist(false)
        ()
      }
      .start()

  /** Streaming scrub-at-ingest — the x98 twin, one step past
    * [[fuzzyDecontaminateIngest]]: instead of quarantining a whole
    * document because one benchmark passage leaked into it, CUT the
    * leaked spans and admit the rest. Every arriving doc lands in the
    * sink exactly once: clean docs pass through with their original
    * text and zero audit counts; implicated docs land with the scrubbed
    * token stream ([[graft.ops.Dedup.fingerprintSpansAgainst]] +
    * [[graft.ops.Dedup.scrubSpans]] — the batch x98 kernels verbatim,
    * so stream == batch by construction). Stateless per batch (pure
    * function of document + benchmark fingerprint set), idempotent
    * batch_id overwrite partitions — the decontaminateIngest
    * exactly-once discipline.
    *
    * Output columns: idCol, text (original or scrubbed), n_spans,
    * n_tokens, tokens_removed. Scrubbed text is the lowercased token
    * stream (the fingerprint tokenization) by default; pass
    * `byteOriginal = true` for the x100 kernel
    * ([[graft.ops.Dedup.scrubSpansBytes]]), which preserves the
    * original bytes of everything kept. Clean docs keep their
    * byte-original text in both modes.
    */
  def scrubIngest(
      docs: DataFrame,
      benchFingerprints: DataFrame,
      sinkPath: String,
      checkpointPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5,
      w: Int = 4,
      mergeGap: Int = 11,
      minFp: Long = 2L,
      byteOriginal: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (scrubbed, checked) = scrubBatchTracked(
          batch, benchFingerprints, idCol, textCol, n, w, mergeGap, minFp,
          byteOriginal)
        scrubbed.write.mode("overwrite")
          .parquet(new Path(sinkPath, s"batch_id=$batchId").toString)
        // Release this batch's checked-spans generation NOW: foreachBatch
        // outlives every between-query hygiene sweep, so without the
        // explicit unpersist a long-running scrub stream accumulates one
        // cut's worth of checkpoint blocks per micro-batch until driver
        // GC happens to collect the handles.
        Checkpoints.unpersist(checked)
        ()
      }
      .start()

  /** The per-batch kernel of [[scrubIngest]], exposed so the spec can
    * pin stream == batch row-identically.
    */
  def scrubBatch(
      batch: DataFrame, benchFingerprints: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5, w: Int = 4, mergeGap: Int = 11, minFp: Long = 2L,
      byteOriginal: Boolean = false): DataFrame =
    scrubBatchTracked(
      batch, benchFingerprints, idCol, textCol, n, w, mergeGap, minFp,
      byteOriginal)._1

  /** [[scrubBatch]] plus the handle of the batch's lineage-cut checked
    * spans, so [[scrubIngest]]'s foreachBatch can
    * [[Checkpoints.unpersist]] the generation once the batch is written
    * (plain [[scrubBatch]] callers — specs, one-shot batch twins — let
    * session-level hygiene reclaim it instead).
    */
  private[graft] def scrubBatchTracked(
      batch: DataFrame, benchFingerprints: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5, w: Int = 4, mergeGap: Int = 11, minFp: Long = 2L,
      byteOriginal: Boolean = false): (DataFrame, DataFrame) = {
    // widen = false: per-micro-batch inputs are tiny and latency-bound —
    // the core-width exchange that pays off on the batch sweeps would
    // cost more per batch than the single-task map it spreads.
    val spans = Dedup.fingerprintSpansAgainst(
      batch, benchFingerprints, idCol, textCol, n, w, mergeGap, minFp,
      widen = false)
    val checked = Dedup.checkSpans(spans)
    // byteOriginal = the x100 kernel (casing/punctuation/whitespace of
    // kept bytes preserved); default = the x98 lowercased token stream
    val rebuilt =
      if (byteOriginal) Dedup.scrubSpansBytesChecked(batch, checked, idCol, textCol)
      else Dedup.scrubSpansChecked(batch, checked, idCol, textCol)
    val scrubbed = rebuilt
      .select(col("id").as(idCol), col("clean_text"),
        col("n_spans"), col("tokens_removed"))
    val out = batch
      .select(col(idCol), col(textCol).as("_orig"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(scrubbed, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), col("_orig")).as(textCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        col("n_tokens"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"))
    (out, checked)
  }

  /** Quality-histogram resolution of [[qualityCalibrationMonitor]]:
    * the cut estimate's worst-case error is one bucket width (1e-3 in
    * quality units) for values inside [0, 1).
    */
  val CalibBuckets = 1000

  case class CalibState(counts: Array[Long])
  case class SourceCalib(source: String, n_docs: Long, cut_est: Double)

  /** Streaming per-source quality calibration — the bounded-state analog
    * of batch x64 (whose exact per-source percent_rank is inherently
    * retroactive: a rank is a function of ALL values, so no streaming
    * operator can serve it exactly with finite state). An ingest
    * pipeline needs a LIVE answer to "what is this source's bottom-20%
    * quality cut right now" to gate admission; this monitor keeps ONE
    * fixed [[CalibBuckets]]-bin histogram of the quality score per
    * source (quality is clamped into [0, 1) — by construction the score
    * concentrates there; clamped mass parks in the edge bins) and emits,
    * per trigger, the left edge of the bucket holding the
    * ceil(cutFrac·n)-th smallest value — within one bucket width (1e-3)
    * of the exact x64 quantile, with state bounded forever at
    * |sources| x 1000 longs on an unbounded feed.
    *
    * Scoring reuses the batch [[graft.ops.TextOps.quality]] EXPRESSION
    * (map-side, before the shuffle — the shuffle carries one bucket int
    * per doc, never text), so the streamed histogram is bit-identical to
    * a batch histogram over the same documents (DocStreamsSpec pins
    * stream == batch-twin exactly, and the estimate within 1e-3 of the
    * exact x64 cut).
    */
  def qualityCalibrationMonitor(
      docs: DataFrame, cutFrac: Double = 0.2,
      textCol: String = "text"): Dataset[SourceCalib] = {
    require(cutFrac > 0 && cutFrac < 1, s"cutFrac must be in (0, 1), got $cutFrac")
    import docs.sparkSession.implicits._
    val perDoc = docs.select(
      col("source"),
      least(lit(CalibBuckets - 1), greatest(lit(0),
        floor(TextOps.quality(col(textCol)) * CalibBuckets).cast("int"))).as("b"))
      .as[(String, Int)]
    perDoc.groupByKey(_._1)
      .mapGroupsWithState[CalibState, SourceCalib](GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Int)], state: GroupState[CalibState]) =>
          val cur = state.getOption.map(_.counts).getOrElse(new Array[Long](CalibBuckets))
          rows.foreach { case (_, b) => cur(b) += 1 }
          state.update(CalibState(cur))
          var n = 0L
          var i = 0
          while (i < cur.length) { n += cur(i); i += 1 }
          val target = math.ceil(cutFrac * n).toLong
          var cum = 0L
          var cutBin = 0
          var j = 0
          var found = false
          while (j < cur.length && !found) {
            cum += cur(j)
            if (cum >= target) { cutBin = j; found = true }
            j += 1
          }
          SourceCalib(src, n, cutBin.toDouble / CalibBuckets)
      }
  }

  /** Streaming temperature-mix monitor — the unbounded twin of batch
    * x63: per-source document counts accumulate across triggers (a
    * streaming groupBy(source) count — dimension-keyed, so the state is
    * ONE long per source, bounded forever on an unbounded feed), and
    * every trigger re-apportions the fixed document budget over the
    * counts seen so far with the IDENTICAL exact-integer kernel the
    * batch query serves ([[graft.ops.CorpusMix.temperatureAllocation]]:
    * decimal(38,0) quotas + largest-remainder top-up). The live "what
    * should today's mix be" dashboard: after any trigger the emitted
    * allocation is row-identical to batch x63 over the same documents
    * (DocStreamsSpec pins it), so a curation pipeline can switch between
    * the batch and streaming forms without renormalizing anything.
    *
    * Shape: the count aggregate runs in Complete mode — legal to
    * re-emit whole because the result table IS dimension-sized (sources
    * are a catalog, not data); the apportionment is inherently
    * CROSS-source (the remainder rank orders every source), which no
    * per-group stateful operator can express, so it runs inside
    * foreachBatch on the <=|sources|-row count table where the window +
    * decimal machinery is the ordinary batch plan. Nothing
    * corpus-sized crosses a trigger boundary, and replay determinism is
    * the kernel's own (pure integer function of the counts —
    * StreamRestartSpec kill-replays it).
    */
  def temperatureMixMonitor(
      docs: DataFrame,
      alpha: Double,
      budget: Long,
      checkpointPath: String,
      onTrigger: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.select(col("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (counts: DataFrame, batchId: Long) =>
        onTrigger(
          graft.ops.CorpusMix.temperatureAllocation(counts, alpha, budget),
          batchId)
      }
      .start()

  /** Streaming domain-reputation monitor — the unbounded twin of batch
    * x94's stage-0 gate: documents arrive with a raw `url` and `text`,
    * are canonicalized/registrable-domain-keyed with the SAME shared
    * algebra as the batch query ([[graft.ops.UrlOps]]) and quality-scored
    * with the same expressions, and accumulate per-domain state across
    * triggers: a doc count, a decimal-exact quality sum, and a KMV
    * sketch of canonical-URL hashes. Every trigger the emitted gate
    * table (doc count, approx distinct canonical URLs -> dup rate, mean
    * quality, broadcast-blocklist bit, keep) is served via foreachBatch.
    *
    * Bounded state on an unbounded feed: domains are a catalog (the
    * aggregate result table is dimension-sized — Complete mode is legal
    * for exactly that reason, the temperatureMixMonitor argument), and
    * the per-domain state is 1 long + 1 decimal + the k smallest 8-byte
    * hashes — NEVER the URL set, which grows without bound. Below k
    * distinct URLs per domain the sketch is exact (the spec regime —
    * emitted table row-identical to an exact batch twin); above, the
    * (k-1)*P/kth_min estimator (the q29/x60 discipline).
    */
  def domainGateMonitor(
      docs: DataFrame,
      blocklist: Seq[String],
      checkpointPath: String,
      onTrigger: (DataFrame, Long) => Unit,
      k: Int = 256,
      qualityFloor: Double = 0.5,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    require(k > 0, s"kmv width must be positive, got $k")
    val (canon, host) = graft.ops.UrlOps.canonCols(col("url"))
    val perDoc = docs.select(
      graft.ops.UrlOps.registrableDomain(host).as("domain"),
      TextOps.polyHash(canon).as("ch"),
      TextOps.quality(col("text")).as("q"))
    perDoc
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("q").cast("decimal(18,6)")).as("qs"),
        graft.functions.SketchExprs.kMinValues(col("ch"), k).as("kmv"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (t: DataFrame, batchId: Long) =>
        val sp = t.sparkSession
        import sp.implicits._
        val blk = broadcast(blocklist.toDF("domain").withColumn("blocked", lit(1)))
        val mean = col("qs").cast("double") / col("n_docs").cast("double")
        // Clamp to n_docs (round-14 ADVICE): in the estimator regime the
        // (k-1)*P/kth_min estimate can exceed the true distinct count's
        // hard upper bound n_docs, which would serve a NEGATIVE dup_rate —
        // an output batch x94 can never emit. Exact regime is unaffected
        // (size(kmv) <= n_docs by construction there).
        val nUrls = least(
          when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(lit((k - 1).toDouble * TextOps.HashP.toDouble) /
              element_at(col("kmv"), k).cast("double")),
          col("n_docs").cast("double"))
        val served = t
          .withColumn("n_urls", nUrls)
          .join(blk, Seq("domain"), "left")
          .select(col("domain"), col("n_docs"), col("n_urls"),
            mean.as("mean_quality"),
            round(lit(1.0) - col("n_urls") / col("n_docs").cast("double"), 6)
              .as("dup_rate"),
            coalesce(col("blocked"), lit(0)).as("blocked"),
            (coalesce(col("blocked"), lit(0)) === 0 && mean >= qualityFloor)
              .cast("int").as("keep"))
        onTrigger(served, batchId)
      }
      .start()
  }

  /** Fixed bucket-table width for [[dupGramRateMonitor]]: gram hashes
    * fold into this many buckets so streaming state stays bounded on an
    * unbounded gram vocabulary (state = OBSERVED (source, bucket) pairs,
    * <= min(positions seen, sources x width)).
    *
    * Sizing rule (measured, tools.DupGramTrade at sf0.1 — 287k positions,
    * exact rate 0.329): the conservative overshoot tracks the load
    * factor positions/width. Load 4.4 (2^16) saturates (+0.65), load 0.3
    * (2^20) reads +0.14, load 0.02 (2^24) reads +0.009. Size the width
    * >= ~30x expected positions for <1% absolute bias; any fixed width
    * still serves the drift-alarm contract (a templated source leaking
    * in moves the rate regardless of the constant offset), and batch x79
    * remains the exact release number.
    */
  val DupGramBuckets = 1 << 20

  /** Per-(source, bucket) positional gram counts — the shared kernel of
    * the streaming monitor and its batch twin (the spec pins the two
    * row-identical over the same documents).
    */
  def dupGramBucketCounts(
      docs: DataFrame, n: Int, textCol: String = "text",
      buckets: Long = DupGramBuckets.toLong): DataFrame =
    docs.select(col("source"), TextOps.tokens(col(textCol)).as("_tk"))
      .select(col("source"),
        explode(TextOps.positionalGramHashesOfTokens(col("_tk"), n)).as("gh"))
      .select(col("source"), pmod(col("gh"), lit(buckets)).as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("n"))

  /** Roll bucket counts up to the per-source duplicate-position rate: a
    * position is "duplicated" when its bucket holds >1 position
    * CORPUS-WIDE (cross-source, like batch x79's gram counts). Inputs
    * and output are dimension-sized ((sources x buckets) and sources).
    */
  def dupGramRollup(counts: DataFrame): DataFrame = {
    val g = counts.groupBy(col("b")).agg(sum(col("n")).as("gn"))
    counts.join(g, "b")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_positions"),
        sum(when(col("gn") > 1, col("n")).otherwise(0L)).as("n_dup_positions"))
      .select(col("source"), col("n_positions"), col("n_dup_positions"),
        round(col("n_dup_positions").cast("double") / col("n_positions").cast("double"), 6)
          .as("dup_rate"))
  }

  /** Streaming dup-n-gram-rate monitor — the bounded-state twin of batch
    * x79 (Lee et al. 2022's corpus-health number): per-(source, bucket)
    * positional gram counts accumulate in a Complete-mode aggregate
    * (state bounded by sources x [[DupGramBuckets]] forever — exact
    * per-gram counts would grow with the vocabulary), and every trigger
    * rolls the bucket table up to the live per-source dup rate inside
    * foreachBatch (the rate is inherently cross-source, the
    * temperatureMixMonitor placement). Folding grams into buckets makes
    * the estimate one-sidedly CONSERVATIVE — colliding distinct grams
    * can only mark extra positions duplicated, never hide a real dup —
    * so the monitor is the drift alarm ("dup rate just jumped, a
    * templated source is leaking in") while batch x79 remains the exact
    * release number; the bias knob is the positions/width load factor,
    * MEASURED in the [[DupGramBuckets]] sizing table. The spec pins the
    * final trigger row-identical to the batch bucket twin and the
    * bracket vs the exact gram-level rate.
    */
  def dupGramRateMonitor(
      docs: DataFrame,
      n: Int,
      checkpointPath: String,
      onTrigger: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.select(col("source"), TextOps.tokens(col("text")).as("_tk"))
      .select(col("source"),
        explode(TextOps.positionalGramHashesOfTokens(col("_tk"), n)).as("gh"))
      .select(col("source"), pmod(col("gh"), lit(DupGramBuckets.toLong)).as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (counts: DataFrame, batchId: Long) =>
        onTrigger(dupGramRollup(counts), batchId)
      }
      .start()

  /** Compact the band-key store: merge every `batch_id=K` segment with
    * `evictBeforeBatchId <= K <= upToBatchId` into ONE band-sorted segment
    * at `batch_id=upToBatchId`, and DELETE segments older than
    * `evictBeforeBatchId` (the on-disk form of the dedup horizon — keys
    * evicted here stop gating admission, mirroring `ingest`'s watermark
    * eviction). Run periodically between triggers: per-trigger store
    * listing and join input drop from O(batches) files to O(1) per
    * compaction window.
    *
    * Replay safety: only pass an `upToBatchId` that is durably committed in
    * the checkpoint (never the in-flight batch). The compacted segment
    * keeps id `upToBatchId`, so a later batch N's `batch_id < N` store
    * prune still sees every surviving key, and a replay of batch N >
    * upToBatchId behaves identically pre- and post-compaction.
    *
    * Crash ordering: the merged segment is written to a dot-temp dir,
    * swapped in with renames, and only then are the superseded segments
    * deleted — a crash mid-delete leaves DUPLICATE band keys (harmless:
    * admission reads are distinct/semi joins; re-running compaction heals).
    * The one loss window is between the two renames of the `upToBatchId`
    * segment itself; production would fence that behind the same commit
    * log the sink uses.
    */
  def compactStore(
      spark: SparkSession,
      storePath: String,
      upToBatchId: Long,
      evictBeforeBatchId: Long = 0L,
      idCol: String = "doc_id"): Unit = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val segIds = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
    val toEvict = segIds.filter(_ < evictBeforeBatchId)
    val toMerge = segIds.filter(id => id >= evictBeforeBatchId && id <= upToBatchId)
    if (toMerge.size > 1 || toEvict.nonEmpty) {
      val schema = StructType(Seq(
        StructField(idCol, LongType), StructField("band", StringType)))
      val merged =
        if (toMerge.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema)
          .parquet(toMerge.map(id => new Path(root, s"batch_id=$id").toString): _*)
      val tmp = new Path(root, s".compact_tmp_$upToBatchId")
      merged
        .repartitionByRange(col("band"))
        .sortWithinPartitions(col("band"))
        .write.mode("overwrite").parquet(tmp.toString)
      val target = new Path(root, s"batch_id=$upToBatchId")
      val old = new Path(root, s".compact_old_$upToBatchId")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(target)) fs.rename(target, old)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"could not move $tmp to $target")
      (toMerge.filter(_ != upToBatchId) ++ toEvict)
        .foreach(id => fs.delete(new Path(root, s"batch_id=$id"), true))
      fs.delete(old, true)
    }
  }

  /** Segment count in the store — observability for the compaction spec. */
  private[streaming] def storeSegments(spark: SparkSession, storePath: String): Seq[Long] = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong).sorted
  }

  /** The signature store, or its empty shape before the first batch lands.
    * The schema is always supplied explicitly: after a mid-write crash the
    * store directory can exist with zero committed footers (only
    * `_temporary` debris), and schema INFERENCE over that throws — which
    * would wedge the very replay the batch_id layout exists to recover.
    */
  private def readStore(spark: SparkSession, storePath: String, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("band", StringType),
      StructField("batch_id", LongType)))
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(storePath))) spark.read.schema(schema).parquet(storePath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
