package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once / read-many store for ANN index models (IVF k-means
  * centroids, PQ codebooks).
  *
  * At 100 TB an ANN model is a build artifact: trained once by an index
  * build step, persisted as a (tiny) table, and READ by every serving
  * query — retraining inside each query would replay the training DAG per
  * query and couple serving latency to training cost. This object is that
  * build step: `trainOrLoad` trains a model the first time a (dataset,
  * model) pair is seen, writes it to a parquet table under a
  * fingerprinted path, and afterwards serves the persisted table. Training
  * is deterministic ([[Similarity.kmeansCentroids]] /
  * [[Similarity.pqCodebooks]]: fixed seeds, decimal-quantized means), so
  * the persisted model is bit-identical to an in-query retrain — hashes
  * do not change, only where the work happens.
  *
  * Staleness: the store key includes a fingerprint of the source table's
  * parquet files (path, length, mtime). Regenerated fixtures get a new
  * fingerprint and therefore a fresh training run; a stale model can never
  * be served against new data. Reference analogue: the reference fetches
  * and caches its EPT catalog once, then serves lookups from the cached
  * frame (scripts/usgs_lidar.py:60-74) — same artifact-vs-query split.
  */
object AnnModels {

  /** Root for persisted models — outside the repo (models are build
    * artifacts, not source), namespaced per user so two accounts on one
    * machine cannot collide on a world-shared directory. Override with
    * GRAFT_MODEL_DIR (e.g. to a shared filesystem on a cluster).
    */
  private[ops] def modelRoot: String =
    sys.env.getOrElse(
      "GRAFT_MODEL_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft_models_${System.getProperty("user.name", "anon")}")

  private def hadoopConf(s: SparkSession): org.apache.hadoop.conf.Configuration =
    s.sparkContext.hadoopConfiguration

  /** Cheap dataset fingerprint: hash of every part-file's (path, length,
    * mtime) under `dir`/`table`.parquet, listed through the Hadoop
    * FileSystem API so hdfs:// and object-store paths fingerprint their
    * REAL file statuses (a java.io.File probe would see nothing there and
    * collapse every remote dataset to one constant fingerprint — i.e.
    * serve stale models). Driver-side metadata only — no Spark job; on
    * object stores this is one recursive LIST.
    */
  private[ops] def fingerprint(s: SparkSession, dir: String, table: String): String = {
    val root = new org.apache.hadoop.fs.Path(dir, s"$table.parquet")
    val fs = root.getFileSystem(hadoopConf(s))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        parts += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
    }
    val desc = parts.sorted.mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5").digest(desc.getBytes("UTF-8"))
    md.take(8).map(b => f"$b%02x").mkString
  }

  /** Serve `name` for the dataset at (`dir`, `table`): read the persisted
    * model if present (parquet `_SUCCESS` marker, checked through the
    * Hadoop FS), else run `train`, COMMIT it atomically, and read it
    * back. Commit = write to a process-unique temp dir then rename into
    * place: two JVMs racing the same missing model each write their own
    * temp (training is deterministic, so the contents are identical) and
    * the rename loser simply discards its copy — no reader ever observes
    * a half-written directory. The read-back (rather than returning the
    * training frame) pins the serving plan to a plain parquet scan of a
    * model-sized table in BOTH branches.
    *
    * Commit is verified by POST-CONDITION, never by `rename`'s return
    * value: Hadoop `FileSystem.rename(tmp, path)` with an EXISTING
    * destination directory moves tmp INSIDE path and still returns true
    * (HDFS and RawLocalFileSystem alike), so the return value cannot
    * distinguish "committed" from "nested into a racing winner's dir" or
    * "nested into a crashed half-commit". After each rename attempt:
    * if `path/_SUCCESS` exists a winner committed — drop our copy
    * (standalone or nested) and serve the winner; otherwise `path` is a
    * crashed half-commit — recover our payload if it was nested, delete
    * the stale husk, and RETRY the rename, so the store self-repairs
    * instead of failing on an opaque parquet schema error forever.
    */
  private[ops] def modelPath(
      s: SparkSession, dir: String, table: String, name: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$modelRoot/${fingerprint(s, dir, table)}/$name")

  def trainOrLoad(s: SparkSession, dir: String, table: String, name: String)(
      train: => DataFrame): DataFrame = {
    val conf = hadoopConf(s)
    val path = modelPath(s, dir, table, name)
    val fs = path.getFileSystem(conf)
    def committed(): Boolean = fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
    if (!committed()) {
      val tmp = new org.apache.hadoop.fs.Path(
        path.getParent, s".${path.getName}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      // Snapshot persisted RDD ids BEFORE the train block runs: the
      // release below must free ONLY blocks the training itself created.
      // A blanket Checkpoints.unpersist(trained) walks the trained
      // frame's full lineage — when a trainer returns an UN-CUT frame
      // (indexFeasibilitySummary), that lineage still contains the
      // CALLER's lineage-cut corpus, and unpersisting those local-
      // checkpoint blocks kills every later consumer of the corpus with
      // an unrecoverable missing-block error (local checkpoints are
      // exempt from lineage recovery). Diffing against the pre-train
      // snapshot releases a cut trainer's final generation (kmeans/PQ
      // models) while leaving caller-owned blocks untouched.
      val preTrainRddIds = s.sparkContext.getPersistentRDDs.keySet
      val trained = train
      trained.write.mode("overwrite").parquet(tmp.toString)
      trained.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD
            if !preTrainRddIds.contains(l.rdd.id) =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
      fs.mkdirs(path.getParent)
      val nested = new org.apache.hadoop.fs.Path(path, tmp.getName)
      var attempts = 0
      var done = false
      while (!done && attempts < 3) {
        attempts += 1
        fs.rename(tmp, path)
        if (committed()) {
          // A complete model is in place (ours, or a racing winner's with
          // our copy nested inside it). Remove whichever copy of ours did
          // not become the served model.
          if (fs.exists(nested)) fs.delete(nested, true)
          if (fs.exists(tmp)) fs.delete(tmp, true)
          done = true
        } else {
          // `path` exists without _SUCCESS: a crashed half-commit. Pull our
          // payload back out if the rename nested it, remove the husk, and
          // retry — next rename finds no destination and commits cleanly.
          // Re-check committed() immediately before the delete: a racing
          // writer may have committed since the branch check, and deleting
          // then would briefly destroy a live model under a concurrent
          // reader. If it did commit, skip the delete — the next loop
          // iteration observes the winner and cleans up our copy.
          if (fs.exists(nested) && !fs.exists(tmp)) fs.rename(nested, tmp)
          if (!committed()) fs.delete(path, true)
        }
      }
      require(done || committed(),
        s"model commit did not converge after $attempts attempts at $path — remove it and retry")
    }
    s.read.parquet(path.toString)
  }

  /** Descriptor of the corpus FRAME, not just its underlying table: MD5 of
    * the schema plus the canonicalized analyzed plan (expression ids
    * normalized, so the same logical derivation names the same model across
    * sessions). Folded into the model name so a caller passing a filtered
    * or derived corpus with the same hyperparameters trains and serves its
    * OWN model instead of silently sharing one trained on different rows —
    * while the common case (several queries serving the identical
    * full-table plan) still shares a single artifact.
    */
  /** Content-hash memo for lineage-cut corpora: a cut frame's rows are
    * immutable for the life of its RDD (local checkpoints are
    * materialized blocks, never recomputed), so two descriptor
    * constructions over the SAME canonicalized plan reading the SAME
    * leaf RDD ids must hash the same rows — the scan can be paid once
    * per session instead of once per model-name construction
    * ([[rebuildDue]] alone builds three names per consult). Keyed by
    * (application id, sorted leaf RDD ids, plan descriptor): RDD ids
    * are never reused within a SparkContext, and the plan descriptor
    * disambiguates two frames deriving differently from the same cut
    * leaf (a filter on top selects different rows). Bounded: cleared
    * wholesale past 4096 entries (entries are tiny; the bound only
    * guards a pathological model-name loop).
    */
  private val contentMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def corpusDescriptor(corpus: DataFrame): String = {
    val analyzed = corpus.queryExecution.analyzed
    val planDesc = corpus.schema.catalogString + "|" + analyzed.canonicalized.toString
    // A lineage-cut frame's canonicalized plan is a schema-only
    // LogicalRDD scan — every cut corpus with the same schema would
    // collapse to ONE descriptor, and two different cut corpora under
    // the same table fingerprint would silently share a persisted model
    // (wrong centroids, silent recall loss). When the plan contains a
    // LogicalRDD leaf, fold a CONTENT hash into the descriptor: row
    // count plus an order-independent XOR of per-row xxhash64 over all
    // columns — stable across restarts of identical data, different for
    // different rows. Cost: one scan of the (already materialized)
    // blocks, paid once per (plan, leaf RDDs) per session via
    // [[contentMemo]]; plans without cut leaves (the parquet-scan
    // common case) keep the zero-cost plan-only descriptor.
    val cutLeafIds = analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    def scanContent(): String = {
      import org.apache.spark.sql.functions.{col, count, lit, xxhash64}
      val r = corpus
        .select(xxhash64(corpus.columns.map(col): _*).as("h"))
        .agg(count(lit(1)).as("n"),
          org.apache.spark.sql.functions.expr("bit_xor(h)").as("x"))
        .head()
      s"|rows=${r.getAs[Long]("n")}|xor=${r.getAs[Long]("x")}"
    }
    val content =
      if (cutLeafIds.isEmpty) ""
      else {
        val memoKey = corpus.sparkSession.sparkContext.applicationId + "|" +
          cutLeafIds.sorted.mkString(",") + "|" + planDesc
        if (contentMemo.size() > 4096) contentMemo.clear()
        contentMemo.computeIfAbsent(memoKey, _ => scanContent())
      }
    val desc = planDesc + content
    val md = java.security.MessageDigest.getInstance("MD5").digest(desc.getBytes("UTF-8"))
    md.take(4).map(b => f"$b%02x").mkString
  }

  /** Trained IVF centroids for the embeddings table at `dir` (seeded from
    * vec_id < k, `iters` deterministic k-means rounds). Columns:
    * (cell_id, cv). `train` optionally restricts the k-means TRAINING
    * corpus (the x106 bounded-sample build — see
    * [[Similarity.trainSampleMod]]); seeds always come from the full
    * `corpus` so the init is sample-independent. The model name folds in
    * BOTH frames' descriptors: a different training slice is a different
    * artifact.
    */
  def ivfCentroids(
      s: SparkSession, dir: String, corpus: DataFrame, k: Int, iters: Int, dim: Int,
      train: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val trainCorpus = train.getOrElse(corpus)
    val tdesc = train.map(t => s"_t${corpusDescriptor(t)}").getOrElse("")
    trainOrLoad(s, dir, "embeddings",
      s"ivf_k${k}_i${iters}_c${corpusDescriptor(corpus)}$tdesc") {
      Similarity.kmeansCentroids(trainCorpus, corpus.filter(col("vec_id") < k), iters, dim)
    }
  }

  /** Measured index-feasibility verdict for a corpus (see
    * [[Similarity.indexFeasibilitySummary]] / the x109 audit).
    * `indexable` = the sample's median exact top-1 cosine clears 2x the
    * isotropic random-match line — the regime where a partitioning
    * index buys sublinear serve cost; below it, recall/cost goes
    * near-linear for ANY such index and the certified x106 numbers are
    * floors to budget against, not speedups to assume.
    */
  final case class IndexFeasibility(
      nCorpus: Long, medianTop1: Double, p10Top1: Double, isoBaseline: Double,
      indexable: Boolean, tailIndexable: Boolean)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Measure (once) and persist the feasibility verdict for `corpus` —
    * the same store discipline as the models themselves: the one-row
    * summary is a build artifact keyed by (dataset fingerprint, corpus
    * descriptor), so the corpus-scan cost is paid once per corpus, and
    * every later build consults a table read.
    */
  def indexFeasibility(
      s: SparkSession, dir: String, corpus: DataFrame, dim: Int,
      sampleQ: Int = 50): IndexFeasibility = {
    // the gate threshold is part of the artifact name: a recalibrated
    // FeasibilityExcess must re-measure, never serve a stale verdict.
    // feas2 = the r20 schema (p10/tail columns) — r19 feas artifacts
    // keep their old name and are simply never read again.
    val eTag = math.round(Similarity.FeasibilityExcess * 100)
    val name = s"feas2_q${sampleQ}_d${dim}_e${eTag}_c${corpusDescriptor(corpus)}"
    val f = trainOrLoad(s, dir, "embeddings", name) {
      Similarity.indexFeasibilitySummary(corpus, dim, sampleQ)
    }
    f.limit(1).collect().headOption match {
      case Some(r) =>
        IndexFeasibility(
          r.getAs[Long]("n_corpus"), r.getAs[Double]("median_top1"),
          r.getAs[Double]("p10_top1"),
          r.getAs[Double]("iso_baseline"), r.getAs[Int]("indexable") == 1,
          r.getAs[Int]("tail_indexable") == 1)
      case None =>
        // A degenerate corpus (< 2 rows, or no ids in [0, sampleQ) — the
        // sample-query window) measures to an EMPTY summary; if that
        // were left committed, every retry for this fingerprint would
        // serve the poisoned empty artifact. Delete it and fail with the
        // actionable cause instead of a bare NoSuchElementException.
        val p = modelPath(s, dir, "embeddings", name)
        p.getFileSystem(hadoopConf(s)).delete(p, true)
        throw new IllegalArgumentException(
          s"index feasibility summary for $dir came back empty: the corpus needs >= 2 " +
            s"vectors and ids intersecting [0, $sampleQ) (the fixed sample-query window). " +
            "The empty artifact was removed; fix the corpus (or re-id it zero-based) and retry.")
    }
  }

  /** [[ivfCentroids]] behind the feasibility gate: measure (or load) the
    * x109 verdict FIRST, surface it (log line + returned metadata), and
    * only then pay for the k-means build. With `requireIndexable = true`
    * a corpus measured non-indexable refuses the build — the
    * measure-before-you-build discipline as a hard gate; the default
    * builds anyway (the x106-certified floors still hold) but the
    * caller gets the verdict to budget with.
    */
  def ivfCentroidsGated(
      s: SparkSession, dir: String, corpus: DataFrame, k: Int, iters: Int, dim: Int,
      train: Option[DataFrame] = None,
      requireIndexable: Boolean = false): (DataFrame, IndexFeasibility) = {
    val feas = indexFeasibility(s, dir, corpus, dim)
    log.info(
      s"IVF build feasibility for $dir (N=${feas.nCorpus}): median top-1 cosine " +
        s"${feas.medianTop1} vs isotropic line ${feas.isoBaseline} -> " +
        (if (feas.indexable) "indexable (cluster structure present; certified recalls are lower bounds)"
         else "NOT indexable (isotropic regime; serve cost is the measured linear fraction, x106)"))
    require(!requireIndexable || feas.indexable,
      s"corpus at $dir measured NOT indexable (median top-1 ${feas.medianTop1} < " +
        s"isotropic line ${feas.isoBaseline} + ${Similarity.FeasibilityExcess}, " +
        s"N=${feas.nCorpus}): an IVF index cannot be sublinear at production recall " +
        "here — budget for the measured x106 candidate fractions, or pass " +
        "requireIndexable = false to build anyway")
    (ivfCentroids(s, dir, corpus, k, iters, dim, train), feas)
  }

  /** Measured staleness verdict for a served IVF model (the x114 audit
    * made load-bearing — the x109 -> [[ivfCentroidsGated]] pattern
    * applied to index maintenance): is a REBUILD due, or can arrivals
    * keep spill-assigning into the existing cells?
    *
    *  - `recallArrivals`: recall@`k` of the stale serve (this model, the
    *    production probe profile) ON THE ARRIVAL SAMPLE, against exact
    *    brute-force truth over the full corpus. x114 measured drift
    *    concentrating exactly there: shifted arrivals lose recall
    *    (0.760 vs 0.970 on the shifted population) while base queries
    *    hold — so the arrival sample is where a trigger must look.
    *  - `candFraction`: measured mean candidate fraction per query vs
    *    `designFraction` (spill * nprobe / ceil(sqrt N) — the profile's
    *    sizing point). On STATIONARY arrivals staleness shows up as
    *    cost, not recall (x114: +28 % candidates at zero recall loss);
    *    the fraction axis catches that regime.
    *
    * `rebuildDue` = recall below the floor OR fraction above the cap.
    */
  final case class RebuildVerdict(
      nCorpus: Long, nArrivals: Long, nSample: Long,
      recallArrivals: Double, candFraction: Double, designFraction: Double,
      recallFloor: Double, candFractionMax: Double, rebuildDue: Boolean)

  /** One-row staleness measurement (threshold-free — thresholds are
    * applied by [[rebuildDue]] at read time, so recalibrating a floor
    * never forces a re-measure): serve the `sampleQ` lowest-id arrival
    * vectors through the model at (nprobe, spill), score against
    * brute-force truth on the full corpus. Columns: n_corpus,
    * n_arrivals, n_sample, sum_hits, sum_cands. All counts — a DISCRETE
    * summary, engine-reproducible like the feasibility audit's.
    * Lowest-id is the deterministic, oracle-mirrorable pick; on an
    * append-only table whose NEWEST rows drift fastest, pass a
    * recency-filtered `arrivals` frame (e.g. the last ingest window)
    * so the sample reads the newest regime, not the oldest arrivals.
    *
    * Scale: truth + assignment are the standard certification cost
    * (corpus scans against a broadcast bounded sample), paid once per
    * (corpus, arrivals, model) state because [[rebuildDue]] persists
    * this row as a store artifact. No lineage cut is held — stream
    * starts consulting the verdict keep zero-leak storage hygiene.
    */
  private[graft] def rebuildSummary(
      corpus: DataFrame, arrivals: DataFrame, model: DataFrame,
      dim: Int, nprobe: Int, spill: Int, sampleQ: Int, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cents = model.select(col("cell_id").as(idCol), col("cv").as(vecCol))
    val qs = arrivals.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(sampleQ)
    val truth = Similarity.bruteForceTopK(corpus, qs, k, idCol, vecCol, dim)
      .select(col("qid"), col(idCol))
    val assigned = Similarity.ivfProbe(corpus, cents, dim, spill, idCol, vecCol)
    val scored = Similarity.ivfCandidates(assigned, qs, cents, dim, nprobe, idCol, vecCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    val hits = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .join(truth, Seq("qid", idCol))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    val nc = scored.groupBy(col("qid")).agg(count(lit(1)).as("n_cands"))
    val perQ = qs.select(col(idCol).as("qid"))
      .join(nc, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
    perQ
      .agg(
        count(lit(1)).as("n_sample"),
        coalesce(sum(col("n_hit")), lit(0L)).cast("long").as("sum_hits"),
        coalesce(sum(col("n_cands")), lit(0L)).cast("long").as("sum_cands"))
      .crossJoin(broadcast(corpus.agg(count(lit(1)).as("n_corpus"))))
      .crossJoin(broadcast(arrivals.agg(count(lit(1)).as("n_arrivals"))))
      .select(col("n_corpus"), col("n_arrivals"), col("n_sample"),
        col("sum_hits"), col("sum_cands"))
  }

  /** Measure (once, persisted) and decide: is a rebuild of `model` due
    * for `corpus` given `arrivals` (the rows that did not exist when
    * the model was trained)? `recallFloor` should be the profile's
    * recall target ON AN INDEXABLE corpus ([[Similarity.suggestIvf]]'s
    * targetRecall — on a corpus the feasibility gate already measured
    * non-indexable, absolute recall is the certified x106 floor and
    * this trigger is not the right tool). `candFractionMax < 0` means
    * 2x the profile's design fraction. No arrivals = nothing stale:
    * the verdict is quiet by construction.
    */
  /** Default recall floor of [[rebuildDue]] — the suggestIvf default
    * target; named so the x116 audit query and the API provably apply
    * the same threshold.
    */
  val DefaultRecallFloor = 0.9

  def rebuildDue(
      s: SparkSession, dir: String, corpus: DataFrame, arrivals: DataFrame,
      model: DataFrame, dim: Int, nprobe: Int, spill: Int,
      sampleQ: Int = 50, k: Int = 10,
      recallFloor: Double = DefaultRecallFloor, candFractionMax: Double = -1.0,
      idCol: String = "vec_id", vecCol: String = "v"): RebuildVerdict = {
    val name = s"rebuild_q${sampleQ}_k${k}_np${nprobe}_sp${spill}_d${dim}" +
      s"_c${corpusDescriptor(corpus)}_a${corpusDescriptor(arrivals)}_m${corpusDescriptor(model)}"
    val f = trainOrLoad(s, dir, "embeddings", name) {
      rebuildSummary(corpus, arrivals, model, dim, nprobe, spill, sampleQ, k, idCol, vecCol)
    }
    val r = f.head()
    val nCorpus = r.getAs[Long]("n_corpus")
    val nSample = r.getAs[Long]("n_sample")
    val recall =
      if (nSample == 0L) 1.0
      else r.getAs[Long]("sum_hits").toDouble / (k.toDouble * nSample)
    val candFraction =
      if (nSample == 0L || nCorpus == 0L) 0.0
      else r.getAs[Long]("sum_cands").toDouble / (nSample.toDouble * nCorpus)
    val designFraction =
      if (nCorpus == 0L) 1.0
      else spill.toDouble * nprobe / Similarity.sqrtCells(nCorpus)
    val cap = if (candFractionMax > 0) candFractionMax else 2.0 * designFraction
    val due = recall < recallFloor || candFraction > cap
    val v = RebuildVerdict(nCorpus, r.getAs[Long]("n_arrivals"), nSample,
      recall, candFraction, designFraction, recallFloor, cap, due)
    log.info(
      s"index staleness for $dir (N=${v.nCorpus}, arrivals=${v.nArrivals}): recall@$k on the " +
        s"arrival sample ${v.recallArrivals} vs floor ${v.recallFloor}; candidate fraction " +
        s"${v.candFraction} vs cap ${v.candFractionMax} (design ${v.designFraction}) -> " +
        (if (due) "REBUILD DUE" else "serving within profile; keep assigning arrivals in"))
    v
  }

  /** The incremental-maintenance discipline end to end (x114's
    * measurement as the decision): serve the BASE-era model — arrivals
    * spill-assign into its cells, the cheap path — until the measured
    * [[rebuildDue]] verdict fires, then train the fresh full-corpus
    * model (a NEW store artifact: the corpus descriptor differs, so the
    * stale model is never overwritten and a rollback is a table read).
    * `cells` should be sized for the FULL corpus in both eras
    * (like-for-like candidate volume — the x114 arms' rule). Returns
    * the model to serve plus the verdict that chose it.
    */
  def ivfCentroidsMaintained(
      s: SparkSession, dir: String, corpus: DataFrame, base: DataFrame,
      arrivals: DataFrame, cells: Int, iters: Int, dim: Int,
      nprobe: Int, spill: Int,
      train: Option[DataFrame] = None,
      sampleQ: Int = 50, k: Int = 10,
      recallFloor: Double = DefaultRecallFloor,
      candFractionMax: Double = -1.0): (DataFrame, RebuildVerdict) = {
    val baseModel = ivfCentroids(s, dir, base, cells, iters, dim)
    val verdict = rebuildDue(s, dir, corpus, arrivals, baseModel, dim, nprobe, spill,
      sampleQ, k, recallFloor, candFractionMax)
    if (!verdict.rebuildDue) (baseModel, verdict)
    else (ivfCentroids(s, dir, corpus, cells, iters, dim, train), verdict)
  }

  /** Trained PQ codebooks for the embeddings table at `dir`. Columns:
    * (subspace, cell_id, cv).
    */
  def pqCodebooks(
      s: SparkSession, dir: String, corpus: DataFrame,
      m: Int, subDim: Int, k: Int, iters: Int): DataFrame =
    trainOrLoad(s, dir, "embeddings", s"pq_m${m}_k${k}_i${iters}_c${corpusDescriptor(corpus)}") {
      Similarity.pqCodebooks(corpus, m, subDim, k, iters)
    }
}
