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
  def trainOrLoad(s: SparkSession, dir: String, table: String, name: String)(
      train: => DataFrame): DataFrame = {
    val conf = hadoopConf(s)
    val path = new org.apache.hadoop.fs.Path(
      s"$modelRoot/${fingerprint(s, dir, table)}/$name")
    val fs = path.getFileSystem(conf)
    def committed(): Boolean = fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
    if (!committed()) {
      val tmp = new org.apache.hadoop.fs.Path(
        path.getParent, s".${path.getName}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      val trained = train
      trained.write.mode("overwrite").parquet(tmp.toString)
      // the trained frame is committed to parquet and will be served by
      // the read-back below — release its final-generation blocks (a
      // no-op for trainers that return un-cut frames)
      Checkpoints.unpersist(trained)
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
  private[ops] def corpusDescriptor(corpus: DataFrame): String = {
    val desc = corpus.schema.catalogString + "|" +
      corpus.queryExecution.analyzed.canonicalized.toString
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
      nCorpus: Long, medianTop1: Double, isoBaseline: Double, indexable: Boolean)

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
    // FeasibilityExcess must re-measure, never serve a stale verdict
    val eTag = math.round(Similarity.FeasibilityExcess * 100)
    val f = trainOrLoad(s, dir, "embeddings",
      s"feas_q${sampleQ}_d${dim}_e${eTag}_c${corpusDescriptor(corpus)}") {
      Similarity.indexFeasibilitySummary(corpus, dim, sampleQ)
    }
    val r = f.head()
    IndexFeasibility(
      r.getAs[Long]("n_corpus"), r.getAs[Double]("median_top1"),
      r.getAs[Double]("iso_baseline"), r.getAs[Int]("indexable") == 1)
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
