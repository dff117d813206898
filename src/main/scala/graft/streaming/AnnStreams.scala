package graft.streaming

import graft.ops.{AnnModels, Checkpoints, Similarity}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ANN serving under Structured Streaming: queries arrive as a stream,
  * the index is a fixed artifact.
  *
  * The production split this encodes is the same one [[graft.ops.AnnModels]]
  * makes for the batch path: an IVF index is BUILT once (train on the
  * bounded per-cell sample, spill-assign the full corpus — the x106
  * certified profile) and then SERVED by every micro-batch through the
  * exact [[Similarity.ivfSearchTopK]] frame the batch API ranks, so the
  * stream's answers are row-identical to a batch run over the same
  * queries (spec-pinned), and the recall/cost numbers x106 certified
  * apply verbatim to the stream. Rebuilding the index inside
  * foreachBatch would couple serve latency to build cost — the
  * streaming analog of the retrain-per-query anti-pattern.
  *
  * Scale shape: centroids come from the PERSISTED model store
  * ([[AnnModels.ivfCentroidsGated]] — trained on first start, a table
  * read on every restart, with the x109 feasibility verdict measured
  * and logged before the first build pays for itself); the spill
  * assignment is recomputed per start (one corpus scan — it IS the
  * corpus, not a model) and lineage-cut, so each micro-batch touches
  * only the cells its queries probe via the broadcast probe join. Per
  * batch the work is O(spill * nprobe * |corpus| / cells) candidates
  * per query — the certified sublinear fraction. Restart replays only
  * unfinished batches (checkpointed offsets); the sink is one parquet
  * dir per batch, idempotent under replay. When the query terminates
  * (stop or failure) the index's materialized blocks are released —
  * a long-lived session can start and stop serving streams without
  * accumulating corpus-sized storage.
  */
object AnnStreams {

  /** How micro-batches score their candidates.
    *
    *  - [[ExactIvf]]: the x106-certified exact-cosine serve — the
    *    inverted lists carry raw vectors, every candidate is scored
    *    exactly ([[Similarity.ivfSearchTopK]]).
    *  - [[PqRerank]]: the x112-certified composed layout — lists carry
    *    PQ reconstructions (at deployment: m codes + a broadcast
    *    codebook, the 32x scan-bandwidth compression), candidates are
    *    PQ-scored, and only the top `rerankR` per query are re-ranked
    *    with exact cosine ([[Similarity.pqSearchTopK]]). With rerankR
    *    covering the whole candidate set the answers are row-identical
    *    to [[ExactIvf]] (spec-pinned); smaller R trades the
    *    x112-measured recall for raw-vector reads of R rows per query.
    */
  sealed trait ServeProfile
  case object ExactIvf extends ServeProfile
  final case class PqRerank(
      m: Int, subDim: Int, codebookK: Int, rerankR: Int, pqIters: Int = 2) extends ServeProfile

  /** Start the serving stream: for each micro-batch of query vectors
    * (`idCol`, `vecCol`), write the approximate top-`k` neighbours from
    * `corpus` (a frame over the embeddings table at `dir` — the model
    * store key) under the given IVF profile to `sinkPath/batch_id=N`.
    * Pass `cells <= 0` to size cells as ceil(sqrt(|corpus|)) and the
    * training sample at ~50 vectors per cell (the x106 production
    * build); explicit values override for tests.
    *
    * Incremental maintenance (`baseCorpus`): when the corpus is an
    * append-only table whose index was trained in an earlier era, pass
    * that era's frame as `baseCorpus` and the post-era rows as
    * `arrivals`. The serve then runs the measured-maintenance
    * discipline ([[AnnModels.ivfCentroidsMaintained]]): the BASE-era
    * model keeps serving — arrivals spill-assign into its cells, the
    * cheap path — unless the persisted [[AnnModels.rebuildDue]] verdict
    * (sampled arrival recall vs `rebuildRecallFloor`, candidate
    * fraction vs design) fires, in which case the fresh full-corpus
    * model is trained once and served. Restarts re-read both the model
    * and the verdict from the store, so a fleet of serve restarts pays
    * for neither measurement nor training twice.
    */
  def annServeIngest(
      queries: DataFrame,
      corpus: DataFrame,
      dir: String,
      sinkPath: String,
      checkpointPath: String,
      k: Int,
      dim: Int,
      nprobe: Int,
      spill: Int = 2,
      cells: Int = -1,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "v",
      trigger: Trigger = Trigger.AvailableNow(),
      profile: ServeProfile = ExactIvf,
      baseCorpus: Option[DataFrame] = None,
      arrivals: Option[DataFrame] = None,
      rebuildRecallFloor: Double = AnnModels.DefaultRecallFloor): StreamingQuery = {
    require(baseCorpus.isEmpty == arrivals.isEmpty,
      "baseCorpus and arrivals come together: the maintenance verdict needs both eras")
    val s = corpus.sparkSession
    // index BUILD — once, before the stream starts; centroids load from
    // the persisted store on a restart (first start trains + commits)
    val named = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val (nCells, trainMod) =
      if (cells > 0) (cells, 1L)
      else {
        val n = named.count()
        val c = Similarity.sqrtCells(n)
        (c, Similarity.trainSampleMod(n, c))
      }
    val train =
      if (trainMod == 1L) None
      else Some(named.filter(pmod(col("vec_id"), lit(trainMod)) === 0))
    val model = baseCorpus match {
      case Some(base) =>
        // measured-maintenance path: cells stay sized for the FULL
        // corpus in both eras (like-for-like candidate volume)
        val (m, _) = AnnModels.ivfCentroidsMaintained(
          s, dir, named, base.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
          arrivals.get.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
          nCells, iters, dim, nprobe, spill, train = train,
          recallFloor = rebuildRecallFloor)
        m
      case None =>
        val (m, _) = AnnModels.ivfCentroidsGated(
          s, dir, named, nCells, iters, dim, train = train)
        m
    }
    val cents = Checkpoints.cut(
      model.select(col("cell_id").as(idCol), col("cv").as(vecCol)))
    // per-profile serving index + batch body; `cut` frames are the ones
    // released at termination
    val (index, raw, serveBatch) = profile match {
      case ExactIvf =>
        val assigned = Checkpoints.cut(
          Similarity.ivfProbe(corpus, cents, dim, spill, idCol, vecCol))
        (assigned, None: Option[DataFrame],
          (batch: DataFrame) =>
            Similarity.ivfSearchTopK(assigned, batch, cents, k, dim, nprobe, idCol, vecCol))
      case PqRerank(m, subDim, codebookK, rerankR, pqIters) =>
        val cb = AnnModels.pqCodebooks(s, dir, named, m, subDim, codebookK, pqIters)
        val lists = Checkpoints.cut(
          Similarity.pqLists(named, cents, cb, dim, subDim, spill, "vec_id", "v")
            .select(col("vec_id").as(idCol), col("cell_id"), col("rv")))
        // the exact re-rank's raw-vector fetch (R rows per query) — cut
        // so a micro-batch reads materialized blocks, not the source scan
        val rawVecs = Checkpoints.cut(corpus.select(col(idCol), col(vecCol)))
        (lists, Some(rawVecs),
          (batch: DataFrame) =>
            Similarity.pqSearchTopK(lists, rawVecs, batch, cents, k, rerankR, dim, nprobe,
              idCol, vecCol))
    }
    val q = queries.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        serveBatch(batch)
          .write.mode("overwrite")
          .parquet(new Path(sinkPath, s"batch_id=$batchId").toString)
        ()
      }
      .start()
    // release the index's materialized blocks when the query terminates
    // (Checkpoints.unpersist contract: the frames are DEAD afterwards —
    // nothing may consume them past this point, and nothing does: the
    // foreachBatch loop is the sole consumer and it has stopped)
    val releaser = new Thread(() => {
      try q.awaitTermination()
      catch { case _: Throwable => () }
      Checkpoints.unpersist(index)
      raw.foreach(Checkpoints.unpersist)
      Checkpoints.unpersist(cents)
    })
    releaser.setName(s"ann-serve-release-${q.id}")
    releaser.setDaemon(true)
    releaser.start()
    q
  }
}
