package graft.streaming

import graft.ops.{Checkpoints, Similarity}
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
  * Scale shape: centroids and the assignment are built ONCE at stream
  * start and lineage-cut (the assignment is corpus-sized but
  * partitioned; each micro-batch touches only the cells its queries
  * probe via the broadcast probe join); per batch the work is
  * O(spill * nprobe * |corpus| / cells) candidates per query — the
  * certified sublinear fraction. Restart replays only unfinished
  * batches (checkpointed offsets); the sink is one parquet dir per
  * batch, idempotent under replay.
  */
object AnnStreams {

  /** Start the serving stream: for each micro-batch of query vectors
    * (`idCol`, `vecCol`), write the approximate top-`k` neighbours from
    * `corpus` under the given IVF profile to `sinkPath/batch_id=N`.
    * Pass `cells <= 0` to size cells as ceil(sqrt(|corpus|)) and the
    * training sample at ~50 vectors per cell (the x106 production
    * build); explicit values override for tests.
    */
  def annServeIngest(
      queries: DataFrame,
      corpus: DataFrame,
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
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // index BUILD — once, before the stream starts
    val n = corpus.count()
    val nCells = if (cells > 0) cells else Similarity.sqrtCells(n)
    val trainMod = if (cells > 0) 1L else Similarity.trainSampleMod(n, nCells)
    val train = corpus.filter(pmod(col(idCol), lit(trainMod)) === 0)
    val cents = Checkpoints.cut(
      Similarity.kmeansCentroids(
        train, corpus.filter(col(idCol) < nCells), iters, dim, idCol, vecCol)
        .select(col("cell_id").as(idCol), col("cv").as(vecCol)))
    val assigned = Checkpoints.cut(
      Similarity.ivfProbe(corpus, cents, dim, spill, idCol, vecCol))
    queries.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.ivfSearchTopK(assigned, batch, cents, k, dim, nprobe, idCol, vecCol)
          .write.mode("overwrite")
          .parquet(new Path(sinkPath, s"batch_id=$batchId").toString)
        ()
      }
      .start()
  }
}
