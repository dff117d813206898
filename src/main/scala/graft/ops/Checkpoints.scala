package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cutting for iterative operators (label propagation, k-means,
  * PageRank): materialize the current generation and truncate its plan so
  * later rounds and consumers do not replay the whole training history.
  *
  * Two modes, selected by `spark.graft.checkpoint.reliable`:
  *
  *  - `false` (default) — `localCheckpoint`: blocks live on executors.
  *    Cheapest, right for local mode and for short loops on healthy
  *    clusters, but an executor loss mid-query loses blocks and kills the
  *    job (local checkpoints are exempt from lineage recovery by design).
  *  - `true` — reliable `checkpoint` under `spark.graft.checkpoint.dir`
  *    (or a previously set SparkContext checkpoint dir): blocks are
  *    written to the shared filesystem, so a 1000-executor deploy
  *    survives executor churn mid-iteration at the cost of one
  *    write+read per cut.
  *
  * Both modes return a frame whose plan is a scan of materialized blocks,
  * so the unpersist-parent / re-cache hazard documented at
  * [[Dedup.duplicateClusters]] is avoided identically.
  */
object Checkpoints {
  final val ReliableKey = "spark.graft.checkpoint.reliable"
  final val DirKey = "spark.graft.checkpoint.dir"

  /** Materialize `df` and cut its lineage under the conf-selected mode. */
  def cut(df: DataFrame): DataFrame = cut(df, eager = true)

  /** As [[cut]], but defer materialization to the consumer's first
    * action: the returned plan is already the truncated
    * scan-of-checkpoint, and that action computes and persists the
    * generation in one pass. Right for a FINAL generation consumed
    * exactly once by a serve step — it saves the separate eager
    * materialization pass while keeping the served plan identical.
    */
  def cutLazy(df: DataFrame): DataFrame = cut(df, eager = false)

  /** Best-effort release of a cut frame's materialized blocks, for
    * callers whose lifetime outlives any between-query hygiene sweep —
    * the streaming foreachBatch loop being the canonical case: each
    * micro-batch cuts a fresh spans frame, and without an explicit
    * unpersist those blocks are reclaimed only when driver GC happens to
    * collect the RDD handle (ContextCleaner), so a long-running stream
    * accumulates storage. Walks the analyzed plan's leaves and
    * unpersists every scan-of-checkpoint RDD it finds; a frame that was
    * never cut is a no-op.
    *
    * Reliable-mode caveat: under `spark.graft.checkpoint.reliable=true`
    * this releases the executor BLOCK storage only — the checkpoint
    * FILES under the checkpoint dir are cleaned by Spark's
    * ReferenceTracking cleaner when the RDD is collected (or by the
    * deployment's checkpoint-dir retention policy), so a long-running
    * reliable-mode stream should point `spark.graft.checkpoint.dir` at
    * a location with lifecycle rules.
    *
    * CONTRACT: the frame is DEAD after release. Local checkpoints are
    * exempt from lineage recovery, so once the blocks are dropped the
    * frame (and anything derived from it that was not itself
    * materialized) cannot be recomputed — a consumer added after the
    * release point fails with a missing-block error rather than
    * recomputing. Keep the unpersist as the LAST statement of a
    * foreachBatch body / per-iteration scope, after every consumer of
    * the generation has run.
    */
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  private def cut(df: DataFrame, eager: Boolean): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      if (s.sparkContext.getCheckpointDir.isEmpty) {
        val dir = s.conf.getOption(DirKey).getOrElse(throw new IllegalArgumentException(
          s"$ReliableKey=true requires $DirKey (a shared filesystem path) " +
            "or an already-set SparkContext checkpoint dir"))
        s.sparkContext.setCheckpointDir(dir)
      }
      df.checkpoint(eager = eager)
    } else {
      df.localCheckpoint(eager = eager)
    }
  }
}
