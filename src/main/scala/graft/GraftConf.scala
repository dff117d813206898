package graft

/** The 100 TB cluster posture as a programmatic conf map — the same
  * block the README documents for operators, kept in code so it cannot
  * drift silently (GraftConfSpec applies every entry to a live session).
  * Values assume ~1000 executors x 4 cores against O(100 TB) parquet;
  * the load-bearing caveats (OptimizeSkewedJoin match shape, eager
  * broadcast for late-AQE cases) live with the operators that earned
  * them and in SURVEY §8.
  */
object GraftConf {

  val cluster: Map[String, String] = Map(
    // ~2-3x total cores; AQE coalesces downward
    "spark.sql.shuffle.partitions" -> "4000",
    // 128-256 MB map tasks
    "spark.sql.files.maxPartitionBytes" -> "268435456",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // AQE small-shuffle coalescing floor raised 1m -> 16m (round 20/21,
    // measured -11.7% suite A/B): this engine's many dimension-sized
    // intermediate shuffles (allocation frames, model frames, band
    // histograms) are task-overhead-bound below 16 MB, and the
    // bytes-first 1m floor over-parallelizes them. Conservative at
    // scale: far below the 100MB-1GB partition-sizing target, and a
    // 50 MB frame does not want 50 tasks on a 2000-core cluster either.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16m",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "268435456",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5",
    "spark.sql.autoBroadcastJoinThreshold" -> "268435456",
    // iterative lineage cuts survive executor loss (ops.Checkpoints)
    ops.Checkpoints.ReliableKey -> "true",
    ops.Checkpoints.DirKey -> "hdfs:///graft/checkpoints",
    // streaming state off-heap at feed scale
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Apply to a session (runtime-settable keys only — which all of the
    * above are, so a notebook can adopt the posture post-startup too).
    */
  def apply(s: org.apache.spark.sql.SparkSession): Unit =
    cluster.foreach { case (k, v) => s.conf.set(k, v) }
}
