package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * At 100 TB a single hot key (one viral document source, one default
  * region) can make one reducer the straggler for a whole stage. Salted
  * two-phase aggregation spreads a hot key over `salts` reducers in phase 1
  * (partial aggregates per (key, salt)), then combines the small per-salt
  * partials in phase 2. Works for any algebraic aggregate (sum/count/min/
  * max); AQE's skew-join handling covers the join side.
  */
object Skew {

  /** Salted sum/count aggregation: semantically identical to
    * `df.groupBy(key).agg(sum(value), count(*))` but with the shuffle for
    * hot keys spread across `salts` partitions.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // CONTENT-hash salt: deterministic per row VALUE, so the phase-1
    // distribution — the thing this operator exists to control — is
    // identical under any repartition/retry/input order. (A
    // monotonically_increasing_id salt is layout-dependent: the same data
    // repartitioned differently would spread differently, which breaks
    // reproducibility of the partials even though the final aggregate is
    // unaffected.)
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(xxhash64(col("k"), col("v")), lit(salts.toLong)))
    val partial = salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_v"), sum(col("pc")).as("count_v"))
  }
}
