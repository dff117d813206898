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
    *
    * CAVEAT — spreading requires VALUE diversity: the salt is
    * `xxhash64(key, value)`, so every row with an identical (key, value)
    * pair lands on the same salt. For a hot key whose values are constant
    * or low-cardinality the salt stops spreading at the shuffle layer
    * (map-side partial aggregation masks this for sum/count, which
    * collapse duplicates before the shuffle — but the premise weakens for
    * shapes without a partial). When a per-row discriminator exists (a
    * document id, an event id), use the overload below.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    saltedSumCountBy(df, key, value, salts, xxhash64(key, value))

  /** Variant with a caller-supplied per-row discriminator (e.g. an id
    * column) mixed into the salt, so spreading holds even when a hot key's
    * values are constant. The discriminator must be deterministic per row —
    * `monotonically_increasing_id` is layout-dependent (the same data
    * repartitioned differently would spread differently, breaking
    * reproducibility of the partials even though the final aggregate is
    * unaffected).
    */
  def saltedSumCount(
      df: DataFrame, key: Column, value: Column, salts: Int, discriminator: Column): DataFrame =
    saltedSumCountBy(df, key, value, salts, xxhash64(key, value, discriminator))

  private def saltedSumCountBy(
      df: DataFrame, key: Column, value: Column, salts: Int, saltSrc: Column): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // CONTENT-hash salt: deterministic per row content, so the phase-1
    // distribution — the thing this operator exists to control — is
    // identical under any repartition/retry/input order.
    val salted = df.select(key.as("k"), value.as("v"), saltSrc.as("h"))
      .withColumn("salt", pmod(col("h"), lit(salts.toLong)))
    val partial = salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_v"), sum(col("pc")).as("count_v"))
  }
}
