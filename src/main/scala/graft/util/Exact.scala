package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric aggregation helpers.
  *
  * Double-precision `sum`/`avg` are order-dependent (partial aggregates merge
  * in nondeterministic partition order), so a Spark result can differ from a
  * sequential DuckDB oracle in the low bits — and at 100 TB the partition
  * count (hence summation tree) changes run to run. Casting each row to a
  * fixed-scale decimal BEFORE the sum makes the aggregate exact and
  * order-independent; the final cast back to double is then deterministic.
  * The oracle SQL mirrors the same construction
  * (`CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`).
  */
object Exact {
  /** Order-independent sum: per-row decimal quantization, exact decimal sum,
    * result as double. Scale 18 holds ~600k rows * 1e5 magnitude with scale 4
    * to spare; Spark widens the sum type to DECIMAL(28,s) internally.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean via exact decimal sum / count.
    *
    * Deliberately NOT rounded: both engines derive the identical double
    * (exact decimal -> nearest double -> divide by the same count), so the
    * values hash-match as-is — and rounding them is actively dangerous:
    * decimal-quantized averages land on exact .5 ties at the rounding
    * digit (e.g. sum(4dp)/2), where Spark's HALF_UP (on the double's exact
    * decimal expansion) and DuckDB's half-to-even (on the scaled double)
    * disagree. Rounding belongs only on values with genuine cross-engine
    * ulp noise (libm transcendentals, engine-internal fold orders), where
    * tie landings are measure-zero. `outScale` is retained for source
    * compatibility and ignored.
    */
  def davg(c: Column, scale: Int = 4, outScale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))
}
