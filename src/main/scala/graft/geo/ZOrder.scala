package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for 2-D data layout — the octree-locality
  * analog for flat parquet tiles. Range-partitioning on x alone gives tiles
  * tight x ranges but full-width y ranges, so a y-only (or small-bbox)
  * query prunes nothing on y; sorting by the interleaved key gives every
  * tile a tight range in BOTH dimensions, which is exactly what the
  * reference's EPT octree provides its nodes spatially
  * (`/root/reference/pipeline.json:4-6` prunes on 2-D bounds).
  *
  * Pure Column bit arithmetic (quantize each axis to `bits`, interleave):
  * codegen-friendly, no UDF, usable directly in
  * `repartitionByRange(zorder(...)).sortWithinPartitions(zorder(...))`
  * at write time. Layout-only: queries never need the key — pruning works
  * through ordinary min/max footer statistics on x and y.
  */
object ZOrder {

  /** Morton key: x and y quantized to `bits` each over their [min, max]
    * domains, bits interleaved (x even positions, y odd). Out-of-domain
    * values clamp to the edge cells. NULL coordinates also land in cell 0
    * (Spark's greatest/least skip nulls) — filter nulls first if clustering
    * them at the origin tile is not what the layout wants.
    */
  def interleave(
      x: Column, y: Column,
      minX: Double, maxX: Double, minY: Double, maxY: Double,
      bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val cells = (1L << bits) - 1
    def quantize(c: Column, lo: Double, hi: Double): Column =
      least(
        lit(cells),
        greatest(lit(0L), floor((c - lit(lo)) / lit(hi - lo) * cells).cast("long")))
    val qx = quantize(x, minX, maxX)
    val qy = quantize(y, minY, maxY)
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_.bitwiseOR(_))
  }
}
