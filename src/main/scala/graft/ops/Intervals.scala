package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) join — point-in-interval as an EQUI-join,
  * the 1-D sibling of [[CatalogOps.matchRegionsIndexed]].
  *
  * Spark plans a raw `pt BETWEEN start AND end` join as a nested loop
  * (O(points x intervals)). Here each interval is assigned the power-of-two
  * level `l` with `2^l >= length`, so it covers at most TWO cells at its
  * own level — constant fan-out per interval regardless of length. A point
  * lands in exactly one cell per distinct level (the distinct-level frame
  * is broadcast; <= ~60 rows ever), candidates equi-join on (level, cell),
  * and the exact between-filter removes false positives. Lossless — results
  * are identical to the nested-loop form, so oracles stay plain theta SQL.
  *
  * 100 TB posture: both sides shuffle-partition on (level, cell); nothing
  * data-sized is broadcast; skew is bounded because a cell at level l only
  * collects intervals of length ~2^l that overlap it.
  */
object Intervals {

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String = "t",
      startCol: String = "start",
      endCol: String = "end"): DataFrame = {
    val span = greatest(col(endCol) - col(startCol), lit(1.0))
    val iv = intervals
      .withColumn("lvl", ceil(log(2.0, span)).cast("int"))
      .withColumn("cs", pow(lit(2.0), col("lvl")))
      .withColumn("cell", explode(sequence(
        floor(col(startCol) / col("cs")).cast("long"),
        floor(col(endCol) / col("cs")).cast("long"))))
      .drop("cs")
    val levels = iv.select("lvl").distinct()
    val probes = points.crossJoin(broadcast(levels))
      .withColumn("cell", floor(col(ptCol) / pow(lit(2.0), col("lvl"))).cast("long"))
    probes.join(iv, Seq("lvl", "cell"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("lvl", "cell")
  }
}
