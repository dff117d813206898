package graft.util

import org.apache.spark.sql.SparkSession

/** Between-query cleanup for long multi-query sessions (Bench, Verify,
  * ScaleVerify): `clearCache()` drops cached DataFrames but NOT the RDD
  * blocks that `localCheckpoint` lineage cuts leave behind (the iterative
  * queries — dedup label propagation, PageRank, BPE rounds, GD training);
  * those otherwise linger until driver GC happens to collect the RDD
  * handles, and across a 90+-query session the accumulated blocks build
  * memory pressure that inflates later queries' measured times (observed:
  * full-suite bench 91.6 s -> 65.9 s from adding the unpersist sweep).
  */
object CacheHygiene {
  def clear(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
