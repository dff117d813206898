package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver fixtures (TESTDATA.md).
  *
  * All engine queries read from an `sfDir` containing one parquet file per
  * table (`region nation customer supplier part orders lineitem events
  * documents embeddings`). At cluster scale the same call works on a
  * directory of many files / partitions — nothing here assumes single-file.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark only reads as Long via `spark.sql.legacy.parquet.nanosAsLong`
    * (set in Verify/Bench sessions). Normalize to a microsecond
    * TimestampType column here; integer `div` keeps the math exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
