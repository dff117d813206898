package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The `events` table's `ts` column has drifted across driver fixture
    * regenerations — TIMESTAMP(NANOS) (readable only as Long via
    * `spark.sql.legacy.parquet.nanosAsLong`, set in Verify/Bench sessions),
    * then TIMESTAMP(isAdjustedToUTC=false, MICROS) which Spark 4 reads as
    * TIMESTAMP_NTZ. Normalize every encoding to a microsecond TimestampType
    * column here so downstream `unix_seconds`/`unix_millis`/`unix_micros`
    * calls analyze regardless of which fixture vintage is on disk:
    *   - Long nanos → integer `div 1000` keeps the math exact;
    *   - NTZ → cast to TimestampType, exact under the pinned UTC session
    *     timezone (Verify and Bench both set spark.sql.session.timeZone);
    *   - LTZ (TimestampType) passes through untouched.
    * TablesEventsSpec pins all three encodings against the event-time
    * queries so the next regen can't silently re-break this.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The cast interprets NTZ wall-clock in the SESSION zone — under
        // anything but UTC every event time silently shifts by the zone
        // offset and session/attribution results change with no error.
        // Enforce the invariant here at the shared normalization point
        // instead of trusting each main to copy the config.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.parquet carries TIMESTAMP_NTZ; normalizing it requires " +
            s"spark.sql.session.timeZone=UTC (session has '$tz') — set it in " +
            "the SparkSession builder or the cast shifts every event time")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
