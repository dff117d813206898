package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

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

/** Read-schema contract for every driver table — the fixture-drift
  * tripwire. The round-7 NTZ episode (a silent `events.ts` re-encoding
  * regressed four queries with no error anywhere) showed that schema
  * drift under a regenerated fixture fails QUIETLY: queries keep running
  * and produce wrong-but-plausible results. This pins what the engine
  * assumes about each table and fails with a NAMED column/type diff the
  * moment a regen (or a production upstream) drifts. `events` is pinned
  * post-normalization — its on-disk `ts` encoding is legitimately
  * polymorphic (three known vintages, [[Tables.events]]); everything
  * else is pinned as read.
  *
  * At 100 TB this is the cheap end of the pipeline: one footer read per
  * table at job start beats discovering drift in a 6-hour job's output.
  */
object SchemaContract {

  private def st(cols: (String, String)*): StructType =
    StructType(cols.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, DataType.fromDDL(t))
    })

  /** Expected (name, type) sequence per table; events post-normalization. */
  val Expected: Map[String, StructType] = Map(
    "region" -> st("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> st("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> st("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> st("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> st("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    // o_orderdate / l_shipdate arrive as parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) = TIMESTAMP_NTZ in Spark 4 — every date query
    // consumes the wall-clock value, so NTZ is the correct pin (a regen
    // flipping them to LTZ would shift date_trunc buckets under non-UTC
    // sessions: exactly the drift class this contract exists to catch).
    "orders" -> st("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> st("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "documents" -> st("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> st("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"),
    "events" -> st("event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"))

  /** Named differences between an actual schema and a table's contract —
    * empty iff conforming. Order is part of the contract only loosely:
    * a pure reorder reports as a position note, not a missing/extra pair.
    */
  def diff(table: String, actual: StructType): Seq[String] = {
    val exp = Expected(table)
    val expM = exp.fields.map(f => f.name -> f.dataType).toMap
    val actM = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = exp.fieldNames.filterNot(actM.contains)
      .map(n => s"$table: MISSING column $n (expected ${expM(n).sql})")
    val extra = actual.fieldNames.filterNot(expM.contains)
      .map(n => s"$table: UNEXPECTED column $n (${actM(n).sql})")
    val retyped = exp.fieldNames.filter(n => actM.get(n).exists(_ != expM(n)))
      .map(n => s"$table: column $n is ${actM(n).sql}, contract says ${expM(n).sql}")
    val reordered =
      if (missing.isEmpty && extra.isEmpty &&
        actual.fieldNames.toSeq != exp.fieldNames.toSeq)
        Seq(s"$table: columns reordered (${actual.fieldNames.mkString(",")} vs " +
          s"contract ${exp.fieldNames.mkString(",")})")
      else Seq.empty
    missing ++ extra ++ retyped ++ reordered
  }

  /** Validate every table under `dir`; throws one exception naming ALL
    * diffs (a drifted regen usually drifts several tables at once —
    * surface the full picture in one failure).
    */
  def validate(spark: SparkSession, dir: String): Unit = {
    val diffs = Expected.keys.toSeq.sorted.flatMap { t =>
      val actual =
        if (t == "events") Tables.events(spark, dir).schema
        else Tables(spark, dir, t).schema
      diff(t, actual)
    }
    if (diffs.nonEmpty) throw new IllegalStateException(
      s"schema contract violated under $dir:\n  ${diffs.mkString("\n  ")}")
  }
}
