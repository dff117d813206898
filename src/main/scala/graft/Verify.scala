package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Engine default (round 21, promoted from the bench session so the
      // library posture matches what is measured): AQE's small-shuffle
      // coalescing floor at 16m — see GraftConf.cluster for the rationale.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture-drift preflight (the round-7 NTZ regen failed SILENTLY —
    // wrong-but-plausible results, no error anywhere): one footer read
    // per table, and any contract violation is named LOUDLY up front.
    // Warn rather than abort: a drifted fixture should fail the affected
    // queries' compares, not zero the whole round's correctness.
    try SchemaContract.validate(spark, sfDir)
    catch {
      case e: IllegalStateException =>
        System.err.println(s"[verify] SCHEMA CONTRACT VIOLATED — expect query failures below\n${e.getMessage}")
      case e: Throwable =>
        System.err.println(s"[verify] schema preflight unreadable: ${e.getMessage}")
    }
    // Optional comma-separated query filter for local single-query
    // iteration (same contract as Bench's SPARK_GRAFT_BENCH_ONLY; the
    // driver never sets it). oracle_sql.json is filtered to match so
    // check.py compares exactly what was dumped.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A typo'd name would otherwise dump nothing and let check.py exit
    // green on an empty oracle map — a silent false-pass of the gate.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_VERIFY_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // Class + message + first in-repo stack frame: enough to locate the
        // failing operator without a rebuild-and-rerun diagnosis cycle.
        val frame = e.getStackTrace.find(_.getClassName.startsWith("graft"))
          .orElse(e.getStackTrace.headOption).map(_.toString).getOrElse("")
        System.err.println(
          s"[verify] $name failed: ${e.getClass.getName}: ${e.getMessage} at $frame")
      }
      // Cache + checkpoint-block hygiene between queries (see
      // CacheHygiene for why clearCache alone leaks).
      graft.util.CacheHygiene.clear(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
