package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Per-round benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A short warmup (session
  * init, parquet footer reads, first codegen compilation) runs untimed so
  * per-query numbers reflect steady-state execution rather than JVM
  * startup — the first timed query otherwise absorbs ~6 s of one-time cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Partition-count sensitivity knob: a real cluster runs 200+ shuffle
    // partitions, not local[32]'s 32 — the cluster-conf probe (see SURVEY
    // "partition-count sensitivity") re-times the suite at 200 to catch
    // any plan that secretly depends on a low partition count.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // Pinned like Verify's session: the NTZ→TimestampType normalization in
      // Tables.events is only wall-clock-exact under a fixed session zone.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Fixture-drift preflight — same warn-not-abort contract as Verify's.
    try SchemaContract.validate(spark, sfDir)
    catch {
      case e: IllegalStateException =>
        System.err.println(s"[bench] SCHEMA CONTRACT VIOLATED — timings below may be of failing queries\n${e.getMessage}")
      case e: Throwable =>
        System.err.println(s"[bench] schema preflight unreadable: ${e.getMessage}")
    }

    // Warmup: touch each table's footer + run one codegen'd scan/agg/join.
    try {
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings").foreach { t =>
        Tables(spark, sfDir, t).count()
      }
      Tables.events(spark, sfDir).count()
      val l = Tables(spark, sfDir, "lineitem")
      val o = Tables(spark, sfDir, "orders")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).count().count()
      // One-time tile-layout build for the DSv2 scan query — dataset prep,
      // not query time.
      sources.PointsLayout.ensure(spark, sfDir)
    } catch {
      // A broken fixture here would silently skip warmup and charge one-time
      // codegen/footer cost to the first timed query — surface it loudly
      // (on stderr, so the stdout JSON line stays parseable).
      case t: Throwable =>
        System.err.println(s"[bench] WARMUP FAILED: ${t.getClass.getName}: ${t.getMessage}")
    }

    // The noop sink forces FULL evaluation of every output column — a bare
    // .count() lets Catalyst prune unused projections and eliminate sorts,
    // so map-only queries would be timed as little more than a row-count
    // scan. Failures are reported explicitly instead of masquerading as a
    // fast timing. Each query runs `reps` times and reports the MIN —
    // machine-load spikes otherwise distort single-shot timings by tens of
    // percent run to run. Reps are interleaved ROUND-ROBIN across the whole
    // suite (rep 1 of every query, then rep 2, ...) so a multi-minute
    // co-located load spike contaminates at most one rep of each query
    // instead of every back-to-back rep of a few adjacent queries — with
    // back-to-back reps, min-of-reps cannot save a query whose entire rep
    // window falls inside the spike. Spark-level caches are cleared between
    // runs (the x04/x06 shingle frames), so the min is warm-JVM/
    // warm-page-cache steady state — the page cache is already warm after
    // the warmup scans, same as rep 1.
    val reps = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt).getOrElse(2))
    val errors = scala.collection.mutable.ListBuffer[String]()
    // A rep that throws is EXCLUDED from the timings (a fast failure would
    // otherwise report a misleadingly tiny min and still count toward the
    // suite total); queries with zero successful reps appear only in
    // `errors`, never in `queries`.
    val timings = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    // Optional comma-separated query filter for local iteration on one
    // query's timing; the driver never sets it, so per-round runs time the
    // full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    (0 until reps).foreach { _ =>
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            // Name the failure (class + message, one line, stderr) — a bare
            // query name in `errors` costs whoever reads BENCH_r{N} a full
            // rebuild-and-rerun cycle to learn *why* it died.
            System.err.println(
              s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
            if (!errors.contains(name)) errors += name
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // Cache + checkpoint-block hygiene between runs, outside the
        // timed window (see CacheHygiene for why clearCache alone leaks).
        graft.util.CacheHygiene.clear(spark)
        if (ok) timings(name) = elapsed :: timings.getOrElse(name, Nil)
      }
    }
    val results = timings.map { case (name, ts) => name -> ts.min }
    // Millisecond precision: sub-ms digits are pure noise and the driver
    // snapshots only a bounded TAIL of stdout into BENCH_r{N}.json —
    // every wasted digit pushes real entries out of that window.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ms(if (results.nonEmpty) results.values.sum else 0.0)
    // Headline fields LAST: with 100+ queries the map alone overflows the
    // driver's tail window, and a tail keeps the END of the line — so the
    // totals/errors/sf summary must sit after the map to survive. The
    // complete line additionally lands in logs/BENCH_local.json (repo
    // cwd), the judge's full per-query artifact since round 8.
    val line =
      s"""{"queries":$qs,"errors":$errs,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","full_map":"logs/BENCH_local.json"}"""
    println(line)
    try {
      val out = java.nio.file.Paths.get("logs")
      java.nio.file.Files.createDirectories(out)
      java.nio.file.Files.writeString(out.resolve("BENCH_local.json"), line + "\n")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write logs/BENCH_local.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
