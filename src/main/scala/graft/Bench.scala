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
    // One resolved core count shared by the session master string and the
    // parallel sentinel: a non-numeric SPARK_GRAFT_CPUS (e.g. "*") must
    // not make the sentinel spin a hardcoded 32 threads while the suite
    // runs at the box's real width — that skews the 1.25x par-flag
    // baseline by exactly the mismatch. Fall back to the physical count,
    // which is what local[*] resolves to.
    val coreCount = scala.util.Try(cpus.toInt).toOption.filter(_ > 0)
      .getOrElse(Runtime.getRuntime.availableProcessors)
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

    // Engine-conf overrides under bench (round 20): "k=v;k=v" of runtime
    // SQL confs, applied to the SUITE (and warmup) but NOT to the frozen
    // control query — controlRun() resets these keys to their Spark
    // defaults for its own execution, because the control is a pure box-
    // throughput denominator ("FROZEN BY CONTRACT" below) and an engine
    // conf that sped it up would silently deflate every cross-round
    // normalized comparison.
    //
    // Default: AQE's small-shuffle coalescing floor raised 1m -> 16m.
    // Measured (OPTIMIZATION_r20.md, 37-query A/B at stable sentinels):
    // -11.7% suite raw, nearly every query improved — this engine's many
    // dimension-sized intermediate shuffles (allocation frames, model
    // frames, band histograms) are task-overhead-bound below that size,
    // and the bytes-first 1m floor over-parallelizes them. At production
    // scale the floor is conservative: it sits far BELOW the 100MB-1GB
    // partition sizing the optimization guide targets, and a 50 MB frame
    // does not want 50 tasks on a 2000-core cluster either. The opposite
    // experiment (widening scans/small shuffles via openCostInBytes=16k +
    // minPartitionSize=64k) measured +17% — rejected, kept out.
    // Override with SPARK_GRAFT_EXTRA_CONF (";"-separated k=v; set empty
    // to run pure Spark defaults).
    val extraConf: Seq[(String, String)] = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .getOrElse("spark.sql.adaptive.coalescePartitions.minPartitionSize=16m")
      .split(";").toSeq.filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k.trim, v.trim)
      }
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }

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
    // Min-of-3 is the COMMITTED protocol (round-13 verdict: round-over-
    // round adjudication needs the number to be reproducible, not a
    // hand-picked quiet-box run): three interleaved reps bound the damage
    // any single load spike can do to the min.
    val reps = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt).getOrElse(3))
    val errors = scala.collection.mutable.ListBuffer[String]()
    // A rep that throws is EXCLUDED from the min (a fast failure would
    // otherwise report a misleadingly tiny min and still count toward the
    // suite total) but recorded as None so per_rep keeps a placeholder —
    // rep i of EVERY query stays aligned with sentinel_sec[i] even in the
    // contaminated/failing runs the sentinel exists to adjudicate
    // (round-14 ADVICE). Queries with zero successful reps appear only in
    // `errors`, never in `queries`.
    val timings = scala.collection.mutable.LinkedHashMap[String, List[Option[Double]]]()
    // Optional comma-separated query filter for local iteration on one
    // query's timing; the driver never sets it, so per-round runs time the
    // full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Host-load sentinel: a fixed single-threaded arithmetic spin timed
    // before each rep round. Unlike the 1-minute load average (which the
    // suite's own 32 threads saturate), the spin's wall time moves ONLY
    // with external contention for one core — a rep round whose sentinel
    // runs >= 1.5x the fastest round's was taken under co-located load
    // and is flagged in the output, so a drifted total is adjudicable
    // from the artifact alone instead of via multi-session forensics.
    def sentinelSpin(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 300000000) { // ~0.1-0.3 s quiet; xorshift defeats constant-folding
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      if (x == 42L) System.err.println("") // keep the loop live
      (System.nanoTime() - t0) / 1e9
    }
    // Suite-width calibration spin: the SAME arithmetic loop run on one
    // thread per configured core, wall-timed to completion of all of
    // them. The single-core sentinel catches co-located contention for
    // ONE core but walked straight past round 14's uniform 1.19x
    // whole-box drift (its spin still got a free core); this one moves
    // with exactly that — whole-machine multi-core throughput — because
    // it demands every core at once, like the suite does.
    def parallelSpin(): Double = {
      val n = coreCount
      val t0 = System.nanoTime()
      val threads = (0 until n).map { tid =>
        val th = new Thread(() => {
          var x = 0x9e3779b97f4a7c15L + tid
          var i = 0
          while (i < 100000000) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            i += 1
          }
          if (x == 42L) System.err.println("")
        })
        th.start(); th
      }
      threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()
    val sentinels = scala.collection.mutable.ListBuffer[Double]()
    val parSentinels = scala.collection.mutable.ListBuffer[Double]()
    // Cross-round normalization control (round-16 verdict residual #1):
    // a FROZEN Spark-primitive query — scan + shuffle join + hash agg on
    // lineitem x orders, not one graft operator anywhere — timed once
    // per rep round through the same noop sink as the suite. Its
    // min-of-reps rides in the output as `control_sec`, so every bench
    // JSON carries its own normalization denominator: cross-round
    // comparisons divide by the control ratio instead of hand-rerunning
    // a pinned suite query on both boxes. FROZEN BY CONTRACT — the
    // control is only a denominator while it never changes; engine work
    // must not touch it (it uses no graft code that could speed up).
    def controlRun(): Double = {
      // Freeze contract: run the control under Spark-DEFAULT values of any
      // overridden conf (unset -> default), then restore the overrides.
      // The timed window covers only the control's own execution.
      val saved = extraConf.map { case (k, _) => k -> spark.conf.getOption(k) }
      extraConf.foreach { case (k, _) => spark.conf.unset(k) }
      try {
        val t0 = System.nanoTime()
        Tables(spark, sfDir, "lineitem")
          .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(org.apache.spark.sql.functions.sum(col("l_quantity")).as("sq"),
            org.apache.spark.sql.functions.avg(col("l_extendedprice")).as("ap"),
            org.apache.spark.sql.functions.count(col("o_orderkey")).as("n"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val controls = scala.collection.mutable.ListBuffer[Double]()
    // Untimed JIT warmup for both spins: rep 0's parallel spin otherwise
    // runs interpreter/OSR-cold and reads ~1.3x rep 1's on a QUIET box —
    // exactly the false positive the 1.25x flag must not fire on. Two
    // parallel warmups: one compiles the loop, the second settles thread
    // scheduling/turbo so rep 0 starts from steady state.
    sentinelSpin(); parallelSpin(); parallelSpin()
    (0 until reps).foreach { _ =>
      sentinels += sentinelSpin()
      parSentinels += parallelSpin()
      controls += (try controlRun() catch { case _: Throwable => Double.NaN })
      graft.util.CacheHygiene.clear(spark)
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
        timings(name) =
          (if (ok) Some(elapsed) else None) :: timings.getOrElse(name, Nil)
      }
    }
    val loadEnd = loadAvg()
    val results = timings.collect {
      case (name, ts) if ts.flatten.nonEmpty => name -> ts.flatten.min
    }
    // Millisecond precision: sub-ms digits are pure noise and the driver
    // snapshots only a bounded TAIL of stdout into BENCH_r{N}.json —
    // every wasted digit pushes real entries out of that window.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ms(if (results.nonEmpty) results.values.sum else 0.0)
    // Load-sentinel verdict: rep rounds whose calibration spin ran >=1.5x
    // the fastest round's were taken under external load. min-of-reps
    // already discards them per query; the flag makes a contaminated RUN
    // (all reps flagged ~= nothing clean to take the min over) visible in
    // the artifact itself.
    val sMin = if (sentinels.nonEmpty) sentinels.min else 0.0
    val flagged = sentinels.zipWithIndex.collect {
      case (s, i) if sMin > 0 && s >= sMin * 1.5 => i
    }
    // Whole-box verdicts (round-14 verdict #1): the run is load-flagged
    // when the pre-suite 1-minute load average says the box was already
    // busy (4.0 on a 32-core box is comfortably above a quiet host's
    // <1.5 and far below a co-located suite's ~12+), and a rep round is
    // par-flagged when its suite-width spin ran >= 1.25x the fastest
    // round's (tighter than the single-core 1.5x: the parallel spin is
    // the direct analogue of suite throughput, so smaller drifts there
    // are already meaningful).
    val LoadFlagThreshold = 4.0
    val loadFlagged = loadStart >= LoadFlagThreshold
    val pMin = if (parSentinels.nonEmpty) parSentinels.min else 0.0
    val parFlagged = parSentinels.zipWithIndex.collect {
      case (s, i) if pMin > 0 && s >= pMin * 1.25 => i
    }
    if (loadFlagged) System.err.println(
      f"[bench] LOAD-FLAGGED: start load average $loadStart%.2f >= $LoadFlagThreshold — totals below were taken on a busy box; adjudicate via per_rep + sentinels")
    val sentinelJson = sentinels.map(ms).mkString("[", ",", "]")
    val flaggedJson = flagged.mkString("[", ",", "]")
    val parSentinelJson = parSentinels.map(ms).mkString("[", ",", "]")
    val parFlaggedJson = parFlagged.mkString("[", ",", "]")
    val loadJson = s"[${ms(loadStart)},${ms(loadEnd)}]"
    val controlOk = controls.filterNot(_.isNaN)
    val controlJson = if (controlOk.nonEmpty) ms(controlOk.min) else "null"
    val controlPerRepJson =
      controls.map(c => if (c.isNaN) "null" else ms(c)).mkString("[", ",", "]")
    // Cross-round comparison as a single field read (round-17 verdict
    // #6): the total re-expressed on the REFERENCE box — the round-17
    // zero-flag committed run, whose frozen-control min read 0.504 s.
    // value_control_normalized = value * (0.504 / control_sec): what
    // this suite total would read at that box's throughput. Comparing
    // two rounds' normalized values needs no further adjudication
    // arithmetic; the raw value + control stay in the artifact for
    // anyone who wants the underlying measurements.
    val ReferenceControlSec = 0.504
    val normJson =
      if (controlOk.nonEmpty && results.nonEmpty)
        ms(results.values.sum * ReferenceControlSec / controlOk.min)
      else "null"
    // Headline fields LAST: with 100+ queries the map alone overflows the
    // driver's tail window, and a tail keeps the END of the line — so the
    // totals/errors/sf summary must sit after the map to survive. The
    // complete line additionally lands in logs/BENCH_local.json (repo
    // cwd), the judge's full per-query artifact since round 8, which also
    // carries the per-rep timings the stdout line can't afford.
    val line =
      s"""{"queries":$qs,"errors":$errs,"reps":$reps,"sentinel_sec":$sentinelJson,"flagged_reps":$flaggedJson,"par_sentinel_sec":$parSentinelJson,"par_flagged_reps":$parFlaggedJson,"load_avg":$loadJson,"load_flagged":$loadFlagged,"control_sec":$controlJson,"reference_control_sec":${ms(ReferenceControlSec)},"value_control_normalized":$normJson,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","full_map":"logs/BENCH_local.json"}"""
    println(line)
    // Compact headline line, printed AFTER the full line (round-21,
    // verdict #2): with 160 queries the full line alone (~6 KB) overflows
    // the driver's bounded stdout tail window, so its JSON never parsed
    // (PERF_r19/r20 `parsed: null`). This second line carries every
    // headline field plus errors but NO per-query map (~400 bytes), so
    // the end of stdout always contains one complete, parseable JSON
    // object. The full per-query map stays one line up AND in
    // logs/BENCH_local.json (`full_map`) — nothing is removed or renamed
    // from the original line.
    val compact =
      s"""{"errors":$errs,"n_queries":${results.size},"reps":$reps,"flagged_reps":$flaggedJson,"par_flagged_reps":$parFlaggedJson,"load_avg":$loadJson,"load_flagged":$loadFlagged,"control_sec":$controlJson,"reference_control_sec":${ms(ReferenceControlSec)},"value_control_normalized":$normJson,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","full_map":"logs/BENCH_local.json"}"""
    println(compact)
    try {
      val out = java.nio.file.Paths.get("logs")
      java.nio.file.Files.createDirectories(out)
      // timings(name) prepends per rep, so reverse restores rep order —
      // rep i of every query aligns with sentinel_sec[i]; a failed rep
      // prints as null so the alignment survives failures too.
      val perRep = timings.map { case (k, ts) =>
        "\"" + k + "\":" + ts.reverse.map(_.map(ms).getOrElse("null"))
          .mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val full =
        s"""{"queries":$qs,"per_rep":$perRep,"errors":$errs,"reps":$reps,"sentinel_sec":$sentinelJson,"flagged_reps":$flaggedJson,"par_sentinel_sec":$parSentinelJson,"par_flagged_reps":$parFlaggedJson,"load_avg":$loadJson,"load_flagged":$loadFlagged,"control_sec":$controlJson,"control_per_rep":$controlPerRepJson,"reference_control_sec":${ms(ReferenceControlSec)},"value_control_normalized":$normJson,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
      java.nio.file.Files.writeString(out.resolve("BENCH_local.json"), full + "\n")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write logs/BENCH_local.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
