package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query optimization probe (round 20): for each named SparkEntry
  * query, capture `.explain("formatted")` to plans/<prefix>/<name>_<tag>.txt
  * and run the noop sink with a job-level listener, printing a per-job
  * wall-clock/stage/task breakdown — the empirical half of guide §1
  * (where does a multi-second query actually spend its time: scan, one
  * hot shuffle, or fifty tiny orchestration jobs). Session config
  * mirrors Bench's so timings are comparable.
  *
  * Usage: runMain graft.tools.QueryProfile <tag> <query>[,<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PROFILE_REPS (default 2; min-of-reps reported).
  */
object QueryProfile {
  private final class JobTimer extends SparkListener {
    final case class Job(id: Int, desc: String, start: Long,
      var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
      var taskTimeMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs(e.jobId) = Job(e.jobId, desc, e.time)
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      jobs(e.jobId).stages += e.stageIds.size
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += 1
        if (e.taskMetrics != null)
          j.taskTimeMs += e.taskMetrics.executorRunTime
      }
    }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <tag> <q1>[,<q2>...]")
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt).getOrElse(2))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Extra runtime SQL confs under test: "k=v;k=v" (e.g. the round-20
    // byte-floor experiments: spark.sql.files.openCostInBytes, AQE
    // coalescePartitions.minPartitionSize).
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)
    // Warmup mirroring Bench: footer reads + one codegen'd join/agg.
    try {
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings").foreach(t => graft.Tables(spark, dir, t).count())
      graft.Tables.events(spark, dir).count()
      graft.sources.PointsLayout.ensure(spark, dir)
    } catch { case t: Throwable => System.err.println(s"[profile] warmup: ${t.getMessage}") }
    val outDir = java.nio.file.Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "r21"))
    java.nio.file.Files.createDirectories(outDir)
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // Plan capture (pre-execution; AQE shows isFinalPlan=false).
      try {
        val planTxt = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), planTxt)
      } catch { case t: Throwable =>
        System.err.println(s"[profile] explain $n failed: ${t.getMessage}")
      }
      var best = Double.MaxValue
      var bestJobs: Seq[JobTimer#Job] = Nil
      (0 until reps).foreach { r =>
        graft.util.CacheHygiene.clear(spark)
        timer.reset()
        spark.sparkContext.setJobDescription(n)
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, dir)
          df.write.format("noop").mode("overwrite").save()
          if (r == 0) java.nio.file.Files.writeString(
            outDir.resolve(s"${n}_${tag}_final.txt"),
            df.queryExecution.executedPlan.toString)
        }
        catch { case t: Throwable =>
          System.err.println(s"[profile] $n rep $r FAILED: ${t.getClass.getName}: ${t.getMessage}")
        }
        val el = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        graft.util.CacheHygiene.clear(spark)
        println(f"[profile] $n rep $r: $el%.3f s, ${timer.jobs.size} jobs")
        if (el < best) { best = el; bestJobs = timer.jobs.values.toSeq }
      }
      println(f"== $n best $best%.3f s, ${bestJobs.size} jobs ==")
      val totalJobMs = bestJobs.map(j => j.end - j.start).sum
      bestJobs.foreach { j =>
        val wall = j.end - j.start
        println(f"  job ${j.id}%4d ${wall}%6d ms  stages=${j.stages}%3d tasks=${j.tasks}%5d taskTime=${j.taskTimeMs}%7d ms")
      }
      println(f"  (sum of job walls: $totalJobMs ms; gaps = driver/planning time)")
    }
    spark.stop()
  }
}
