package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join probe: a planted-skew fact-fact join at probe scale,
  * demonstrating that Spark's adaptive skew-join split actually engages
  * on the engine's join shapes — the evidence behind SURVEY's "AQE
  * skew-join handles the join side" claim.
  *
  * Plant: every even lineitem orderkey folds to key 0, so ~50% of the
  * fact table lands on ONE key (the viral-entity shape). Joined against
  * a plain shuffled orders projection carrying exactly one row for the
  * hot key. Without intervention one shuffle partition carries half the
  * data; with AQE skew handling the oversized partition is split into
  * advisory-sized chunks joined against a replicated build side.
  *
  * Thresholds are probe-scale (4 MB skew threshold, factor 2, 1 MB
  * advisory) because the DEFAULTS (256 MB, factor 5) are cluster-scale —
  * the mechanism, not the constant, is what transfers to 100 TB.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    def run(skewJoin: Boolean): (Double, String) = {
      val spark = SparkSession.builder()
        .master("local[8]")
        .appName(s"skew-probe-$skewJoin")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
        // probe-scale thresholds (defaults are 256 MB / factor 5 —
        // cluster-scale constants; a partition is "skewed" only when it
        // exceeds BOTH the byte threshold and factor x median)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        // ~50% of rows on key 0, the rest spread: the viral-key shape
        val probe = li.select(
          when(col("l_orderkey") % 2 === 0, lit(0L)).otherwise(col("l_orderkey")).as("k"),
          col("l_extendedprice").as("v"))
        // Build side must be a PLAIN shuffled projection: AQE's
        // OptimizeSkewedJoin matches SMJ(Sort(ShuffleStage),
        // Sort(ShuffleStage)) only — an aggregate between the sort and the
        // shuffle stage makes the rule skip the join entirely (verified:
        // a groupBy build side never splits). Odd orders join 1:~4;
        // the hot key joins exactly one row, so output size stays sane
        // while the probe side's partition is half the fact table.
        val build = spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("w"))
          .union(spark.range(1).select(lit(0L).as("k"), lit(1.0).as("w")))
        val joined = probe.join(build, "k")
          .groupBy(lit(1).as("g"))
          .agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("s"))
        val t0 = System.nanoTime()
        joined.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // Re-run the frame to inspect the FINAL adaptive plan (noop save
        // consumed the first). Cheap relative to the timing run.
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        (sec, plan)
      } finally spark.stop()
    }

    val (offSec, offPlan) = run(skewJoin = false)
    val (onSec, onPlan) = run(skewJoin = true)
    def skewReads(plan: String): Int = "skewed".r.findAllIn(plan).size
    println(s"skewJoin=false: ${f"$offSec%.2f"} s, plan skew markers: ${skewReads(offPlan)}")
    println(s"skewJoin=true : ${f"$onSec%.2f"} s, plan skew markers: ${skewReads(onPlan)}")
    onPlan.linesIterator.filter(_.contains("skewed")).take(2)
      .foreach(l => println(s"plan line: ${l.trim.take(160)}"))
    require(skewReads(onPlan) > 0,
      "AQE skew split did not engage — check thresholds vs data size")
    println(f"speedup with skew split: ${offSec / onSec}%.2fx")
  }
}
