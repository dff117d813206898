package graft.tools

import graft.ExtensionQueries
import graft.ops.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Engine-side x56 scale probe: the reachability oracle is quadratic and
  * tops out at sf1 (9,268 s), so the 1000x claim rests on the star
  * contraction itself — this runs the x56 graph build + contraction at
  * the given sfDir, records node/edge/component counts, ROUNDS, and wall
  * seconds, and asserts the round count stays within the O(log n) bound
  * (rounds <= log2(n) + 4) that is the whole point of the algorithm.
  * The labeling itself is sanity-checked structurally: exactly one root
  * per component (component == min member), every node labeled.
  */
object X56Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val edges = ExtensionQueries.copurchaseEdges(spark, sfDir).localCheckpoint()
    val nEdges = edges.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val (labels0, rounds) = GraphOps.ccWithRounds(edges, failOnNonConvergence = true)
    val labels = labels0.localCheckpoint()
    val nNodes = labels.count()
    val ccSec = (System.nanoTime() - t1) / 1e9
    val nComps = labels.select(col("component")).distinct().count()
    // structural sanity: component id == min member id, exactly once each
    val badRoots = labels.groupBy(col("component")).agg(min(col("node")).as("mn"))
      .filter(col("component") =!= col("mn")).count()
    val logBound = math.ceil(math.log(math.max(nNodes, 2).toDouble) / math.log(2.0)).toInt + 4
    val ok = badRoots == 0 && rounds <= logBound && nNodes > 0
    val verdict = if (ok) "PASS" else "FAIL"
    println(f"[x56-probe] $verdict $sfDir: $nEdges%d edges, $nNodes%d nodes, $nComps%d components; " +
      f"ROUNDS=$rounds%d (bound log2(n)+4=$logBound%d), badRoots=$badRoots%d; " +
      f"build $buildSec%.1f s, contraction $ccSec%.1f s")

    // x61's maintenance theorem at the same scale, engine-vs-engine: the
    // incremental path (stars of the 80% coin-split prior + the 20%
    // delta) must label every node identically to the full recompute
    // above — the equality the sf0.01 oracle certifies, re-checked here
    // where the closure oracle cannot go.
    val t2 = System.nanoTime()
    val coin = pmod(col("a") * 31L + col("b"), lit(10L))
    val prev = GraphOps.connectedComponents(edges.filter(coin < 8))
    val incLabels = GraphOps.incrementalComponents(prev, edges.filter(coin >= 8))
    val mismatches = labels.as("f").join(incLabels.as("i"), Seq("node"), "full_outer")
      .filter(col("f.component").isNull || col("i.component").isNull ||
        col("f.component") =!= col("i.component")).count()
    val incSec = (System.nanoTime() - t2) / 1e9
    val v2 = if (mismatches == 0) "PASS" else "FAIL"
    println(f"[x56-probe] $v2 x61 incremental == full recompute at $sfDir: " +
      f"$mismatches%d label mismatches over $nNodes%d nodes ($incSec%.1f s incl. prior build)")
    spark.stop()
    if (!ok || mismatches != 0) sys.exit(1)
  }
}
