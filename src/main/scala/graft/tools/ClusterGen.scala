package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-cluster embedding fixture generator — the vector analog of
  * GenScale's mutate mode. Every ANN recall number certified through
  * round 17 was measured on the driver's ISOTROPIC embeddings (x109:
  * indexable = 0 — within-label and cross-label cosine both ~0), which
  * is the WORST case for a partitioning index; the claim "clustered
  * real-world embeddings do strictly better at the same candidate
  * fraction" needs a corpus with actual cluster structure to measure.
  * This tool writes one: `kClusters` deterministic pseudo-random unit
  * centers, vector i = normalize(center(i mod k) + noiseScale * unit
  * noise vector), all components from the same integer-mix
  * pseudo-random family as Similarity.planeComponent — reproducible
  * anywhere, no RNG state.
  *
  * With noiseScale ~ 0.7 the within-cluster cosine sits ~0.6-0.7 and
  * cross-cluster ~0, comfortably past x109's 2x-isotropic-line gate —
  * a realistic "real embeddings" regime, not a degenerate one.
  *
  * Output: `<outDir>/embeddings.parquet` with (vec_id long,
  * embedding array<float>, label int = the planted cluster) — the
  * driver fixture's schema, so AnnSweep / x106 / x109 probes point at
  * it unchanged.
  *
  * Scale shape: one spark.range, all columns map-side expressions.
  */
object ClusterGen {

  /** Deterministic pseudo-random in [-1, 1] for (stream, index) — the
    * planeComponent mix with a different prime so fixture noise never
    * correlates with the engine's LSH planes.
    */
  private def mix(stream: Long, i: Long): Double = {
    val h = (stream * 976369L + i * 354313L + 77377L) % 1000003L
    (h.toDouble / 1000003.0) * 2.0 - 1.0
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/ann_clustered")
    val nVec = args.lift(1).map(_.toLong).getOrElse(2000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val kClusters = args.lift(3).map(_.toInt).getOrElse(20)
    val noiseScale = args.lift(4).map(_.toDouble).getOrElse(0.7)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // unit centers, built once on the driver (kClusters x dim doubles)
    val centers = (0 until kClusters).map { c =>
      val raw = (0 until dim).map(d => mix(c.toLong + 1L, d.toLong)).toArray
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val centerLit = array(centers.map(cv => array(cv.map(lit): _*)): _*)

    val label = pmod(col("id"), lit(kClusters.toLong)).cast("int")
    // per-vector unit noise from the (vec_id offset) mix streams
    val noise = transform(sequence(lit(0), lit(dim - 1)),
      d => {
        // mix(nVec + 1 + vec_id, d): an independent stream per vector
        val h = (((col("id") + lit(kClusters.toLong + 1L)) * lit(976369L) +
          d.cast("long") * lit(354313L) + lit(77377L)) % lit(1000003L))
        h.cast("double") / lit(1000003.0) * lit(2.0) - lit(1.0)
      })
    val nNorm = sqrt(aggregate(noise, lit(0.0), (a, x) => a + x * x))
    val rawVec = zip_with(element_at(centerLit, label + 1), noise,
      (c, x) => c + lit(noiseScale) * x / nNorm)
    val vNorm = sqrt(aggregate(rawVec, lit(0.0), (a, x) => a + x * x))

    spark.range(nVec)
      .select(col("id").as("vec_id"),
        transform(rawVec, x => (x / vNorm).cast("float")).as("embedding"),
        label.as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[cluster-gen] wrote $nVec vectors, dim=$dim, k=$kClusters, " +
      s"noise=$noiseScale -> $outDir/embeddings.parquet")
    spark.stop()
  }
}
