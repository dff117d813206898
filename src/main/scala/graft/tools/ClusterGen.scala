package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** The fixture as a frame (callable from specs/probes — `main` writes
    * exactly this). Parameters:
    *
    *  - `shiftArrivals`: rows with vec_id % 5 == 0 (x114's arrival
    *    modulus) draw from a DISJOINT label space [k, 2k) — clusters
    *    that did not exist in the base era. The staleness audit on this
    *    fixture measures real recall drift (a stale index scatters the
    *    new clusters); on the unshifted fixture it measures the
    *    cost-not-recall regime.
    *  - `noiseFrac` (the r18 verdict's gray-zone knob): this hash-chosen
    *    fraction of rows is PURE NOISE (label -1, no center term) — a
    *    mixture between the clean-cluster regime (0.0) and the isotropic
    *    control (1.0), for measuring where the feasibility excess
    *    threshold actually sits between the two calibration extremes.
    */
  def frame(
      spark: SparkSession, nVec: Long, dim: Int, kClusters: Int,
      noiseScale: Double, shiftArrivals: Boolean = false,
      noiseFrac: Double = 0.0): DataFrame = {
    require(noiseFrac >= 0.0 && noiseFrac <= 1.0, s"noiseFrac must be in [0,1], got $noiseFrac")
    // Everything is computed IN-EXPRESSION from the hash mix (center
    // components included): a literal center table at k x dim blows the
    // expression tree past what codegen folds in reasonable time once
    // k reaches the sqrt(N) regime. Staged columns keep each tree small.
    // The mix must be a REAL hash in (stream, i): an affine-mod map
    // makes every vector a wrapped linear ramp in i (measured median
    // top-1 cosine 0.99997 — near-parallel rows), and a quadratic-
    // residue scramble of it still carries LCG lattice structure
    // (measured: vec_id deltas of 60 produced cosine-0.99 pairs). Two
    // multiply-mod rounds with an xor-fold between them break the
    // affine lattice; every intermediate stays below 2^63 so the
    // arithmetic is exact under ANSI mode.
    def hashMix(z: org.apache.spark.sql.Column) = {
      val M = 4294967311L // prime just above 2^32
      val h1 = (z * lit(2654435761L)) % lit(M)
      val f1 = h1.bitwiseXOR(shiftrightunsigned(h1, 16))
      val h2 = (f1 * lit(1099087573L)) % lit(M)
      h2.bitwiseXOR(shiftrightunsigned(h2, 13))
    }
    def mixCol(stream: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (hashMix(stream * lit(64L) + i + lit(1L)) % lit(1048576L))
        .cast("double") / lit(524288.0) - lit(1.0)
    val dims = sequence(lit(0L), lit(dim.toLong - 1L))

    // Labels are HASH-assigned, never `id mod k`: a label that encodes
    // row-id arithmetic correlates with any deterministic modulus
    // downstream — measured: with labels = id mod 140, the x106 build's
    // vec_id % 2 training sample contained only the even-label clusters
    // and sampled-train recall collapsed 1.000 -> 0.896. Real corpora
    // don't encode cluster membership in row parity; the fixture must
    // not either. The noise-row coin is a SEPARATE hash stream for the
    // same reason.
    val baseLabel =
      if (kClusters >= 1) pmod(hashMix(col("id") + lit(1000000007L)), lit(kClusters.toLong))
      else lit(0L)
    val shifted =
      if (shiftArrivals)
        when(col("id") % 5 === 0, baseLabel + lit(kClusters.toLong)).otherwise(baseLabel)
      else baseLabel
    val noiseRow =
      if (noiseFrac <= 0.0 || kClusters < 1) lit(false)
      else pmod(hashMix(col("id") + lit(998244353L)), lit(1000000L)) <
        lit(math.round(noiseFrac * 1000000.0))
    val label = when(noiseRow, lit(-1L)).otherwise(shifted)
    spark.range(nVec)
      .select(col("id").as("vec_id"), label.cast("int").as("label"))
      // raw center (stream = label + 1) and raw noise (an independent
      // stream per vector, offset past the center streams)
      .withColumn("craw", transform(dims, d => mixCol(col("label").cast("long") + 1L, d)))
      .withColumn("nraw", transform(dims,
        d => mixCol(col("vec_id") + lit(kClusters.toLong + 1L), d)))
      .withColumn("cnorm", sqrt(aggregate(col("craw"), lit(0.0), (a, x) => a + x * x)))
      .withColumn("nnorm", sqrt(aggregate(col("nraw"), lit(0.0), (a, x) => a + x * x)))
      // kClusters = 0 -> pure-noise ISOTROPIC corpus (the control arm:
      // a true random-direction fixture at any N, for measuring recall
      // floors at scale without the driver fixture's replication);
      // label -1 rows (noiseFrac) are per-row isotropic inside a
      // clustered corpus
      .withColumn("raw",
        if (kClusters >= 1)
          when(col("label") < 0, col("nraw")).otherwise(
            zip_with(col("craw"), col("nraw"),
              (c, x) => c / col("cnorm") + lit(noiseScale) * x / col("nnorm")))
        else col("nraw"))
      .withColumn("vnorm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / col("vnorm")).cast("float")).as("embedding"),
        col("label"))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/ann_clustered")
    val nVec = args.lift(1).map(_.toLong).getOrElse(2000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val kClusters = args.lift(3).map(_.toInt).getOrElse(20)
    val noiseScale = args.lift(4).map(_.toDouble).getOrElse(0.7)
    val shiftArrivals = args.lift(5).exists(_ == "1")
    val noiseFrac = args.lift(6).map(_.toDouble).getOrElse(0.0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    frame(spark, nVec, dim, kClusters, noiseScale, shiftArrivals, noiseFrac)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[cluster-gen] wrote $nVec vectors, dim=$dim, k=$kClusters, " +
      s"noise=$noiseScale, shift=$shiftArrivals, noiseFrac=$noiseFrac -> " +
      s"$outDir/embeddings.parquet")
    spark.stop()
  }
}
