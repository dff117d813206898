package graft.tools

import graft.ops.{AnnModels, Checkpoints, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-evidence probe for the x102 recall certification — extends the
  * query's two-arm audit (nprobe 1 and 2) into the full recall/COST
  * curve an index operator tunes against: for nprobe = 1..4, recall@10
  * vs exact brute-force truth on the fixed 50-query sample, next to the
  * measured candidate volume per query (the verify-cost axis: candidates
  * scored scale ~linearly with nprobe, so the curve shows what each
  * recall point costs).
  *
  * Same trained index as x102/x13/x25 (IvfCells/KmIters, the
  * persisted-model path), same tie-break discipline, so the probe's
  * nprobe<=2 points must agree with the oracle-checked query exactly —
  * the hyperparameters are therefore REFERENCED from
  * [[graft.ExtensionQueries]] rather than redeclared, so a constant
  * change there cannot leave this probe silently certifying a different
  * index configuration.
  *
  * PASS = recall non-decreasing in nprobe (each arm's candidate set is a
  * superset of the previous), candidate volume non-decreasing (a tie is
  * legitimate when the extra probed cell is EMPTY in the final
  * assignment — a trained centroid can attract zero corpus vectors on
  * small or skewed fixtures — so ties print a tolerated note instead of
  * failing; full degeneracy, a flat volume curve end to end, still
  * fails), and the curve non-degenerate (recall@4 > recall@1 — widening
  * the probe must actually buy recall on this fixture, else the audit
  * is vacuous).
  */
object X102Probe {
  private val EmbDim = graft.ExtensionQueries.EmbDim
  private val IvfCells = graft.ExtensionQueries.IvfCells
  private val KmIters = graft.ExtensionQueries.KmIters
  private val RecallQ = graft.ExtensionQueries.RecallQ
  private val RecallK = graft.ExtensionQueries.RecallK
  private val MaxNprobe = 4

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val corpusN = e.count()
    val q = e.filter(col("vec_id") < RecallQ)
    val truth = Similarity.bruteForceTopK(e, q, RecallK, dim = EmbDim)
      .select(col("qid"), col("vec_id"))
    val trained = AnnModels.ivfCentroids(spark, sfDir, e, IvfCells, KmIters, EmbDim)
    val cents = trained.select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val assigned = Checkpoints.cut(Similarity.ivfAssign(e, cents, EmbDim))

    def arm(nprobe: Int): (Double, Double, Double) = {
      val probed = Similarity.ivfProbe(q, cents, EmbDim, nprobe)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell_id").as("qcell"))
      val scored = Checkpoints.cut(assigned.join(broadcast(probed),
          col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosineStatic(col("qv"), col("v"),
            Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim), EmbDim), 6).as("cos")))
      val meanCands = scored.groupBy(col("qid")).agg(count(lit(1)).as("n"))
        .agg(avg(col("n"))).head().getDouble(0)
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val topk = scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= RecallK)
      val hit = topk.join(truth, Seq("qid", "vec_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("h"))
      val rec = q.select(col("vec_id").as("qid")).join(hit, Seq("qid"), "left")
        .select((coalesce(col("h"), lit(0L)).cast("double") / RecallK).as("r"))
        .agg(avg(col("r")), min(col("r"))).head()
      (rec.getDouble(0), rec.getDouble(1), meanCands)
    }

    val curve = (1 to MaxNprobe).map(np => np -> arm(np))
    curve.foreach { case (np, (mean, mn, cands)) =>
      println(f"[x102-probe] $sfDir nprobe=$np recall@$RecallK mean=$mean%.3f min=$mn%.3f mean_cands=$cands%.0f (corpus=$corpusN, brute cost=$corpusN/query)")
    }
    val means = curve.map(_._2._1)
    val cands = curve.map(_._2._3)
    // Replication caveat (the x96/x74 df-degeneracy in the opposite
    // direction): GenScale's verbatim clones give every sample query
    // >= k exact copies that share its cell, so recall@1 is already 1.0
    // and widening the probe cannot buy anything — the curve SATURATES
    // on cloned fixtures rather than failing. Monotonicity and the cost
    // axis still certify; the non-degeneracy check only binds when the
    // fixture leaves recall headroom.
    val saturated = means.head >= 1.0 - 1e-9
    // Cost axis: non-DECREASING, not strictly increasing — the
    // (nprobe+1)-th probed cell can be empty in the final assignment
    // (a trained centroid that attracted zero corpus vectors), which
    // ties adjacent arms at equal volume on a healthy index. A fully
    // flat curve end to end IS degenerate (no probe widening bought any
    // candidates anywhere) and still fails.
    val volumeTies = cands.zip(cands.tail).count { case (a, b) => b == a }
    val ok = means.zip(means.tail).forall { case (a, b) => b >= a - 1e-9 } &&
      cands.zip(cands.tail).forall { case (a, b) => b >= a } &&
      cands.last > cands.head &&
      (saturated || means.last > means.head)
    val note = (if (saturated) " [saturated: replicated fixture co-locates exact clones]" else "") +
      (if (volumeTies > 0) s" [tolerated: $volumeTies empty-probed-cell volume tie(s)]" else "")
    println(s"[x102-probe] ${if (ok) "PASS" else "FAIL"} recall monotone in nprobe, candidate volume non-decreasing and non-flat, curve non-degenerate$note")
    require(ok)
    spark.stop()
  }
}
