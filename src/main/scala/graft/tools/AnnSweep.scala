package graft.tools

import graft.ops.{Checkpoints, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Design-space sweep for a production-grade IVF configuration — the
  * measurement behind round 17's recall work. x102 certified the r16
  * index honestly at recall@10 = 0.49 (nprobe 2) on the unreplicated
  * driver fixture; this tool measures every lever the verdict named
  * (centroid count, training iterations, multi-assignment "spill" of
  * corpus vectors to their top-s cells, probe width) so the shipped
  * operating point is CHOSEN from a table, not guessed.
  *
  * For each (cells, iters, spill) the corpus is assigned once; for each
  * nprobe the fixed 50-query sample probes its top cells and exact
  * cosine re-ranks the candidates (the same verify step every IVF
  * variant shares). Reported per arm: mean/min recall@10 against exact
  * brute-force truth, and the mean DISTINCT candidates per query — the
  * bounded-cost axis (brute force = corpus size).
  *
  * Throwaway-grade by design (no oracle, no persistence): the chosen
  * point gets promoted to an oracle-checked certification query; this
  * table is the evidence for WHICH point.
  */
object AnnSweep {
  private val EmbDim = graft.ExtensionQueries.EmbDim
  private val RecallQ = graft.ExtensionQueries.RecallQ
  private val RecallK = graft.ExtensionQueries.RecallK

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Checkpoints.cut(spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v")))
    val corpusN = e.count()
    // x109 verdict first: every sweep table is self-documenting about
    // which regime (isotropic floor vs clustered) its recalls measure
    val feas = Similarity.indexFeasibilitySummary(e, EmbDim, RecallQ).head()
    println(s"[ann-sweep] $sfDir feasibility: N=${feas.getAs[Long]("n_corpus")} " +
      s"median_top1=${feas.getAs[Double]("median_top1")} " +
      s"iso_baseline=${feas.getAs[Double]("iso_baseline")} " +
      s"indexable=${feas.getAs[Int]("indexable")}")
    val q = e.filter(col("vec_id") < RecallQ)
    val truth = Checkpoints.cut(
      Similarity.bruteForceTopK(e, q, RecallK, dim = EmbDim)
        .select(col("qid"), col("vec_id")))

    // SPARK_GRAFT_SWEEP_CELLS: comma-separated explicit cell counts
    // ("sqrt" = the production sizing) — the r19 gray-zone sweep runs
    // only the shipped sqrt arm instead of the full design table
    val cellChoices = sys.env.get("SPARK_GRAFT_SWEEP_CELLS")
      .map(_.split(",").toSeq.map(_.trim).map {
        case "sqrt" => math.max(8, math.sqrt(corpusN.toDouble).round.toInt)
        case n => n.toInt
      })
      .getOrElse(Seq(16, 32, math.max(8, math.sqrt(corpusN.toDouble).round.toInt)))
      .distinct.sorted
    val iterChoices =
      if (sys.env.contains("SPARK_GRAFT_SWEEP_FAST")) Seq(2) else Seq(2, 5)
    for {
      cells <- cellChoices
      iters <- iterChoices
    } {
      val cents = Checkpoints.cut(Similarity.kmeansCentroids(
        e, e.filter(col("vec_id") < cells), iters, EmbDim))
      val liveCells = cents.count()
      for (spill <- Seq(1, 2)) {
        val assigned = Checkpoints.cut(
          Similarity.ivfProbe(e, cents.select(col("cell_id").as("vec_id"), col("cv").as("v")),
            EmbDim, spill))
        for (nprobe <- Seq(1, 2, 4, 8, 12, 16).filter(_ <= liveCells)) {
          val probed = Similarity.ivfProbe(
            q, cents.select(col("cell_id").as("vec_id"), col("cv").as("v")), EmbDim, nprobe)
            .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell_id").as("qcell"))
          val scored = Checkpoints.cut(assigned
            .join(broadcast(probed),
              col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id"),
              round(Similarity.cosineStatic(col("qv"), col("v"),
                Similarity.norm(col("qv"), EmbDim), Similarity.norm(col("v"), EmbDim),
                EmbDim), 6).as("cos"))
            .dropDuplicates("qid", "vec_id"))
          val meanCands = scored.groupBy(col("qid")).agg(count(lit(1)).as("n"))
            .agg(avg(col("n"))).head().getDouble(0)
          val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
          val topk = scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= RecallK)
          val rec = q.select(col("vec_id").as("qid"))
            .join(topk.join(truth, Seq("qid", "vec_id"))
              .groupBy(col("qid")).agg(count(lit(1)).as("h")), Seq("qid"), "left")
            .select((coalesce(col("h"), lit(0L)).cast("double") / RecallK).as("r"))
            .agg(avg(col("r")), min(col("r"))).head()
          println(f"[ann-sweep] $sfDir N=$corpusN cells=$cells%3d (live=$liveCells%3d) iters=$iters spill=$spill nprobe=$nprobe%2d " +
            f"recall_mean=${rec.getDouble(0)}%.3f recall_min=${rec.getDouble(1)}%.3f mean_cands=$meanCands%7.1f frac=${meanCands / corpusN}%.3f")
          // targeted release — a global CacheHygiene.clear here would
          // unpersist the sweep's own live cut frames (e/truth/cents),
          // which localCheckpoint cannot recompute
          Checkpoints.unpersist(scored)
        }
        Checkpoints.unpersist(assigned)
      }
      Checkpoints.unpersist(cents)
    }
    spark.stop()
  }
}
