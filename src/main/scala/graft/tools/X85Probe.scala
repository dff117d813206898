package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for x85's winnowing fingerprints — machine-checks
  * the published guarantee (Schleimer et al. 2003) rather than trusting
  * it: any two documents sharing a verbatim token run of length
  * >= w + n - 1 MUST share at least one fingerprint hash, because every
  * w-gram window inside the shared run selects the same minimum in both
  * documents.
  *
  * Corpus: the x44 shared-passage construction — every PlantEvery-th doc
  * is concatenated with its successor into a synthetic doc at +300000,
  * so each synthetic shares a full document-length passage (>= 10 tokens
  * >= w + n - 1 = 8) with TWO known partners. The fixture's word salad
  * has no natural 8-token repeats, so the planted pairs are the complete
  * expected answer set.
  *
  * Checks:
  *  1. Planted recall 1.0: every (base, synthetic) pair shares >= 1
  *     fingerprint hash (candidate pairs via the gh equi-join — the
  *     exact usage a winnowing-based dedup runs).
  *  2. Background precision: candidate pairs NOT planted are counted —
  *     word salad should produce ~0 chance matches; the count is
  *     printed, not assumed.
  *  3. Density: fingerprints / positions within the 2/(w+1) +- band the
  *     spec pins at unit scale, re-measured on the full corpus.
  *
  * Run at sf0.01/sf0.1 (the UNREPLICATED fixtures: GenScale replicates
  * documents verbatim, which makes every doc share every passage with
  * its k clones — that benchmarks the replication pathology, not the
  * operator; X59Probe documents the same corpus caveat).
  */
object X85Probe {
  private val N = 5
  private val W = 4
  private val PlantEvery = 7

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // Carry BOTH parent ids on the synthetic rows: the expected-pair set
    // below derives from this exact frame, so a (k, k+300000) pair exists
    // iff the synthetic doc was actually built (the successor join can
    // drop the max-doc_id candidate when it has no +1 partner — deriving
    // expectations independently from `base` would then report a spurious
    // miss on a dataset-shape accident rather than a real recall loss).
    val synth0 = base.filter(col("doc_id") % PlantEvery === 0).alias("a")
      .join(base.alias("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select((col("a.doc_id") + 300000).as("doc_id"),
        concat(col("a.text"), lit(" "), col("b.text")).as("text"),
        col("a.doc_id").as("pa"), col("b.doc_id").as("pb"))
      .cache()
    val corpus = base.union(synth0.select(col("doc_id"), col("text"))).cache()

    val fp = Dedup.winnowFingerprints(corpus, "doc_id", "text", N, W).cache()
    val nFp = fp.count()

    // density vs positions (valid window starts)
    val positions = corpus.select(
      (size(graft.ops.TextOps.tokens(col("text"))) - (N - 1) - (W - 1)).as("wins"))
      .filter(col("wins") > 0).agg(sum(col("wins"))).head.getLong(0)
    val density = nFp.toDouble / positions

    // candidate pairs via the fingerprint-hash equi-join
    val l = fp.select(col("id").as("id1"), col("gh"))
    val r = fp.select(col("id").as("id2"), col("gh"))
    val cand = l.join(r, Seq("gh"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct().cache()

    val expected = synth0
      .select(explode(array(
        struct(col("pa").as("id1"), col("doc_id").as("id2")),
        struct(col("pb").as("id1"), col("doc_id").as("id2")))).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .cache()
    val nExpected = expected.count()
    val missed = expected.join(cand, Seq("id1", "id2"), "left_anti").count()
    val background = cand.join(expected, Seq("id1", "id2"), "left_anti").count()

    val ok = missed == 0
    println(f"[x85-probe] $sfDir docs=${corpus.count()} fingerprints=$nFp " +
      f"density=$density%.3f (2/(w+1)=${2.0 / (W + 1)}%.3f)")
    println(s"[x85-probe] planted pairs=$nExpected missed=$missed " +
      s"background(non-planted candidate pairs)=$background")
    println(s"[x85-probe] ${if (ok) "PASS" else "FAIL"} no-lost-passage theorem " +
      s"(recall ${if (ok) "1.0" else "INCOMPLETE"})")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
