package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe for x59's prefix-filtered similarity join — the
  * one round-8 query whose DuckDB oracle (deliberately the naive
  * quadratic all-pairs) cannot follow it past sf0.1.
  *
  * Corpus construction: GenScale replicates `documents` VERBATIM, so a
  * raw sfN corpus gives every doc k identical twins — an EXACT join is
  * then obligated to emit 5000 x C(k,2) duplicate pairs (~25M at sf10
  * from ~1.5B candidates), which benchmarks the corpus pathology, not
  * the operator (a real pipeline runs exact dedup x03 first). The probe
  * instead salts every copy's text with ~0.7x its token count of unique
  * id-derived tokens: all 510k docs become DISTINCT, copy-vs-copy
  * Jaccard drops to ~n/2.4n = 0.42 < t, and the similarity graph is
  * sparse — the realistic shape for a post-exact-dedup corpus. Every
  * 50th doc then gets a mutated-tail planted copy (jac ~ 0.9 > t), the
  * known answer set.
  *
  * Two independent checks replace the oracle, both machine-checking the
  * AllPairs no-lost-pair theorem rather than trusting it:
  *
  *  1. Planted recall: for every planted pair the true pairwise Jaccard
  *     is computed directly (planted-pairs-sized, no pair explosion);
  *     the join must return EXACTLY those with true jac >= t — recall 1.0.
  *  2. Sampled brute force: all pairs among a deterministic ~1/97 slice,
  *     with exact intersections via an UNCAPPED token equi-join (never a
  *     cross join of array payloads); the join restricted to the slice
  *     must equal the brute-force set row-for-row (ids AND jac values) —
  *     this also bounds PRECISION on the organic population.
  */
object X59Probe {
  private val T = 0.6
  private val PlantEvery = 50
  // = 0 mod 97 on purpose: a planted pair's endpoints then fall in the
  // brute-force mod-97 slice TOGETHER (~1/97 of them), so the slice check
  // exercises true positives, not just the absence of spurious pairs
  private val PlantOffset = 10000000048L
  private val PlantTail = " planted near duplicate tail marker"

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
    val raw = graft.Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    // ~0.7 x tokens unique salt tokens per doc ("zsaltXqY" survives the
    // lower/\s+ tokenization intact and embeds the doc id)
    val tokCnt = size(split(trim(col("text")), "\\s+"))
    val salted = raw.select(col("doc_id"),
      concat(col("text"), lit(" "),
        concat_ws(" ", transform(
          sequence(lit(1), greatest(lit(3), (tokCnt * 7 / 10).cast("int"))),
          i => concat(lit("zsalt"), col("doc_id"), lit("q"), i)))).as("text"))
    val corpus = salted.union(
      salted.filter(col("doc_id") % PlantEvery === 0)
        .select((col("doc_id") + PlantOffset).as("doc_id"),
          concat(col("text"), lit(PlantTail)).as("text")))
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
    val result = Dedup.prefixSimilarityJoin(sh, T)
      .localCheckpoint() // consumed by both checks below
    val nPairs = result.count()
    val joinSec = (System.nanoTime() - t0) / 1e9
    val nDocs = corpus.count()
    println(f"[x59-probe] $sfDir corpus=$nDocs%d distinct salted docs, join found $nPairs%d pairs >= $T in $joinSec%.1f s")

    // -- check 1: planted recall ------------------------------------------
    val shA = sh.select(col("doc_id").as("id1"), array_distinct(col("s")).as("s1"))
    val shB = sh.select(col("doc_id").as("id2"), array_distinct(col("s")).as("s2"))
    val plantedPairs = raw.filter(col("doc_id") % PlantEvery === 0)
      .select(col("doc_id").as("id1"), (col("doc_id") + PlantOffset).as("id2"))
    val plantedTrue = plantedPairs.join(shA, "id1").join(shB, "id2")
      .filter(size(col("s1")) > 0 && size(col("s2")) > 0)
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          (size(col("s1")) + size(col("s2")) -
            size(array_intersect(col("s1"), col("s2")))).cast("double")).as("jac"))
      .filter(col("jac") >= T)
      .localCheckpoint()
    val expectedPlanted = plantedTrue.count()
    val foundPlanted = plantedTrue.select(col("id1"), col("id2"))
      .join(result, Seq("id1", "id2")).count()
    val r1 = if (foundPlanted == expectedPlanted && expectedPlanted > 0) "PASS" else "FAIL"
    println(s"[x59-probe] $r1 planted recall: $foundPlanted/$expectedPlanted planted pairs with true jac >= $T recovered")

    // -- check 2: sampled brute force (token equi-join, uncapped) ---------
    val sample = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id"), array_distinct(col("s")).as("s"))
      .filter(size(col("s")) > 0)
      .localCheckpoint()
    val nSample = sample.count()
    val ex = sample.select(col("doc_id"), size(col("s")).as("sz"), explode(col("s")).as("tok"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).cast("double").as("o"))
    val sizes = sample.select(col("doc_id"), size(col("s")).as("sz"))
    val brute = inter
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        (col("o") / (col("n1") + col("n2") - col("o"))).as("jac"))
      .filter(col("jac") >= T)
    val inSlice = result
      .join(sample.select(col("doc_id").as("id1")), "id1")
      .join(sample.select(col("doc_id").as("id2")), "id2")
      .select(col("id1"), col("id2"), col("jac"))
    val bruteN = brute.count()
    val missing = brute.join(inSlice, Seq("id1", "id2"), "left_anti").count()
    val spurious = inSlice.join(brute, Seq("id1", "id2"), "left_anti").count()
    val jacMismatch = brute.as("b").join(inSlice.as("r"), Seq("id1", "id2"))
      .filter(col("b.jac") =!= col("r.jac")).count()
    val r2 = if (missing == 0 && spurious == 0 && jacMismatch == 0) "PASS" else "FAIL"
    println(s"[x59-probe] $r2 sampled brute force: $nSample docs, $bruteN true pairs; missing=$missing spurious=$spurious jacMismatch=$jacMismatch")

    val totSec = (System.nanoTime() - t0) / 1e9
    println(f"[x59-probe] done in $totSec%.1f s total")
    spark.stop()
    if (r1 == "FAIL" || r2 == "FAIL") sys.exit(1)
  }
}
