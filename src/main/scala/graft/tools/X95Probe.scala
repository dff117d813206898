package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe for x95's fuzzy decontamination — measures the
  * claim the operator exists for: winnowing-fingerprint containment
  * catches MUTATED (paraphrase-simulated) eval leakage that exact
  * n-gram containment at a verbatim threshold misses, while agreeing
  * with it on verbatim leakage (recall 1.0, guaranteed by the
  * no-lost-passage theorem X85Probe machine-checks).
  *
  * Same corpus construction as x95 (content-hash split, verbatim plants
  * at +200000, every-10th-token mutations at +400000), two detectors on
  * the SAME bench side:
  *  - fuzzy: winnow-fingerprint containment >= 0.3
  *  - exact: distinct-5-gram containment >= 0.8 (the verbatim-dup
  *    threshold an exact decontamination sweep uses — x24's algebra)
  *
  * Reported: per-class recall of both detectors, background flag rates,
  * and the index-size ratio (train fingerprints / train distinct grams
  * — the 2/(w+1) ~ 0.4 winnowing density bound, measured).
  *
  * PASS = fuzzy verbatim recall 1.0 AND fuzzy mutated recall strictly
  * above exact-at-0.8 mutated recall.
  *
  * Run at sf0.01/sf0.1 (unreplicated fixtures — GenScale's verbatim
  * replication makes every doc share full passages with its clones,
  * which benchmarks the replication pathology, not the detector; the
  * X85Probe caveat).
  */
object X95Probe {
  private val N = 5
  private val W = 4
  private val MutEvery = 10
  private val FpFloor = 0.3
  private val ExactVerbatimFloor = 0.8

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        (TextOps.polyHash(col("text")) % 100).as("bucket"))
    val train = base.filter(col("bucket") < 80).select(col("doc_id"), col("text"))
    val verbatim = base.filter(col("bucket") < 80 && col("doc_id") % 13 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"), lit("verbatim").as("cls"))
    val mutated = base.filter(col("bucket") < 80 && col("doc_id") % 11 === 0)
      .select((col("doc_id") + 400000).as("doc_id"), TextOps.tokens(col("text")).as("_t"))
      .select(col("doc_id"),
        array_join(
          when(size(col("_t")) > 0,
            transform(sequence(lit(1), size(col("_t"))), i =>
              when(pmod(i - 1, lit(MutEvery)) === 0, concat(lit("zzmut"), i.cast("string")))
                .otherwise(element_at(col("_t"), i))))
            .otherwise(array().cast("array<string>")), " ").as("text"),
        lit("mutated").as("cls"))
    val bench = base.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("text"), lit("natural").as("cls"))
      .union(verbatim).union(mutated).cache()

    // fuzzy detector: winnow-fingerprint containment
    val trainFp = Dedup.winnowFingerprints(train, "doc_id", "text", N, W)
      .select(col("gh")).distinct().cache()
    val fuzzy = Dedup.winnowFingerprints(
        bench.select(col("doc_id"), col("text")), "doc_id", "text", N, W)
      .select(col("id").as("doc_id"), col("gh")).distinct()
      .join(trainFp.withColumn("hit", lit(1)), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .as("cont_fuzzy"))

    // exact detector: distinct-5-gram containment (x24's algebra)
    val trainSh = train
      .select(explode(Dedup.shingles(col("text"), N)).as("g")).distinct().cache()
    val exact = bench
      .select(col("doc_id"), array_distinct(Dedup.shingles(col("text"), N)).as("s"))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
      .join(trainSh.withColumn("hit", lit(1)), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") /
        first(col("n")).cast("double")).as("cont_exact"))

    val joined = bench.select(col("doc_id"), col("cls"))
      .join(fuzzy, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("cont_fuzzy", "cont_exact"))
      .select(col("cls"),
        (col("cont_fuzzy") >= FpFloor).cast("int").as("f_flag"),
        (col("cont_exact") >= ExactVerbatimFloor).cast("int").as("e_flag"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n"), sum(col("f_flag")).as("fuzzy_hits"),
        sum(col("e_flag")).as("exact_hits"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val nFp = trainFp.count()
    val nSh = trainSh.count()
    def rate(t: (Long, Long, Long), i: Int): Double =
      (if (i == 0) t._2 else t._3).toDouble / t._1
    // Empty-class guard (round-14 ADVICE): at a tiny/unusual fixture
    // scale a class can be empty (e.g. no doc with bucket<80 and
    // doc_id%13==0); Map.apply would throw a bare NoSuchElementException
    // where the probe should FAIL readably.
    Seq("verbatim", "mutated", "natural").filterNot(joined.contains) match {
      case Nil =>
      case missing =>
        println(s"[x95-probe] FAIL empty class(es) at $sfDir: ${missing.mkString(", ")} — fixture too small for the plant residues")
        sys.exit(1)
    }
    val v = joined("verbatim"); val m = joined("mutated"); val nat = joined("natural")
    println(f"[x95-probe] $sfDir train index: $nFp winnow fingerprints vs $nSh distinct 5-grams (ratio ${nFp.toDouble / nSh}%.3f, bound 2/(w+1)=${2.0 / (W + 1)}%.3f)")
    println(f"[x95-probe] verbatim recall: fuzzy@$FpFloor ${rate(v, 0)}%.3f (n=${v._1}) exact@$ExactVerbatimFloor ${rate(v, 1)}%.3f")
    println(f"[x95-probe] mutated  recall: fuzzy@$FpFloor ${rate(m, 0)}%.3f (n=${m._1}) exact@$ExactVerbatimFloor ${rate(m, 1)}%.3f")
    println(f"[x95-probe] natural  flag rate: fuzzy ${rate(nat, 0)}%.3f exact ${rate(nat, 1)}%.3f (n=${nat._1})")
    val ok = rate(v, 0) == 1.0 && rate(m, 0) > rate(m, 1)
    println(s"[x95-probe] ${if (ok) "PASS" else "FAIL"} fuzzy catches the mutated plants exact-at-verbatim misses")

    // Mutation-density trade table: fuzzy recall at the served floor as
    // the edit rate rises (mutEvery falls). The theorem guarantees a
    // shared fingerprint per intact run >= w+n-1 = 8 tokens, so recall
    // should hold while mutEvery-1 >= 8 and degrade gracefully below —
    // the knob table that tells an operator where the detector's floor
    // actually sits (the BitextTrade discipline).
    println("[x95-probe] mutEvery | intact-run | fuzzy recall @ floor")
    Seq(25, 10, 8, 6, 4).foreach { me =>
      val plants = base.filter(col("bucket") < 80 && col("doc_id") % 11 === 0)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("_t"))
        .select((col("doc_id") + 400000).as("doc_id"),
          array_join(
            when(size(col("_t")) > 0,
              transform(sequence(lit(1), size(col("_t"))), i =>
                when(pmod(i - 1, lit(me)) === 0, concat(lit("zzmut"), i.cast("string")))
                  .otherwise(element_at(col("_t"), i))))
              .otherwise(array().cast("array<string>")), " ").as("text"))
      val cont = Dedup.winnowFingerprints(plants, "doc_id", "text", N, W)
        .select(col("id"), col("gh")).distinct()
        .join(trainFp.withColumn("hit", lit(1)), Seq("gh"), "left")
        .groupBy(col("id"))
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))).as("c"))
      val nPlants = cont.count()
      val caught = cont.filter(col("c") >= FpFloor).count()
      println(f"[x95-probe]   $me%7d | ${me - 1}%10d | ${caught.toDouble / nPlants}%.3f ($caught/$nPlants)")
    }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
