package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for x96's span localization — measures the
  * claim the operator exists for: the merged matched-fingerprint
  * intervals LAND ON the leaked passage, with boundary slack bounded by
  * the winnow selection theorem.
  *
  * Construction (planted ground truth, unlike x96's whole-doc plants):
  * for every train doc with enough tokens, a synthetic bench doc embeds
  * a PassageLen-token slice of that doc (taken at token PassageOff of
  * the origin) between per-doc-unique filler flanks, so the true
  * interval is exactly [FillerLen, FillerLen + PassageLen - 1]. Two
  * plant families: verbatim slices, and every-10th-token mutations of
  * the same slices (x95's paraphrase regime). fingerprintSpans sweeps
  * the planted docs against the REAL train corpus.
  *
  * Measured per family:
  *  - recall: planted docs whose best span pairs with the ORIGIN doc;
  *  - IoU of the best span vs the truth interval;
  *  - boundary slack (span_start - truth_start; truth_end - span_end).
  *
  * Theory says, for verbatim plants: the span cannot extend past the
  * truth (flanks are unique), the first selected matched gram starts at
  * most w - 1 grams in, and the last covers through the passage end —
  * so start slack <= w - 1 = 3, end slack <= w - 1, IoU >=
  * (PassageLen - 2(w-1)) / PassageLen = 0.76 at PassageLen 25. PASS =
  * verbatim recall 1.0, verbatim min IoU >= 0.76, zero spans outside
  * truth bounds, and mutated mean IoU >= 0.5 (intact runs of 9 >=
  * w + n - 1 = 8 keep fingerprints per run; spans bridge the edits).
  *
  * Run at sf0.01/sf0.1 unreplicated (the X85Probe caveat: GenScale
  * clones make every fingerprint boilerplate past the df cap).
  */
object X96Probe {
  private val N = 5
  private val W = 4
  private val Gap = N + 2 * (W - 1)
  private val MinFp = 2L
  private val DfCap = 64L
  private val PassageLen = 25
  private val PassageOff = 5
  private val FillerLen = 20
  private val MutEvery = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val train = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // plant sources: every 7th doc with enough tokens for the slice
    val srcs = train
      .withColumn("_t", TextOps.tokens(col("text")))
      .filter(col("doc_id") % 7 === 0 && size(col("_t")) >= PassageOff + PassageLen)
      .select(col("doc_id"), slice(col("_t"), PassageOff + 1, PassageLen).as("_p"))
    def filler(side: String): org.apache.spark.sql.Column =
      array_join(transform(sequence(lit(1), lit(FillerLen)),
        i => concat(lit(side), col("doc_id").cast("string"), lit("x"), i.cast("string"))), " ")
    val verbatim = srcs.select(
      (col("doc_id") + 600000).as("doc_id"),
      concat_ws(" ", filler("zl"), array_join(col("_p"), " "), filler("zr")).as("text"),
      lit("verbatim").as("cls"), col("doc_id").as("origin"))
    val mutated = srcs.select(
      (col("doc_id") + 700000).as("doc_id"),
      concat_ws(" ", filler("zl"),
        array_join(transform(col("_p"), (t, i) =>
          when(pmod(i, lit(MutEvery)) === 0, concat(lit("zzmut"), i.cast("string")))
            .otherwise(t)), " "),
        filler("zr")).as("text"),
      lit("mutated").as("cls"), col("doc_id").as("origin"))
    val planted = verbatim.union(mutated).cache()
    val nPlants = planted.groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val spans = Dedup.fingerprintSpans(
        planted.select(col("doc_id"), col("text")), train, "doc_id", "text",
        N, W, Gap, MinFp, DfCap)
      .join(planted.select(col("doc_id").as("id"), col("cls"), col("origin")), Seq("id"))
      .cache()

    val tS = FillerLen.toLong
    val tE = (FillerLen + PassageLen - 1).toLong
    // best span per planted doc AGAINST ITS ORIGIN: max overlap with truth
    val onOrigin = spans.filter(col("train_id") === col("origin"))
      .withColumn("ov",
        greatest(lit(0L), least(col("span_end"), lit(tE)) - greatest(col("span_start"), lit(tS)) + 1))
      .withColumn("iou", col("ov").cast("double") /
        (greatest(col("span_end"), lit(tE)) - least(col("span_start"), lit(tS)) + 1).cast("double"))
    val best = onOrigin.groupBy(col("id"), col("cls"))
      .agg(max(col("iou")).as("iou"),
        min(col("span_start")).as("s"), max(col("span_end")).as("e"))
      .cache()
    val stats = best.groupBy(col("cls"))
      .agg(count(lit(1)).as("hit"),
        round(avg(col("iou")), 3).as("mean_iou"), round(min(col("iou")), 3).as("min_iou"),
        max(col("s") - tS).as("max_start_slack"), max(lit(tE) - col("e")).as("max_end_slack"),
        min(col("s")).as("min_s"), max(col("e")).as("max_e"))
      .collect().map(r => r.getString(0) -> r).toMap

    Seq("verbatim", "mutated").foreach { cls =>
      val r = stats(cls)
      val recall = r.getLong(1).toDouble / nPlants(cls)
      println(f"[x96-probe] $sfDir $cls%-8s n=${nPlants(cls)} recall=$recall%.3f mean_iou=${r.getDouble(2)}%.3f min_iou=${r.getDouble(3)}%.3f start_slack<=${r.getLong(4)} end_slack<=${r.getLong(5)} span_bounds=[${r.getLong(6)}, ${r.getLong(7)}] truth=[$tS, $tE]")
    }
    val v = stats("verbatim"); val m = stats("mutated")
    val vRecall = v.getLong(1).toDouble / nPlants("verbatim")
    val iouFloor = (PassageLen - 2.0 * (W - 1)) / PassageLen
    val inBounds = v.getLong(6) >= tS && v.getLong(7) <= tE
    val ok = vRecall == 1.0 && v.getDouble(3) >= iouFloor && inBounds &&
      m.getDouble(2) >= 0.5
    println(f"[x96-probe] theorem floor: verbatim IoU >= $iouFloor%.2f (PassageLen=$PassageLen, w=$W)")
    println(s"[x96-probe] ${if (ok) "PASS" else "FAIL"} spans land on the planted passage within winnow slack")
    if (!ok) sys.exit(1)
    spark.stop()
  }
}
