package graft.tools

import graft.ops.TextOps
import graft.streaming.DocStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured bias table for [[graft.streaming.DocStreams.dupGramRateMonitor]]:
  * the bucket-folded dup rate vs the exact gram-level rate across bucket
  * widths, on the spec's planted corpus (every 7th doc duplicated). The
  * monitor's estimate is one-sidedly conservative — distinct grams
  * colliding in a bucket mark extra positions duplicated — and the bias
  * is governed by positions/buckets; this prints the knob so an operator
  * can size [[DocStreams.DupGramBuckets]] for a target overshoot instead
  * of guessing. (Same discipline as tools.BitextTrade for x68b's nprobe.)
  *
  * Usage: runMain graft.tools.DupGramTrade [sfDir]
  */
object DupGramTrade {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val docs = base.union(
      base.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id") + 1000000, col("source"), col("text")))
      .select(col("source"), col("text"))

    // exact gram-level rate (corpus-wide, the x79 semantics)
    val pos = docs
      .select(col("source"), TextOps.tokens(col("text")).as("_tk"))
      .select(col("source"),
        explode(TextOps.positionalGramHashesOfTokens(col("_tk"), 5)).as("gh"))
      .cache()
    val gc = pos.groupBy(col("gh")).agg(count(lit(1)).as("gn"))
    val exact = pos.join(gc, "gh")
      .agg((sum(when(col("gn") > 1, 1L).otherwise(0L)).cast("double")
        / count(lit(1)).cast("double")).as("r"))
      .head.getDouble(0)
    val positions = pos.count()
    pos.unpersist(false)

    println(f"positions=$positions%d exact_dup_rate=$exact%.4f")
    println("buckets   load(pos/bkt)   bucket_rate   overshoot")
    Seq(1L << 12, 1L << 16, 1L << 20, 1L << 24).foreach { nb =>
      val rates = DocStreams.dupGramRollup(
        DocStreams.dupGramBucketCounts(docs, n = 5, buckets = nb))
      val agg = rates.agg(
        sum(col("n_dup_positions")).cast("double").as("d"),
        sum(col("n_positions")).cast("double").as("p")).head
      val r = agg.getDouble(0) / agg.getDouble(1)
      println(f"2^${java.lang.Long.numberOfTrailingZeros(nb)}%-7d ${positions.toDouble / nb}%13.1f   $r%11.4f   ${r - exact}%+9.4f")
    }
    spark.stop()
  }
}
