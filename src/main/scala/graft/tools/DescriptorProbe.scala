package graft.tools

import graft.ops.{AnnModels, Checkpoints}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r20 descriptor-memo win: `corpusDescriptor` on a
  * lineage-cut frame pays one content-hash scan on FIRST construction
  * and a map hit afterwards. `rebuildDue` builds three names per
  * consult (corpus, arrivals, model), so the probe times a cut
  * corpus-sized frame's first descriptor, two repeats, and then a
  * consult-shaped triple, printing millis each.
  *
  * Usage: DescriptorProbe <sfDir> — e.g. /tmp/sf100.
  */
object DescriptorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("descriptor-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").as("v"))
      val cut = Checkpoints.cut(e)
      val arrivals = cut.filter(pmod(col("vec_id"), lit(5L)) === 0)
      def timed(label: String)(f: => String): String = {
        val t0 = System.nanoTime()
        val d = f
        println(f"[descprobe] $label%-28s ${(System.nanoTime() - t0) / 1e6}%.0f ms (desc=$d)")
        d
      }
      val d1 = timed("cut first (content scan)")(AnnModels.corpusDescriptor(cut))
      val d2 = timed("cut repeat (memo)")(AnnModels.corpusDescriptor(cut))
      assert(d1 == d2, "memoized descriptor must equal the scanned one")
      timed("derived filter (new scan)")(AnnModels.corpusDescriptor(arrivals))
      // the consult shape: three names over (corpus, arrivals, model) —
      // post-memo this is three map hits (model is a plan-only frame)
      timed("consult triple (memo)") {
        AnnModels.corpusDescriptor(cut) +
          AnnModels.corpusDescriptor(arrivals) +
          AnnModels.corpusDescriptor(e)
      }
    } finally spark.stop()
  }
}
