package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MinHash/LSH width probe: candidate-pair precision and planted-dup recall
  * as the signature widens — the "fixed 8-bit signatures / k=8 MinHash
  * widen candidate sets as the corpus grows" trade made measurable. Plants
  * the standard mutated-tail duplicates (every 3rd doc, id+100000) over the
  * full documents table, then for several (k, bands) configurations counts
  *  - candidates: pairs sharing >= 1 LSH band key,
  *  - verified:   candidates whose true shingle Jaccard >= 0.5,
  *  - recall:     verified planted pairs / planted pairs.
  * More bands of fewer rows -> recall up, precision down; more rows per
  * band -> the reverse. Results for sf0.1 are recorded in SURVEY §8.
  */
object LshWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = base.union(
      base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" planted near duplicate tail marker")).as("text")))

    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .filter(size(col("s")) > 0).cache()
    val nDocs = sh.count()

    // ground truth: planted pairs where BOTH sides shingle
    val planted = sh.select(col("doc_id"))
      .join(sh.select((col("doc_id") - 100000).as("doc_id")), "doc_id")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id1"), (col("doc_id") + 100000).as("id2"))
      .cache()
    val nPlanted = planted.count()
    println(s"docs=$nDocs plantedPairs=$nPlanted sf=$dir")
    println(f"${"k"}%4s ${"bands"}%6s ${"r"}%3s ${"cands"}%8s ${"verified"}%9s ${"precision"}%10s ${"recall"}%7s ${"secs"}%6s")

    for ((k, bands) <- Seq((4, 2), (8, 4), (8, 2), (16, 8), (16, 4), (32, 16))) {
      val r = k / bands
      val t0 = System.nanoTime()
      val sigs = sh.select(
        col("doc_id") +: (0 until k).map(i =>
          Dedup.minhashComponent(transform(col("s"), x => TextOps.polyHash(x)), i).as(s"mh$i")): _*)
      val cands = Dedup.lshCandidates(sigs, "doc_id", bands = bands, rowsPerBand = r).cache()
      val nCands = cands.count()
      val verified = cands
        .join(sh.select(col("doc_id").as("id1"), col("s").as("s1")), "id1")
        .join(sh.select(col("doc_id").as("id2"), col("s").as("s2")), "id2")
        .filter(Dedup.jaccard(col("s1"), col("s2")) >= 0.5)
        .select("id1", "id2").cache()
      val nVerified = verified.count()
      val nRecalled = verified.join(planted, Seq("id1", "id2"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      val prec = if (nCands == 0) 1.0 else nVerified.toDouble / nCands
      val rec = if (nPlanted == 0) 1.0 else nRecalled.toDouble / nPlanted
      println(f"$k%4d $bands%6d $r%3d $nCands%8d $nVerified%9d $prec%10.3f $rec%7.3f $secs%6.1f")
      cands.unpersist(false)
      verified.unpersist(false)
    }
    spark.stop()
  }
}
