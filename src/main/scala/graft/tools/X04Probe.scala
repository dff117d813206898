package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perf probe for the n-gram Jaccard pair query (x04). */
object X04Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 120).select(col("doc_id"), col("text"))
    val corpus = base.union(
      base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), concat(col("text"), lit(" planted near duplicate tail marker")).as("text")))

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
    time("shingles")(sh)
    time("shingles_exploded")(sh.select(col("doc_id"), explode(col("s")).as("shingle")))
    val ex = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
    time("pair_join")(ex.as("a")
      .join(ex.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter")))
    time("pair_join_again")(ex.as("a")
      .join(ex.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter")))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ExtensionQueries.queries("x04_ngram_jaccard_pairs")(spark, dir).count()
      println(f"x04_full_run$i%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val exCached = ex.cache(); exCached.count()
    time("pair_join_cached")(exCached.as("a")
      .join(exCached.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter")))
    spark.stop()
  }
}
