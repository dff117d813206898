package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off perf probe for the all-pairs cosine join (x09). Not part of the
  * driver contract; used to attribute time between join, row copy, and
  * cosine evaluation.
  */
object X09Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val corpus = e.union(
      e.filter(col("vec_id") % 5 === 0).select((col("vec_id") + 100000).as("vec_id"), col("v")))
      .select(col("vec_id"), col("v"), Similarity.norm(col("v"), 64).as("nrm"))

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val a = corpus.as("a"); val b = corpus.as("b")
    val joined = a.join(b, col("a.vec_id") < col("b.vec_id"))

    time("pairs_only")(joined.select(col("a.vec_id"), col("b.vec_id")))
    time("pairs_with_arrays")(joined.select(col("a.vec_id"), col("b.vec_id"), col("a.v"), col("b.v")))
    time("dot_static")(joined.select(
      Similarity.dotNative(col("a.v"), col("b.v")).as("d")).filter(col("d") > 1e9))
    time("full_cosine_filter")(joined.select(
      round(Similarity.cosineStatic(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"), 64), 6).as("cos"))
      .filter(col("cos") >= 0.99))
    time("cosine_project_barrier")(joined
      .select(
        col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(Similarity.cosineStatic(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"), 64), 6).as("cos"),
        monotonically_increasing_id().as("_mid"))
      .filter(col("cos") >= 0.99).drop("_mid"))
    val cached = corpus.cache(); cached.count()
    val ca = cached.as("a"); val cb = cached.as("b")
    time("full_cosine_cached")(ca.join(cb, col("a.vec_id") < col("b.vec_id")).select(
      round(Similarity.cosineStatic(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"), 64), 6).as("cos"))
      .filter(col("cos") >= 0.99))

    joined.select(round(Similarity.cosineStatic(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"), 64), 6).as("cos"))
      .filter(col("cos") >= 0.99).explain("formatted")
    spark.stop()
  }
}
