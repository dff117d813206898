package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perf probe for the end-to-end dedup pipeline (x26): times each stage
  * (corpus build, shingling, LSH candidates, Jaccard verify, exact edges,
  * label propagation, final aggregation) in isolation so the slow stage is
  * measured, not guessed.
  */
object X26Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def chainTail(prefix: String) =
      concat((0 until 60).flatMap(i =>
        Seq(lit(s" $prefix${i}x"), col("doc_id").cast("string"))): _*)

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 120).select(col("doc_id"), col("text"))
    val third = base.filter(col("doc_id") % 3 === 0)
    val corpus = base
      .union(third.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .union(third.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), chainTail("chainalpha")).as("text")))
      .union(third.select((col("doc_id") + 300000).as("doc_id"),
        concat(col("text"), chainTail("chainalpha"), chainTail("chainbeta")).as("text")))

    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("s")).cache()
    time("shingles (cache)")(sh.count())

    val sigs = sh.select(
      (col("doc_id") +:
        (0 until Dedup.MinHashK).map(i =>
          Dedup.minhashComponent(transform(col("s"), x => TextOps.polyHash(x)), i).as(s"mh$i"))): _*)
    time("signatures")(sigs.count())

    val cands = Dedup.lshCandidates(sigs, "doc_id").cache()
    time("lsh candidates (cache)")(cands.count())

    val withSets = cands
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("s", "s1"), "id1")
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("s", "s2"), "id2")
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    val union = (size(col("s1")) + size(col("s2"))).cast("double") - inter
    val nearPairs = withSets.filter((inter / union) >= 0.5).select(col("id1"), col("id2"))
    time("jaccard verify")(nearPairs.count())

    val exactEdges = corpus
      .select(col("doc_id"), Dedup.contentKey(col("text")).as("h"))
      .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") =!= col("m"))
      .select(col("m").as("id1"), col("doc_id").as("id2"))
    time("exact edges")(exactEdges.count())

    // The LIBRARY path first — this is the number that matters; keep it in
    // sync by construction. The inline replica below exists only to attach
    // per-round timers the library loop doesn't expose; if its numbers ever
    // diverge from this one, the replica is stale and must be re-synced.
    time("duplicateClusters (library)") {
      Dedup.duplicateClusters(exactEdges.union(nearPairs)).count()
    }

    // inline replica of duplicateClusters with per-round timing
    val pairs = exactEdges.union(nearPairs)
    val edges = pairs.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
    val adj = edges.union(edges.select(col("b").as("a"), col("a").as("b"))).distinct().cache()
    time("adj materialize")(adj.count())
    var labels = adj.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = time("labels init + sum")(labelSum(labels))
    var converged = false
    var i = 0
    while (!converged && i < 10) {
      val neighbourMin = adj
        .join(labels, adj("b") === labels("id"))
        .groupBy(adj("a").as("id"))
        .agg(min(col("label")).as("nmin"))
      val next = labels.alias("l")
        .join(neighbourMin.alias("n"), col("l.id") === col("n.id"), "left_outer")
        .select(
          col("l.id").as("id"),
          least(col("l.label"), coalesce(col("n.nmin"), col("l.label"))).as("label"))
      // checkpoint EVERY round (see Dedup.duplicateClusters): a cached
      // generation is invalidated-and-recomputed when its parent cache is
      // unpersisted
      val updated = next.localCheckpoint(true)
      val newSum = time(s"round $i")(labelSum(updated))
      labels.unpersist(blocking = false)
      labels = updated
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      i += 1
    }
    println(s"rounds run: $i")
    adj.unpersist(blocking = false)
    time("labels re-count (cache hit?)")(labels.count())

    time("final agg") {
      val clusters = labels.groupBy(col("label").as("keep_id")).agg(count(lit(1)).as("n"))
      val total = corpus.agg(count(lit(1)).as("tot"))
      val removed = clusters.agg(coalesce(sum(col("n") - 1), lit(0L)).as("removed"))
      val summary = total.crossJoin(removed)
        .select(lit(-1L).as("keep_id"), (col("tot") - col("removed")).as("n"))
      clusters.union(summary).orderBy(col("keep_id")).count()
    }

    spark.stop()
  }
}
