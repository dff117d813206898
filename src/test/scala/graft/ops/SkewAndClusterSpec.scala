package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Skew-salted aggregation equivalence + duplicate-cluster resolution. */
class SkewAndClusterSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("saltedSumCount equals the plain groupBy on a skewed distribution") {
    val rnd = new scala.util.Random(5)
    // 90% of rows hit one hot key.
    val rows = Seq.fill(20000)(
      (if (rnd.nextInt(10) == 0) s"k${rnd.nextInt(50)}" else "HOT", rnd.nextInt(100).toDouble))
    val df = rows.toDF("key", "value")
    val plain = df.groupBy($"key").agg(sum($"value").as("sum_v"), count(lit(1)).as("count_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(df, $"key", $"value", salts = 8)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    salted.keySet shouldBe plain.keySet
    plain.foreach { case (k, (s, c)) =>
      salted(k)._1 shouldBe s +- 1e-6 // integral doubles: exact
      salted(k)._2 shouldBe c
    }
    // Phase-1 spread: the salted plan aggregates (key, salt) first.
    Skew.saltedSumCount(df, $"key", $"value", 8)
      .queryExecution.executedPlan.toString should include("salt")
  }

  test("salt is content-derived: identical results AND partials under any repartition") {
    val rows = (0 until 5000).map(i => (s"k${i % 7}", (i % 13).toDouble))
    val df = rows.toDF("key", "value")
    // The phase-1 partials are keyed by (k, salt); with a content-hash salt
    // they are a pure function of the data, so any physical layout produces
    // byte-identical partial groups (a monotonic-id salt would shift the
    // spread under repartition even though the final sums agree).
    def partials(n: Int): Set[(String, Long, Double, Long)] =
      df.repartition(n)
        .select($"key".as("k"), $"value".as("v"))
        .withColumn("salt", pmod(xxhash64($"k", $"v"), lit(8L)))
        .groupBy($"k", $"salt")
        .agg(sum($"v").as("ps"), count(lit(1)).as("pc"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val p3 = partials(3)
    partials(13) shouldBe p3
    partials(32) shouldBe p3
    // and the operator's final output is layout-invariant too
    def out(n: Int): Map[String, (Double, Long)] =
      Skew.saltedSumCount(df.repartition(n), $"key", $"value", 8)
        .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    out(13) shouldBe out(3)
  }

  test("discriminator overload spreads a hot key with CONSTANT values; plain salt cannot") {
    // A hot key whose value never varies gives xxhash64(k, v) ONE salt for
    // every row — the documented limitation; mixing in a per-row id
    // restores the spread while keeping results identical.
    val rows = (0L until 10000L).map(i => (i, "HOT", 1.0))
    val df = rows.toDF("id", "key", "value")
    def spread(salt: org.apache.spark.sql.Column): Long =
      df.select(pmod(salt, lit(8L)).as("s")).distinct().count()
    spread(xxhash64($"key", $"value")) shouldBe 1L
    spread(xxhash64($"key", $"value", $"id")) shouldBe 8L
    val out = Skew.saltedSumCount(df, $"key", $"value", 8, discriminator = $"id")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    out shouldBe Map("HOT" -> ((10000.0, 10000L)))
  }

  test("duplicateClusters collapses transitive near-dup chains to min-id labels") {
    // chains: 1~2, 2~3 (one cluster), 10~11, isolated pair 20~21,
    // plus a diamond 30~31, 31~32, 30~32.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (30L, 31L), (31L, 32L), (30L, 32L)).toDF("id1", "id2")
    val labels = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels(1L) shouldBe 1L
    labels(2L) shouldBe 1L
    labels(3L) shouldBe 1L // transitive: 3 never compared against 1
    labels(10L) shouldBe 10L
    labels(11L) shouldBe 10L
    labels(20L) shouldBe 20L
    labels(21L) shouldBe 20L
    Seq(30L, 31L, 32L).foreach(id => labels(id) shouldBe 30L)
  }

  test("duplicateClusters on an empty pair set converges to an empty frame (no NPE)") {
    // the normal outcome of a dedup run that found no candidates — the
    // label-sum convergence check must coalesce the empty-aggregate null
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    Dedup.duplicateClusters(empty).count() shouldBe 0L
  }

  test("duplicateClusters returns a lineage-truncated frame (repeat consumption never replays training)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val labels = Dedup.duplicateClusters(pairs)
    // The returned plan must be a LogicalRDD (localCheckpoint output). A
    // cache()-rooted plan is invalidated by the loop's own unpersist of
    // superseded generations — Spark re-caches dependents by plan, so
    // every consumer would silently recompute the whole propagation
    // history (the x26 15.5 s bench regression).
    labels.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] shouldBe true
  }

  test("full dedup pipeline: LSH candidates -> Jaccard verify -> cluster -> keep min id") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def text(seed: Int) = { val r = new scala.util.Random(seed); Seq.fill(60)(vocab(r.nextInt(vocab.size))).mkString(" ") }
    val base = (0L until 30L).map(i => (i, text(i.toInt)))
    val dups = base.filter(_._1 % 3 == 0).map { case (i, t) => (i + 100, t + " x") }
    val corpus = (base ++ dups).toDF("doc_id", "text")
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("s")).cache()
    val sigs = sh.select(
      col("doc_id") +: (0 until Dedup.MinHashK).map(i =>
        Dedup.minhashComponent(transform(col("s"), x => graft.ops.TextOps.polyHash(x)), i).as(s"mh$i")): _*)
    // LSH alone over-links here (8-word vocab -> unrelated docs share many
    // shingles); the pipeline ALWAYS verifies candidates before clustering.
    val cands = Dedup.lshCandidates(sigs, "doc_id")
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("s", "s1"), "id1")
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("s", "s2"), "id2")
      .filter(Dedup.jaccard(col("s1"), col("s2")) >= 0.6)
      .select(col("id1"), col("id2"))
    val labels = Dedup.duplicateClusters(cands)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted dup resolves to its original's id
    base.filter(_._1 % 3 == 0).foreach { case (i, _) =>
      withClue(s"dup of $i:") { labels.get(i + 100).foreach(_ shouldBe i) }
    }
  }
}
