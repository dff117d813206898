package graft.ops

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Corpus-mix semantics (ops/CorpusMix.scala): exact apportionment
  * invariants (sums, monotonicity, degenerate budgets) and the JS
  * divergence's defining properties (zero on identical distributions,
  * bounded by ln 2, larger for more-different sources).
  */
class CorpusMixSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def alloc(counts: Seq[(String, Long)], alpha: Double, budget: Long): Map[String, Long] =
    CorpusMix.temperatureAllocation(counts.toDF("source", "n_docs"), alpha, budget)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap

  test("remainderAllocation: arbitrary weights, extra columns ride through, exact budget") {
    // the generic tail x80 feeds its exp-weights into — contract checked
    // directly, not just through temperatureAllocation's delegation
    val weighted = Seq(
      ("a", 5L, 17L, 0.11), ("b", 9L, 1L, 0.22),
      ("c", 2L, 9999999L, 0.33), ("d", 1L, 3L, 0.44))
      .toDF("source", "n_docs", "w", "extra")
    val out = CorpusMix.remainderAllocation(weighted, budget = 1000L)
    out.columns shouldBe Array("source", "n_docs", "w", "extra", "alloc")
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(2), r.getDouble(3), r.getLong(4))).sortBy(_._1)
    rows.map(_._4).sum shouldBe 1000L // exact, not approximate
    // extra column survives untouched
    rows.map(_._3) shouldBe Array(0.11, 0.22, 0.33, 0.44)
    // allocation is monotone in w, and a dominating weight takes nearly all
    val byW = rows.sortBy(_._2)
    byW.map(_._4) shouldBe byW.map(_._4).sorted
    rows.find(_._1 == "c").get._4 should be >= 990L
    // zero budget allocates zero everywhere, still summing exactly
    CorpusMix.remainderAllocation(weighted, budget = 0L)
      .collect().map(_.getLong(4)).sum shouldBe 0L
  }

  test("allocation sums EXACTLY to the budget, across alphas and ragged sizes") {
    val counts = Seq("a" -> 7L, "b" -> 123L, "c" -> 5000L, "d" -> 1L, "e" -> 999L)
    for (alpha <- Seq(0.3, 0.5, 0.7, 1.0); budget <- Seq(0L, 1L, 17L, 100000L)) {
      val a = alloc(counts, alpha, budget)
      withClue(s"alpha=$alpha budget=$budget: ") { a.values.sum shouldBe budget }
    }
  }

  test("a larger source never receives a smaller allocation") {
    val counts = Seq("a" -> 10L, "b" -> 100L, "c" -> 1000L, "d" -> 10000L)
    val a = alloc(counts, 0.3, 9999L)
    a("a") should be <= a("b")
    a("b") should be <= a("c")
    a("c") should be <= a("d")
  }

  test("alpha < 1 upweights small sources relative to their raw share") {
    val counts = Seq("small" -> 100L, "big" -> 10000L)
    val a = alloc(counts, 0.3, 10100L)
    // raw share would give small exactly 100; temperature must give more
    a("small").toDouble should be > 100.0
    a("small") + a("big") shouldBe 10100L
  }

  test("alpha = 1 reproduces proportional apportionment within 1 doc") {
    val counts = Seq("a" -> 250L, "b" -> 750L)
    val a = alloc(counts, 1.0, 1000L)
    a("a").toDouble shouldBe 250.0 +- 1.0
    a("b").toDouble shouldBe 750.0 +- 1.0
  }

  test("randomized sweep: sum and monotonicity invariants hold on arbitrary inputs") {
    val rnd = new scala.util.Random(97)
    (1 to 10).foreach { _ =>
      val nSrc = 1 + rnd.nextInt(30)
      val counts = (0 until nSrc).map(i => f"s$i%02d" -> (1L + rnd.nextInt(1000000)))
      val alpha = 0.05 + rnd.nextDouble() * 0.95
      val budget = rnd.nextInt(1000000).toLong
      val a = alloc(counts, alpha, budget)
      withClue(s"nSrc=$nSrc alpha=$alpha budget=$budget: ") {
        a.values.sum shouldBe budget
        // monotone in n_docs for strict inequalities; equal counts may
        // differ by the single largest-remainder top-up unit
        val sorted = counts.sortBy(_._2)
        sorted.zip(sorted.tail).foreach { case ((s1, c1), (s2, c2)) =>
          if (c1 < c2) a(s1) should be <= a(s2)
          else math.abs(a(s1) - a(s2)) should be <= 1L
        }
      }
    }
  }

  private def js(counts: Seq[(String, Long, Long)]): Map[(String, String), Double] =
    CorpusMix.jsDivergenceMatrix(counts.toDF("source", "bucket", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("identical distributions have zero divergence; different ones do not") {
    val d1 = (0L until 8L).map(b => ("a", b, 10L + b))
    val d2 = (0L until 8L).map(b => ("b", b, 10L + b))     // same shape as a
    val d3 = (0L until 8L).map(b => ("c", b, 100L - 10 * b)) // reversed slope
    val m = js(d1 ++ d2 ++ d3)
    m(("a", "b")) shouldBe 0.0
    m(("a", "c")) should be > 0.0
    m(("a", "c")) shouldBe m(("b", "c")) // a and b are the same distribution
  }

  test("divergence is bounded by ln 2 and near it for disjoint mass") {
    val d1 = Seq(("a", 0L, 1000000L))
    val d2 = Seq(("b", 255L, 1000000L))
    val m = js(d1 ++ d2)
    m(("a", "b")) should be <= math.log(2.0)
    // smoothing keeps it strictly inside, but disjoint heavy mass should
    // land within a few percent of the bound
    m(("a", "b")) should be > 0.9 * math.log(2.0)
  }

  test("x75 IPF raking: source marginals exact, lang marginals converged, budget preserved") {
    import org.apache.spark.sql.functions.{abs => sabs, col, first, sum => ssum}
    val q = graft.SparkEntry.queries("x75_ipf_mix")(spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    all(rows.map(_.getAs[Double]("quota"))) should be > 0.0
    // total budget preserved (both marginal target sets sum to the budget,
    // and every rescale preserves the rescaled dimension's total)
    rows.map(_.getAs[Double]("quota")).sum shouldBe 100000.0 +- 0.01
    // the LAST half-round rescaled to the source targets -> exact (to the
    // scale-12 quantization) ...
    val srcErr = q.groupBy(col("source"))
      .agg(sabs(ssum(col("quota")) - first(col("st"))).as("e"))
      .collect().map(_.getAs[Double]("e")).max
    srcErr should be < 1e-3
    // ... while the lang marginals have geometrically converged: within
    // 0.1% of target after IpfRounds alternating projections
    val langErr = q.groupBy(col("lang"))
      .agg((sabs(ssum(col("quota")) - first(col("lt"))) / first(col("lt"))).as("e"))
      .collect().map(_.getAs[Double]("e")).max
    langErr should be < 1e-3
  }

  test("epochCappedAllocation: caps bind, budget preserved, rounds within the oracle unroll") {
    import org.apache.spark.sql.functions._
    // the x93 fixture shape: 20 uniform sources, three planted supply
    // tiers (full / half / fifth), cap = 4 epochs, budget = 1.8 N
    val counts = (0 until 20).map(i => (s"src$i", 25L)).toDF("source", "n_docs")
    val tier = pmod(TextOps.polyHash(col("source")), lit(3L))
    val weighted = counts
      .withColumn("u",
        when(tier === 0, col("n_docs"))
          .when(tier === 1, expr("n_docs div 2"))
          .otherwise(expr("n_docs div 5")))
      .select(col("source"), col("n_docs"), col("u"),
        floor(pow(col("u").cast("double"), lit(0.5)) * 1e6).cast("long").as("w"),
        (col("u") * 4L).as("cap"))
    val (out, rounds) = CorpusMix.epochCappedAllocationWithRounds(weighted, budget = 900L)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(4), r.getLong(5), r.getInt(6))) // (source, cap, alloc, capped)
    rows.map(_._3).sum shouldBe 900L // budget preserved exactly through the waterfall
    rows.foreach { case (s, cap, alloc, flag) =>
      withClue(s"$s: ") {
        alloc should be <= cap // no allocation ever exceeds its cap
        if (flag == 1) alloc shouldBe cap // frozen sources sit exactly AT the cap
      }
    }
    rows.count(_._4 == 1) shouldBe 14 // both small tiers bind
    rows.count(_._4 == 0) shouldBe 6
    // the waterfall actually cascaded (round-1 caps freed budget that
    // pushed the mid tier over in a LATER round) and stays within the
    // x93 oracle's unrolled depth
    rounds shouldBe 4
    rounds should be <= 6 // CapMixRounds — the oracle unroll this pins
    // redistribution is real: every uncapped source receives MORE than a
    // cap-ignorant single-round apportionment would give it
    val plain = CorpusMix.remainderAllocation(weighted, 900L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    rows.filter(_._4 == 0).foreach { case (s, _, alloc, _) =>
      withClue(s"$s: ") { alloc should be > plain(s) }
    }
  }

  test("epochCappedAllocation: budget above total cap capacity fails fast") {
    val weighted = Seq(("a", 10L, 5L), ("b", 10L, 5L)).toDF("source", "w", "cap")
    an[IllegalArgumentException] should be thrownBy
      CorpusMix.epochCappedAllocation(weighted, budget = 11L)
  }

  test("epochCappedAllocation: budget equal to capacity saturates every cap") {
    // a's weight hogs round 1 (over-cap), freeing exactly b's cap for
    // round 2, which lands b AT its cap without tripping the capped flag
    val weighted = Seq(("a", 100L, 6L), ("b", 1L, 9L)).toDF("source", "w", "cap")
    val (out, _) = CorpusMix.epochCappedAllocationWithRounds(weighted, budget = 15L)
    out.collect().map(r => (r.getString(0), r.getLong(3), r.getInt(4)))
      .sortBy(_._1) shouldBe Array(("a", 6L, 1), ("b", 9L, 0))
  }

  test("x97 materialization: per-source repeats sum to x93's alloc, respect the epoch cap") {
    val dir = "/root/testdata/sf0.001"
    val alloc = graft.ExtensionQueries.queries("x93_epoch_mix")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("u"), r.getAs[Long]("alloc"))).toMap
    val mat = graft.ExtensionQueries.queries("x97_epoch_mix_materialize")(spark, dir)
      .collect()
    val budget = alloc.values.map(_._2).sum
    // global: the materialized repeats place EXACTLY the budget
    mat.map(_.getAs[Long]("n_repeats")).sum shouldBe budget
    // per source: sum(n_repeats) == alloc; picks stay inside the
    // unique-supply slice; no doc repeats past the published cap
    mat.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val (u, a) = alloc(src)
      withClue(s"$src: ") {
        rows.map(_.getAs[Long]("n_repeats")).sum shouldBe a
        rows.map(_.getAs[Long]("pick_rank")).max should be <= u
        rows.map(_.getAs[Long]("pick_rank")).toSet.size shouldBe rows.length
        all(rows.map(_.getAs[Long]("n_repeats"))) should be <= 4L // EpochCap
      }
    }
    // sources whose planted unique supply rounds to zero contribute no
    // rows (the u-slice filter, not a divide-by-zero)
    val zeroU = alloc.collect { case (s, (0L, _)) => s }.toSet
    mat.map(_.getAs[String]("source")).toSet.intersect(zeroU) shouldBe Set.empty
  }

  test("x99 plan: epoch e holds exactly the docs with n_repeats > e; shards in range") {
    val dir = "/root/testdata/sf0.001"
    val mat = graft.ExtensionQueries.queries("x97_epoch_mix_materialize")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_repeats")).toMap
    val plan = graft.ExtensionQueries.queries("x99_epoch_shard_plan")(spark, dir)
      .collect()
    // budget-sized, no (doc, epoch) duplicate — a repeat spreads ACROSS
    // epochs, never lands twice in one
    plan.length.toLong shouldBe mat.values.sum
    plan.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch")))
      .distinct.length shouldBe plan.length
    // per-epoch membership is exactly the repeat-factor threshold
    plan.groupBy(_.getAs[Long]("epoch")).foreach { case (e, rows) =>
      withClue(s"epoch $e: ") {
        rows.map(_.getAs[Long]("doc_id")).toSet shouldBe
          mat.collect { case (d, r) if r > e => d }.toSet
      }
    }
    all(plan.map(_.getAs[Int]("shard"))) should (be >= 0 and be < 8)
    // the hash spread actually fans out across shards
    plan.map(_.getAs[Int]("shard")).distinct.length should be >= 6
  }
}
