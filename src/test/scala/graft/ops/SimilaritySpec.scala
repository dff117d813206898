package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Similarity search: exact cosine behavior and LSH-bucket recall against
  * the brute-force baseline.
  */
class SimilaritySpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private val dim = 16

  private def randVec(seed: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  test("cosine: identical 1, negated -1, orthogonal 0") {
    val v = Seq.fill(8)(1.0)
    val df = Seq(
      (v, v),
      (v, v.map(-_)),
      (Seq(1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0), Seq(0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).as[Double].collect()
    df(0) shouldBe 1.0 +- 1e-12
    df(1) shouldBe -1.0 +- 1e-12
    df(2) shouldBe 0.0 +- 1e-12
  }

  test("bruteForceTopK returns the known nearest neighbour first") {
    // vec 100 is a tiny perturbation of vec 0 -> must be rank 1 for query 0.
    val base = (0 until 50).map(i => (i.toLong, randVec(i)))
    val near = (100L, randVec(0).map(_ * 1.0001 + 1e-6))
    val corpus = (base :+ near).toDF("vec_id", "v")
    val top = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0), 3)
      .orderBy("rnk").collect()
    top.head.getAs[Long]("vec_id") shouldBe 100L
    top.head.getAs[Double]("cos") shouldBe 1.0 +- 1e-4
  }

  test("LSH buckets: near-identical vectors land in the same bucket; candidate set is subquadratic") {
    val base = (0 until 200).map(i => (i.toLong, randVec(i)))
    val planted = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 1000, v.map(_ * 1.001)) }
    val corpus = (base ++ planted).toDF("vec_id", "v")
    val cands = Similarity.lshBucketCandidates(corpus, bits = 8, dim = dim)
    val pairs = cands.select("id1", "id2").as[(Long, Long)].collect().toSet
    val wanted = base.filter(_._1 % 10 == 0).map { case (i, _) => (i, i + 1000) }.toSet
    // Scaled copies have identical hyperplane signs -> same bucket, always.
    wanted.subsetOf(pairs) shouldBe true
    // Bucketing must prune the pair space (220 vectors -> 24k possible pairs).
    pairs.size.toLong should be < (220L * 219L / 2 / 4)
    // Verified cosines for planted pairs are ~1.
    cands.filter(col("id2") >= 1000 && col("id1") === col("id2") - 1000)
      .select(min("cos")).head().getDouble(0) should be >= 0.999
  }

  test("ivfProbe: nprobe widens the candidate set monotonically; nprobe=1 is assignment") {
    val corpus = (0 until 200).map(i => (i.toLong, randVec(i))).toDF("vec_id", "v")
    val cents = (0 until 8).map(i => (i.toLong, randVec(1000 + i))).toDF("vec_id", "v")
    val p1 = Similarity.ivfProbe(corpus, cents, dim, 1)
    val p3 = Similarity.ivfProbe(corpus, cents, dim, 3)
    // assignment: exactly one cell per vector; probing: exactly min(nprobe, cells)
    p1.groupBy("vec_id").count().filter(col("count") =!= 1).count() shouldBe 0L
    p3.groupBy("vec_id").count().filter(col("count") =!= 3).count() shouldBe 0L
    // monotone: every (vec, cell) probed at nprobe=1 is probed at nprobe=3
    p1.join(p3, Seq("vec_id", "cell_id"), "left_anti").count() shouldBe 0L
    // ivfAssign is the nprobe=1 alias
    Similarity.ivfAssign(corpus, cents, dim).select("vec_id", "cell_id")
      .except(p1.select("vec_id", "cell_id")).count() shouldBe 0L
    // recall: brute-force nearest neighbour of each query is found within
    // the probed cells strictly more often at nprobe=3 than misses allow
    val queries = corpus.filter(col("vec_id") < 20)
    def recalled(probed: org.apache.spark.sql.DataFrame): Long = {
      val truth = Similarity.bruteForceTopK(corpus, queries, 1, dim = dim)
        .select(col("qid"), col("vec_id").as("nn"))
      val qcells = probed.join(queries.select("vec_id"), "vec_id")
        .select(col("vec_id").as("qid"), col("cell_id"))
      val nncells = probed.select(col("vec_id").as("nn"), col("cell_id"))
      truth.join(qcells, "qid").join(nncells, Seq("nn", "cell_id"), "left_semi")
        .select("qid").distinct().count()
    }
    val r1 = recalled(p1)
    val r3 = recalled(p3)
    r3 should be >= r1
    r3 should be > 10L // with 8 cells and nprobe 3, most true NNs are reachable
  }

  test("PQ: codes are bounded by the codebook, reconstruction recovers clustered structure") {
    // Corpus built FROM k prototypes per subspace (+ tiny noise), so a
    // k-codeword codebook can represent it well: every reconstruction
    // must stay near its source vector.
    val m = 4
    val subDim = 4
    val k = 4
    val protos = (0 until m).map(sub => (0 until k).map(c => randVec(sub * 100 + c).take(subDim)))
    val rnd = new scala.util.Random(7)
    // ids 0..k-1 are the pure prototypes (the trainer seeds from the first
    // k ids, so every prototype cluster gets a seed); the rest sample a
    // random prototype per subspace + tiny noise.
    val corpus = (0 until 60).map { i =>
      val v = (0 until m).flatMap { sub =>
        val p = protos(sub)(if (i < k) i else rnd.nextInt(k))
        if (i < k) p else p.map(_ + (rnd.nextDouble() - 0.5) * 1e-3)
      }
      (i.toLong, v)
    }.toDF("vec_id", "v")
    val cb = Similarity.pqCodebooks(corpus, m, subDim, k, iters = 2)
    // codebook: at most k codewords per subspace, each of subDim dims
    cb.groupBy("subspace").count().filter(col("count") > k).count() shouldBe 0L
    cb.filter(functions.size(col("cv")) =!= subDim).count() shouldBe 0L
    val codes = Similarity.pqEncode(corpus, cb, subDim)
    // exactly one code per (vector, subspace); codes come from the codebook
    codes.groupBy("vec_id").count().filter(col("count") =!= m).count() shouldBe 0L
    codes.join(cb.withColumnRenamed("cell_id", "code"), Seq("subspace", "code"), "left_anti")
      .count() shouldBe 0L
    // reconstruction: full dim, and cosine-close to the original for ALL
    // vectors (the corpus is k-representable by construction)
    val recon = Similarity.pqReconstruct(codes, cb)
    recon.filter(functions.size(col("rv")) =!= m * subDim).count() shouldBe 0L
    recon.join(corpus, "vec_id")
      .select(Similarity.cosine(col("v"), col("rv")).as("c"))
      .agg(min(col("c"))).head().getDouble(0) should be > 0.98
  }

  test("mmrSelect diversifies: near-duplicate of the top pick loses to a distinct cluster") {
    // two near-identical high-relevance vectors (cluster A) and one
    // orthogonal lower-relevance vector (B). Pure top-2 = both A's; MMR
    // with lambda 0.5 must pick A then B (the second A's redundancy
    // penalty ~1 sinks it), and take the second A only in round 3.
    val cands = Seq(
      (1L, 0.95, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, 0.94, Seq(0.999, 0.001, 0.0, 0.0)),
      (3L, 0.50, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "rel", "v")
    val out = Similarity.mmrSelect(cands, k = 3, lambda = 0.5, dim = 4)
      .select(col("rnd"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    out.toSeq shouldBe Seq((1L, 1L), (2L, 3L), (3L, 2L))
  }

  test("mmrSelect: anti-correlated candidates keep their NEGATIVE max-sim (no zero floor)") {
    // candidate 2 is the exact negation of pick 1: its max-sim to the
    // selected set is -1, so its round-2 score is lambda*rel + (1-lambda)
    // — BETTER than its raw relevance. A zero-floored max-sim would
    // under-score it by (1-lambda).
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.1, Seq(-1.0, 0.0))).toDF("vec_id", "rel", "v")
    val out = Similarity.mmrSelect(cands, k = 2, lambda = 0.5, dim = 2)
      .select(col("rnd"), col("vec_id"), col("mmr")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.toSeq shouldBe Seq((1L, 1L, 0.45), (2L, 2L, 0.05 + 0.5))
  }

  test("mmrSelect survives zero-norm candidates (no NaN poisoning, no crash)") {
    // candidate 3 is the all-zero vector: its cosine against any pick is
    // 0/0. The guard treats that similarity as 0, so the zero vector stays
    // selectable on its relevance and the selection completes all k rounds
    // (previously: BigDecimal(NaN) threw inside the expression).
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.6, Seq(0.0, 1.0)),
      (3L, 0.7, Seq(0.0, 0.0))).toDF("vec_id", "rel", "v")
    val out = Similarity.mmrSelect(cands, k = 3, lambda = 0.5, dim = 2)
      .select(col("rnd"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // round 1: id 1 (0.45). round 2: id 3 scores 0.35 - 0.5*0 = 0.35,
    // id 2 scores 0.30 - 0 = 0.30 -> id 3. round 3: id 2.
    out.toSeq shouldBe Seq((1L, 1L), (2L, 3L), (3L, 2L))
  }

  test("mmrSelect with NaN relevance returns the comparable prefix instead of crashing") {
    // Every score NaN from round 1 -> argmax finds nothing -> empty result
    // (prefix of completed rounds), not an ArrayIndexOutOfBoundsException.
    val allNan = Seq((1L, Double.NaN, Seq(1.0, 0.0)), (2L, Double.NaN, Seq(0.0, 1.0)))
      .toDF("vec_id", "rel", "v")
    Similarity.mmrSelect(allNan, k = 2, lambda = 0.5, dim = 2).count() shouldBe 0L
    // A NaN-relevance candidate among sound ones is simply never selected.
    val mixed = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, Double.NaN, Seq(0.0, 1.0)),
      (3L, 0.2, Seq(0.5, 0.5))).toDF("vec_id", "rel", "v")
    val picked = Similarity.mmrSelect(mixed, k = 3, lambda = 0.5, dim = 2)
      .select(col("vec_id")).collect().map(_.getLong(0))
    picked.toSeq shouldBe Seq(1L, 3L)
  }

  test("mmrSelectGrouped: each query group re-ranks independently, equal to per-query mmrSelect") {
    val g1 = Seq(
      (1L, 0.95, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, 0.94, Seq(0.999, 0.001, 0.0, 0.0)),
      (3L, 0.50, Seq(0.0, 1.0, 0.0, 0.0)))
    val g2 = Seq(
      (4L, 0.90, Seq(0.0, 0.0, 1.0, 0.0)),
      (5L, 0.80, Seq(0.0, 0.0, 0.999, 0.001)),
      (6L, 0.40, Seq(0.0, 0.0, 0.0, 1.0)))
    val cands = (g1.map(t => (10L, t._1, t._2, t._3)) ++ g2.map(t => (20L, t._1, t._2, t._3)))
      .toDF("qid", "vec_id", "rel", "v")
    val grouped = Similarity.mmrSelectGrouped(cands, k = 2, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet // (qid, rnd, vec_id)
    val singles = Seq(10L -> g1, 20L -> g2).flatMap { case (qid, g) =>
      Similarity.mmrSelect(g.toDF("vec_id", "rel", "v"), k = 2, lambda = 0.5, dim = 4)
        .collect().map(r => (qid, r.getLong(2), r.getLong(0)))
    }.toSet
    grouped shouldBe singles
    // both groups diversified: round 2 jumps to the distinct cluster
    grouped should contain((10L, 2L, 3L))
    grouped should contain((20L, 2L, 6L))
  }

  test("mmrSelect is invariant to candidate row order and partitioning (collect_list hazard)") {
    // the expression sorts by id internally; a result that depended on
    // collect_list's arrival order would flake across partitionings
    val base = Seq(
      (5L, 0.91, Seq(1.0, 0.0, 0.0)),
      (1L, 0.90, Seq(0.99, 0.14, 0.0)),
      (9L, 0.60, Seq(0.0, 1.0, 0.0)),
      (3L, 0.59, Seq(0.0, 0.99, 0.14)),
      (7L, 0.30, Seq(0.0, 0.0, 1.0)))
    val expected = Similarity.mmrSelect(base.toDF("vec_id", "rel", "v"), k = 3, lambda = 0.6, dim = 3)
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getDouble(3))).toSeq
    Seq(base.reverse, base.sortBy(_._2)).foreach { perm =>
      Seq(1, 5).foreach { parts =>
        val out = Similarity.mmrSelect(perm.toDF("vec_id", "rel", "v").repartition(parts), k = 3, lambda = 0.6, dim = 3)
          .collect().map(r => (r.getLong(2), r.getLong(0), r.getDouble(3))).toSeq
        out shouldBe expected
      }
    }
  }

  test("ivfSearchTopK with a full-cell probe equals brute force exactly") {
    // When nprobe covers every cell, the candidate set is the whole
    // corpus (any spill) and the approximate serve path must reproduce
    // bruteForceTopK row for row — the exactness anchor under which the
    // x106-measured narrower probes trade recall for cost.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .filter(col("vec_id") < 60)
    val cents = Similarity.kmeansCentroids(
      emb, emb.filter(col("vec_id") < 5), iters = 2, dim = 64)
      .select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val nCells = cents.count().toInt
    val assigned = Similarity.ivfProbe(emb, cents, 64, nprobe = 2)
    val q = emb.filter(col("vec_id") < 4)
    val approx = Similarity.ivfSearchTopK(assigned, q, cents, k = 5, dim = 64, nprobe = nCells)
      .select("qid", "vec_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val brute = Similarity.bruteForceTopK(emb, q, k = 5, dim = 64)
      .select("qid", "vec_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    approx shouldBe brute
    // narrower probe: a strict candidate subset, never a superset
    val narrow = Similarity.ivfCandidates(assigned, q, cents, 64, nprobe = 1)
    val full = Similarity.ivfCandidates(assigned, q, cents, 64, nprobe = nCells)
    narrow.count() should be < full.count()
    full.count() shouldBe q.count() * (emb.count() - 1)
  }

  test("pqSearchTopK: rerankR covering the candidate set is row-identical to the exact IVF serve") {
    // The x112 identity as the serve API's contract: the PQ pass only
    // REORDERS candidates before the cut at rerankR, so once R covers
    // every candidate the exact re-rank sees exactly the ivfCandidates
    // set and the composed serve must equal ivfSearchTopK row for row —
    // same schema, same scores, same ranks. Below that R the shortlist
    // is a candidate subset and output stays rank-limited at k.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .filter(col("vec_id") < 60)
    val cents = Similarity.kmeansCentroids(
      emb, emb.filter(col("vec_id") < 6), iters = 2, dim = 64)
      .select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val cb = Similarity.pqCodebooks(
      emb.select(col("vec_id"), col("v").cast("array<double>").as("v")),
      m = 4, subDim = 16, k = 8, iters = 1)
    val lists = Similarity.pqLists(emb, cents, cb, dim = 64, subDim = 16, spill = 2)
    val assigned = Similarity.ivfProbe(emb, cents, 64, nprobe = 2)
    val q = emb.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "cos", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted
    // R = corpus size >= any per-query candidate count
    val composed = rows(Similarity.pqSearchTopK(
      lists, emb, q, cents, k = 5, rerankR = 60, dim = 64, nprobe = 3))
    val exact = rows(Similarity.ivfSearchTopK(assigned, q, cents, k = 5, dim = 64, nprobe = 3))
    composed shouldBe exact
    // narrow R: output still rank-limited at k, ranks dense from 1, and
    // every returned id is an IVF candidate of the same probe
    val narrow = Similarity.pqSearchTopK(
      lists, emb, q, cents, k = 5, rerankR = 8, dim = 64, nprobe = 3)
    val byQ = narrow.select("qid", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byQ.values.foreach { rs => rs.map(_._2).sorted shouldBe (1L to rs.length.toLong).toArray }
    val candIds = Similarity.ivfCandidates(assigned, q, cents, 64, nprobe = 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    narrow.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).foreach(p => candIds should contain(p))
    an[IllegalArgumentException] should be thrownBy Similarity.pqSearchTopK(
      lists, emb, q, cents, k = 5, rerankR = 4, dim = 64, nprobe = 3)
  }

  test("pqListsCodes + pqSearchTopKCodes: the compressed layout serves row-identically to the reconstruction serve") {
    // The r19-verdict layout gap closed: lists carry m CODES (the
    // deployable ~32x-smaller index), candidates score by LUT/ADC sums
    // against the broadcast codebook — and at the shared 6-decimal
    // rounding the served rows must be IDENTICAL to the
    // reconstruction-based serve at every R, because the ADC sum and the
    // reconstruction fold differ only by float reassociation (~1e-16,
    // far below the rounding quantum).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .filter(col("vec_id") < 60)
    val cents = Similarity.kmeansCentroids(
      emb, emb.filter(col("vec_id") < 6), iters = 2, dim = 64)
      .select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val cb = Similarity.pqCodebooks(
      emb.select(col("vec_id"), col("v").cast("array<double>").as("v")),
      m = 4, subDim = 16, k = 8, iters = 1)
    val listsRecon = Similarity.pqLists(emb, cents, cb, dim = 64, subDim = 16, spill = 2)
    val listsCodes = Similarity.pqListsCodes(emb, cents, cb, dim = 64, subDim = 16, spill = 2)
    // layout shape: same (id, cell) membership as the reconstruction
    // lists; each entry is m codes in [0, codebookK)
    val memRecon = listsRecon.select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val memCodes = listsCodes.select("vec_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    memCodes shouldBe memRecon
    listsCodes.select("codes").collect().foreach { r =>
      val cs = r.getSeq[Short](0)
      cs.length shouldBe 4
      cs.foreach(c => c should (be >= 0.toShort and be < 8.toShort))
    }
    val q = emb.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "cos", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted
    // same rounding, same rows — at full-cover R AND at a narrow R
    // (where the ADC shortlist itself decides the output)
    for (r <- Seq(60, 8)) {
      rows(Similarity.pqSearchTopKCodes(
        listsCodes, emb, q, cents, cb,
        k = 5, rerankR = r, dim = 64, subDim = 16, codebookK = 8, nprobe = 3)) shouldBe
        rows(Similarity.pqSearchTopK(
          listsRecon, emb, q, cents, k = 5, rerankR = r, dim = 64, nprobe = 3))
    }
    // the x112 identity through the codes path: full-cover R equals the
    // exact IVF serve over the same assignment
    val assigned = Similarity.ivfProbe(emb, cents, 64, nprobe = 2)
    rows(Similarity.pqSearchTopKCodes(
      listsCodes, emb, q, cents, cb,
      k = 5, rerankR = 60, dim = 64, subDim = 16, codebookK = 8, nprobe = 3)) shouldBe
      rows(Similarity.ivfSearchTopK(assigned, q, cents, k = 5, dim = 64, nprobe = 3))
    an[IllegalArgumentException] should be thrownBy Similarity.pqSearchTopKCodes(
      listsCodes, emb, q, cents, cb, k = 5, rerankR = 4, dim = 64, subDim = 16,
      codebookK = 8, nprobe = 3)
  }

  test("sqrtCells and suggestIvf encode the measured profile") {
    Similarity.sqrtCells(1L) shouldBe 1
    Similarity.sqrtCells(500L) shouldBe 23
    Similarity.sqrtCells(2000L) shouldBe 45
    Similarity.sqrtCells(1000000L) shouldBe 1000
    an[IllegalArgumentException] should be thrownBy Similarity.sqrtCells(0L)
    // nprobe climbs with the recall target along the measured sweep rows;
    // spill-2 is unconditional (dominates single assignment everywhere)
    Similarity.suggestIvf(2000L, 0.85) shouldBe ((45, 2, 1))
    Similarity.suggestIvf(2000L, 0.88) shouldBe ((45, 2, 2))
    Similarity.suggestIvf(2000L) shouldBe ((45, 2, 4))
    Similarity.suggestIvf(2000L, 0.95) shouldBe ((45, 2, 8))
    Similarity.suggestIvf(2000L, 0.98) shouldBe ((45, 2, 12))
    an[IllegalArgumentException] should be thrownBy Similarity.suggestIvf(100L, 1.5)
    // training sample: full corpus until ~50 points/cell fits, then the
    // deterministic modulus grows with sqrt(N)
    Similarity.trainSampleMod(2000L, 45) shouldBe 1L
    Similarity.trainSampleMod(20000L, 142) shouldBe 2L
    Similarity.trainSampleMod(2000000L, 1415) shouldBe 28L
    an[IllegalArgumentException] should be thrownBy Similarity.trainSampleMod(0L, 16)
  }
}
