package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Train-once / read-many contract of the [[AnnModels]] store: the first
  * call trains and persists; later calls serve the persisted table without
  * retraining; a changed dataset fingerprint forces a fresh train.
  */
class AnnModelsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private val dim = 8

  private def writeCorpus(dir: java.io.File, seed: Int, n: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    rows.toDF("vec_id", "embedding")
      .coalesce(1)
      .write.mode("overwrite").parquet(new java.io.File(dir, "embeddings.parquet").getPath)
  }

  private def modelFiles(root: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(root).map(f => f.getPath -> f.lastModified()).toMap
  }

  test("ivfCentroids trains once, serves the persisted model, and equals a direct retrain") {
    // The store root is the process-wide GRAFT_MODEL_DIR (default
    // /tmp/graft_models); the temp data dir gives this test a unique
    // fingerprint, so its store entry cannot collide with another run's.
    val dataDir = java.nio.file.Files.createTempDirectory("annmodels-data").toFile
    writeCorpus(dataDir, seed = 7, n = 40)
    val corpus = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))

    val served = AnnModels.ivfCentroids(spark, dataDir.getPath, corpus, k = 4, iters = 2, dim = dim)
    val direct = Similarity.kmeansCentroids(corpus, corpus.filter(col("vec_id") < 4), 2, dim)
    val s1 = served.select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val d1 = direct.select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    s1 shouldBe d1

    // Second call must serve, not retrain: the persisted files are untouched.
    val fp = AnnModels.fingerprint(spark, dataDir.getPath, "embeddings")
    val store = new java.io.File(AnnModels.modelRoot, fp)
    store.isDirectory shouldBe true
    val before = modelFiles(store)
    before should not be empty
    val again = AnnModels.ivfCentroids(spark, dataDir.getPath, corpus, k = 4, iters = 2, dim = dim)
      .select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    again shouldBe s1
    modelFiles(store) shouldBe before
  }

  test("a regenerated dataset changes the fingerprint and forces a fresh train") {
    val dataDir = java.nio.file.Files.createTempDirectory("annmodels-data2").toFile
    writeCorpus(dataDir, seed = 1, n = 30)
    val fp1 = AnnModels.fingerprint(spark, dataDir.getPath, "embeddings")
    // Different content -> different part-file length and/or mtime.
    Thread.sleep(5)
    writeCorpus(dataDir, seed = 2, n = 31)
    val fp2 = AnnModels.fingerprint(spark, dataDir.getPath, "embeddings")
    fp2 should not be fp1

    val corpus2 = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))
    val served = AnnModels.ivfCentroids(spark, dataDir.getPath, corpus2, k = 4, iters = 1, dim = dim)
    val direct = Similarity.kmeansCentroids(corpus2, corpus2.filter(col("vec_id") < 4), 1, dim)
    served.select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1) shouldBe
      direct.select(col("cell_id"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
  }

  test("a crashed half-commit (model dir without _SUCCESS) self-repairs on the next call") {
    val dataDir = java.nio.file.Files.createTempDirectory("annmodels-data4").toFile
    writeCorpus(dataDir, seed = 11, n = 20)
    val corpus = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))

    // Plant the crash state: the served path exists, holds junk, has no
    // _SUCCESS. Hadoop rename(tmp, path) against this EXISTING dir nests
    // tmp inside it and returns true — the post-condition loop must detect
    // the husk, delete it, and retry into a clean commit (round-5 advice).
    val fp = AnnModels.fingerprint(spark, dataDir.getPath, "embeddings")
    val name = s"ivf_k3_i1_c${AnnModels.corpusDescriptor(corpus)}"
    val husk = new java.io.File(new java.io.File(AnnModels.modelRoot, fp), name)
    husk.mkdirs()
    val junk = new java.io.File(husk, "part-00000-stale.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    new java.io.File(husk, "_SUCCESS").exists() shouldBe false

    val served = AnnModels.ivfCentroids(spark, dataDir.getPath, corpus, k = 3, iters = 1, dim = dim)
    val direct = Similarity.kmeansCentroids(corpus, corpus.filter(col("vec_id") < 3), 1, dim)
    served.select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1) shouldBe
      direct.select(col("cell_id"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    // the husk was replaced by a complete commit: _SUCCESS present, no
    // junk file, no nested .tmp dir planted inside the served model
    new java.io.File(husk, "_SUCCESS").exists() shouldBe true
    junk.exists() shouldBe false
    Option(husk.listFiles()).toSeq.flatten.count(_.getName.contains("_tmp_")) shouldBe 0
  }

  test("a filtered corpus with the same hyperparameters gets its own model entry") {
    val dataDir = java.nio.file.Files.createTempDirectory("annmodels-data5").toFile
    writeCorpus(dataDir, seed = 13, n = 30)
    val corpus = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))
    val filtered = corpus.filter(col("vec_id") % 2 === 0)
    AnnModels.corpusDescriptor(filtered) should not be AnnModels.corpusDescriptor(corpus)
    // identical plans share a descriptor (x13/x25/x47 share one artifact)
    val corpusAgain = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))
    AnnModels.corpusDescriptor(corpusAgain) shouldBe AnnModels.corpusDescriptor(corpus)

    // the filtered model trains on the filtered rows, not the full table's
    val servedF = AnnModels.ivfCentroids(spark, dataDir.getPath, filtered, k = 3, iters = 1, dim = dim)
    val directF = Similarity.kmeansCentroids(filtered, filtered.filter(col("vec_id") < 3), 1, dim)
    servedF.select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1) shouldBe
      directF.select(col("cell_id"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
  }

  test("corpusDescriptor: cut frames content-hash once per session; distinct cut contents stay distinct") {
    // r19 gave lineage-cut corpora a content-hashed descriptor (one scan
    // per model-name construction); r20 memoizes that scan per (plan,
    // leaf RDD) — rebuildDue builds three names per consult, and a cut
    // frame's blocks are immutable, so the second construction must be
    // a map hit: same descriptor, ZERO Spark jobs.
    val a = Checkpoints.cut(Seq((1L, "x"), (2L, "y")).toDF("vec_id", "v"))
    val b = Checkpoints.cut(Seq((1L, "x"), (3L, "z")).toDF("vec_id", "v"))
    val da = AnnModels.corpusDescriptor(a)
    val db = AnnModels.corpusDescriptor(b)
    da should not be db // same schema, different rows -> different artifacts
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      AnnModels.corpusDescriptor(a) shouldBe da
      AnnModels.corpusDescriptor(b) shouldBe db
      // listener events are posted asynchronously; give the bus a beat
      // (a posted JobStart lands well within this on an idle scheduler)
      Thread.sleep(500)
      jobs shouldBe 0
    } finally spark.sparkContext.removeSparkListener(listener)
    // a DERIVED frame over the same cut leaf selects different rows and
    // must NOT reuse the memoized content hash
    AnnModels.corpusDescriptor(a.filter(col("vec_id") === 1L)) should not be da
  }

  test("feasibility gate: isotropic corpus refuses a strict build, clustered corpus passes") {
    val d64 = 64
    def writeVecs(dir: java.io.File, rows: Seq[(Long, Seq[Double])]): Unit =
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(new java.io.File(dir, "embeddings.parquet").getPath)
    def load(dir: java.io.File) =
      spark.read.parquet(new java.io.File(dir, "embeddings.parquet").getPath)
        .select(col("vec_id"), col("embedding").as("v"))

    // isotropic: uniform random directions — nearest "neighbours" sit on
    // the random-match line, the regime where an IVF index cannot be
    // sublinear at production recall
    val isoDir = java.nio.file.Files.createTempDirectory("feas-iso").toFile
    val rnd = new scala.util.Random(11)
    writeVecs(isoDir, (0 until 120).map(i =>
      (i.toLong, Seq.fill(d64)(rnd.nextDouble() * 2 - 1))))
    val iso = load(isoDir)
    val feasIso = AnnModels.indexFeasibility(spark, isoDir.getPath, iso, d64)
    feasIso.indexable shouldBe false
    feasIso.medianTop1 should be < feasIso.isoBaseline + Similarity.FeasibilityExcess
    // uniform-isotropic: the tail verdict agrees, and both regimes
    // budget at the isotropic floor
    feasIso.tailIndexable shouldBe false
    feasIso.p10Top1 should be <= feasIso.medianTop1
    Similarity.regimeFloors(4, feasIso.indexable, feasIso.tailIndexable) shouldBe
      ((Similarity.isotropicRecallFloor(4), Similarity.isotropicRecallFloor(4)))
    an[IllegalArgumentException] should be thrownBy
      AnnModels.ivfCentroidsGated(spark, isoDir.getPath, iso, k = 8, iters = 1, dim = d64,
        requireIndexable = true)
    // the default build proceeds but carries the verdict as metadata
    val (model, feas2) = AnnModels.ivfCentroidsGated(
      spark, isoDir.getPath, iso, k = 8, iters = 1, dim = d64)
    feas2 shouldBe feasIso // served from the persisted measurement, not remeasured
    model.count() should be > 0L

    // clustered: 8 orthogonal centers + bounded noise — median top-1
    // cosine sits far above the line, the regime an index exists for
    val cluDir = java.nio.file.Files.createTempDirectory("feas-clu").toFile
    val rnd2 = new scala.util.Random(13)
    writeVecs(cluDir, (0 until 120).map { i =>
      val c = i % 8
      val noise = Seq.fill(d64)(rnd2.nextDouble() * 2 - 1)
      val nn = math.sqrt(noise.map(x => x * x).sum)
      val raw = noise.zipWithIndex.map { case (x, d) =>
        (if (d == c) 1.0 else 0.0) + 0.3 * x / nn }
      val vn = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / vn))
    })
    val clu = load(cluDir)
    val (modelC, feasClu) = AnnModels.ivfCentroidsGated(
      spark, cluDir.getPath, clu, k = 8, iters = 1, dim = d64,
      requireIndexable = true)
    feasClu.indexable shouldBe true
    feasClu.medianTop1 should be >= feasClu.isoBaseline + Similarity.FeasibilityExcess
    // uniform-clustered: tail agrees, both regimes at the clustered anchor
    feasClu.tailIndexable shouldBe true
    Similarity.regimeFloors(4, feasClu.indexable, feasClu.tailIndexable) shouldBe
      ((Similarity.ClusteredRecallFloor, Similarity.ClusteredRecallFloor))
    modelC.count() should be > 0L

    // MIXED (the r19 gray-zone regime): a 25% pure-noise minority inside
    // the clustered majority — the median clears the line (majority
    // vote), the p10 rank lands in the noise population and does NOT.
    // This is exactly the asymmetry the one-bit verdict could not carry;
    // the floors API budgets the minority at the other regime's line.
    val mixDir = java.nio.file.Files.createTempDirectory("feas-mix").toFile
    val rnd3 = new scala.util.Random(17)
    writeVecs(mixDir, (0 until 120).map { i =>
      val noise = Seq.fill(d64)(rnd3.nextDouble() * 2 - 1)
      if (i % 4 == 0) (i.toLong, noise)
      else {
        val c = i % 8
        val nn = math.sqrt(noise.map(x => x * x).sum)
        val raw = noise.zipWithIndex.map { case (x, d) =>
          (if (d == c) 1.0 else 0.0) + 0.3 * x / nn }
        val vn = math.sqrt(raw.map(x => x * x).sum)
        (i.toLong, raw.map(_ / vn))
      }
    })
    val feasMix = AnnModels.indexFeasibility(spark, mixDir.getPath, load(mixDir), d64)
    feasMix.indexable shouldBe true
    feasMix.tailIndexable shouldBe false
    feasMix.p10Top1 should be < feasMix.medianTop1
    Similarity.regimeFloors(4, feasMix.indexable, feasMix.tailIndexable) shouldBe
      ((Similarity.ClusteredRecallFloor, Similarity.isotropicRecallFloor(4)))
    val (cells9, spill9, np9, maj9, min9) =
      Similarity.suggestIvfWithFloors(2000L, 0.9, feasMix.indexable, feasMix.tailIndexable)
    (cells9, spill9, np9) shouldBe Similarity.suggestIvf(2000L, 0.9)
    maj9 shouldBe Similarity.ClusteredRecallFloor
    min9 shouldBe Similarity.isotropicRecallFloor(np9)
  }

  test("rebuildDue fires on shifted arrivals, stays quiet on stationary; maintained build serves accordingly") {
    // The x114 measurement as the decision (r18 verdict #1): base-era
    // index, arrivals spill-assigned in. Stationary arrivals (same
    // clusters) keep recall at the ceiling -> verdict quiet, the maintained
    // build KEEPS serving the stale model. Shifted arrivals (clusters the
    // stale centroids never saw) lose recall on the arrival sample ->
    // verdict fires, the maintained build trains and serves the fresh
    // full-corpus model. Probe-measured at this geometry (RebuildProbe,
    // N=600/k=10/nprobe=4): stationary recall 1.000, shifted 0.834 vs the
    // 0.9 floor — wide margins on both sides of the pin.
    val d64 = 64
    val cells = Similarity.sqrtCells(600L)
    def fixture(shift: Boolean): (String, org.apache.spark.sql.DataFrame) = {
      val dir = java.nio.file.Files.createTempDirectory(
        s"rebuild-${if (shift) "shift" else "stat"}").toFile
      graft.tools.ClusterGen.frame(spark, 600L, d64, 10, 0.7, shiftArrivals = shift)
        .coalesce(2).write.mode("overwrite")
        .parquet(new java.io.File(dir, "embeddings.parquet").getPath)
      (dir.getPath,
        spark.read.parquet(new java.io.File(dir, "embeddings.parquet").getPath)
          .select(col("vec_id"), col("embedding").as("v")))
    }
    def modelRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cell_id"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

    // stationary: quiet, base model keeps serving
    val (statDir, stat) = fixture(shift = false)
    val statBase = stat.filter(pmod(col("vec_id"), lit(5L)) =!= 0)
    val statArr = stat.filter(pmod(col("vec_id"), lit(5L)) === 0)
    val (statModel, statV) = AnnModels.ivfCentroidsMaintained(
      spark, statDir, stat, statBase, statArr, cells, 2, d64, nprobe = 4, spill = 2)
    statV.rebuildDue shouldBe false
    statV.nArrivals shouldBe 120L
    statV.recallArrivals should be >= statV.recallFloor
    statV.candFraction should be <= statV.candFractionMax
    modelRows(statModel) shouldBe modelRows(
      AnnModels.ivfCentroids(spark, statDir, statBase, cells, 2, d64))
    // the OR's cost arm: an absurdly tight candidate cap fires the trigger
    // even at perfect recall
    AnnModels.rebuildDue(spark, statDir, stat, statArr,
      AnnModels.ivfCentroids(spark, statDir, statBase, cells, 2, d64),
      d64, nprobe = 4, spill = 2, candFractionMax = 1e-4).rebuildDue shouldBe true
    // no arrivals = nothing stale: quiet by construction
    AnnModels.rebuildDue(spark, statDir, stat, statArr.filter(lit(false)),
      AnnModels.ivfCentroids(spark, statDir, statBase, cells, 2, d64),
      d64, nprobe = 4, spill = 2).rebuildDue shouldBe false

    // shifted: fires, the fresh full-corpus model is served
    val (shiftDir, shifted) = fixture(shift = true)
    val shiftBase = shifted.filter(pmod(col("vec_id"), lit(5L)) =!= 0)
    val shiftArr = shifted.filter(pmod(col("vec_id"), lit(5L)) === 0)
    val (shiftModel, shiftV) = AnnModels.ivfCentroidsMaintained(
      spark, shiftDir, shifted, shiftBase, shiftArr, cells, 2, d64, nprobe = 4, spill = 2)
    shiftV.rebuildDue shouldBe true
    shiftV.recallArrivals should be < shiftV.recallFloor
    val freshRows = modelRows(AnnModels.ivfCentroids(spark, shiftDir, shifted, cells, 2, d64))
    modelRows(shiftModel) shouldBe freshRows
    modelRows(shiftModel) should not be modelRows(
      AnnModels.ivfCentroids(spark, shiftDir, shiftBase, cells, 2, d64))

    // the verdict is a persisted artifact: a second consult serves the
    // stored measurement without touching the store files
    val fp = AnnModels.fingerprint(spark, shiftDir, "embeddings")
    val store = new java.io.File(AnnModels.modelRoot, fp)
    val before = modelFiles(store)
    val again = AnnModels.rebuildDue(spark, shiftDir, shifted, shiftArr,
      AnnModels.ivfCentroids(spark, shiftDir, shiftBase, cells, 2, d64),
      d64, nprobe = 4, spill = 2)
    again shouldBe shiftV
    modelFiles(store) shouldBe before
  }

  test("pqCodebooks round-trips through the store unchanged") {
    val dataDir = java.nio.file.Files.createTempDirectory("annmodels-data3").toFile
    writeCorpus(dataDir, seed = 3, n = 24)
    val corpus = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))
    val served = AnnModels.pqCodebooks(spark, dataDir.getPath, corpus, m = 2, subDim = 4, k = 3, iters = 1)
    val direct = Similarity.pqCodebooks(corpus, 2, 4, 3, 1)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    served.select(col("subspace").cast("long"), col("cell_id"), col("cv")).collect()
      .map(r => (key(r), r.getSeq[Double](2))).sortBy(_._1) shouldBe
      direct.select(col("subspace").cast("long"), col("cell_id"), col("cv")).collect()
        .map(r => (key(r), r.getSeq[Double](2))).sortBy(_._1)
  }
}
