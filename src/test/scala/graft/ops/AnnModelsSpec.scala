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
