package graft.streaming

import graft.SparkTest
import graft.ops.{Checkpoints, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ANN serving stream: the x106-certified index profile served under
  * Structured Streaming — stream answers must be row-identical to the
  * batch [[Similarity.ivfSearchTopK]] over the same queries, and replay
  * from the checkpoint must be idempotent.
  */
class AnnStreamsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private val dim = 64

  private def corpus = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").as("v"))
    .filter(col("vec_id") < 200)

  test("annServeIngest: stream == batch serve row-identically; replay idempotent") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("annserve").toString
    val c = Checkpoints.cut(corpus)
    // two micro-batches of queries: corpus members (self excluded by the
    // serve path) and ids outside the corpus range
    val batch1 = (300L to 303L)
    val batch2 = (304L to 305L)
    val qVecs = c.filter(col("vec_id") < 6)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    def qdf(ids: Seq[Long]) =
      ids.map(qid => (qid, qVecs((qid - 300L).toInt)._2))
    def serve(src: DataFrame) = AnnStreams.annServeIngest(
      src, c, "/root/testdata/sf0.001", s"$root/sink", s"$root/chk",
      k = 5, dim = dim, nprobe = 3, spill = 2, cells = 8)
    // batch 0, then STOP (AvailableNow), then a RESTART picks up batch 1
    // from the checkpointed offset — the serve path rebuilds its index
    // artifact deterministically across restarts
    val in = MemoryStream[(Long, Seq[Float])]
    in.addData(qdf(batch1))
    val q = serve(in.toDF().toDF("vec_id", "v"))
    q.processAllAvailable(); q.awaitTermination(60000)
    val in1 = MemoryStream[(Long, Seq[Float])]
    in1.addData(qdf(batch1)); in1.addData(qdf(batch2))
    val q1 = serve(in1.toDF().toDF("vec_id", "v"))
    q1.processAllAvailable(); q1.awaitTermination(60000)

    val out = spark.read.parquet(s"$root/sink")
      .select("qid", "vec_id", "cos", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted
    // batch twin: the same index profile over the same queries, built
    // through the same API
    val cents = Checkpoints.cut(Similarity.kmeansCentroids(
      c, c.filter(col("vec_id") < 8), iters = 2, dim = dim)
      .select(col("cell_id").as("vec_id"), col("cv").as("v")))
    val assigned = Similarity.ivfProbe(c, cents, dim, 2)
    val twinQ = qdf(batch1 ++ batch2).toDF("vec_id", "v")
    val twin = Similarity.ivfSearchTopK(assigned, twinQ, cents, k = 5, dim = dim, nprobe = 3)
      .select("qid", "vec_id", "cos", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted
    out shouldBe twin
    out.map(_._1).distinct.sorted shouldBe (300L to 305L).toArray
    out.foreach { case (_, _, _, rnk) => rnk should (be >= 1L and be <= 5L) }

    // replay: a fresh stream on the same checkpoint re-processes nothing
    val in2 = MemoryStream[(Long, Seq[Float])]
    in2.addData(qdf(batch1)); in2.addData(qdf(batch2))
    val q2 = serve(in2.toDF().toDF("vec_id", "v"))
    q2.processAllAvailable(); q2.awaitTermination(60000)
    spark.read.parquet(s"$root/sink").count() shouldBe out.length.toLong
  }

  test("annServeIngest PqRerank profile: stream equals the exact IVF serve when rerankR covers the candidates") {
    // The x112 identity carried into the serve stream (r18 verdict #2):
    // with rerankR >= every per-query candidate count, the composed
    // PQ-score -> exact-re-rank path must serve answers row-identical to
    // the EXACT IVF serve over the same cells/spill/probe profile — the
    // compression is free at full re-rank depth, and R is purely the
    // downward bandwidth knob.
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("annservepq").toString
    val c = Checkpoints.cut(corpus)
    val qVecs = c.filter(col("vec_id") < 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val in = MemoryStream[(Long, Seq[Float])]
    in.addData(qVecs.map { case (i, v) => (700L + i, v) }.toSeq)
    val q = AnnStreams.annServeIngest(
      in.toDF().toDF("vec_id", "v"), c, "/root/testdata/sf0.001",
      s"$root/sink", s"$root/chk", k = 5, dim = dim, nprobe = 3,
      spill = 2, cells = 8,
      profile = AnnStreams.PqRerank(m = 4, subDim = 16, codebookK = 8, rerankR = 200))
    q.processAllAvailable(); q.awaitTermination(60000)
    val out = spark.read.parquet(s"$root/sink")
      .select("qid", "vec_id", "cos", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted
    val cents = Checkpoints.cut(Similarity.kmeansCentroids(
      c, c.filter(col("vec_id") < 8), iters = 2, dim = dim)
      .select(col("cell_id").as("vec_id"), col("cv").as("v")))
    val assigned = Similarity.ivfProbe(c, cents, dim, 2)
    val twinQ = qVecs.map { case (i, v) => (700L + i, v) }.toSeq.toDF("vec_id", "v")
    val exact = Similarity.ivfSearchTopK(assigned, twinQ, cents, k = 5, dim = dim, nprobe = 3)
      .select("qid", "vec_id", "cos", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted
    out shouldBe exact
  }

  test("annServeIngest with baseCorpus: the measured rebuild verdict picks the served model") {
    // The maintenance discipline wired into the stream (r18 verdict #1):
    // on SHIFTED arrivals the persisted rebuildDue verdict fires at serve
    // start, so the stream trains-and-serves the FRESH full-corpus model —
    // its answers must equal the batch serve built from that fresh model.
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("annservemaint").toString
    val dataDir = java.nio.file.Files.createTempDirectory("annservemaint-data").toFile
    graft.tools.ClusterGen.frame(spark, 600L, dim, 10, 0.7, shiftArrivals = true)
      .coalesce(2).write.mode("overwrite")
      .parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
    val e = spark.read.parquet(new java.io.File(dataDir, "embeddings.parquet").getPath)
      .select(col("vec_id"), col("embedding").as("v"))
    val base = e.filter(pmod(col("vec_id"), lit(5L)) =!= 0)
    val arrivals = e.filter(pmod(col("vec_id"), lit(5L)) === 0)
    val qVecs = arrivals.filter(col("vec_id") < 20)
      .collect().map(r => (9000L + r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val in = MemoryStream[(Long, Seq[Float])]
    in.addData(qVecs.toSeq)
    val q = AnnStreams.annServeIngest(
      in.toDF().toDF("vec_id", "v"), e, dataDir.getPath,
      s"$root/sink", s"$root/chk", k = 5, dim = dim, nprobe = 4, spill = 2,
      baseCorpus = Some(base), arrivals = Some(arrivals))
    q.processAllAvailable(); q.awaitTermination(120000)
    val out = spark.read.parquet(s"$root/sink")
      .select("qid", "vec_id", "cos", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted
    // batch twin over the FRESH full-corpus model — the verdict-fired arm
    val cells = Similarity.sqrtCells(600L)
    val fresh = graft.ops.AnnModels.ivfCentroids(spark, dataDir.getPath, e, cells, 2, dim)
      .select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val assigned = Similarity.ivfProbe(e, fresh, dim, 2)
    val twin = Similarity.ivfSearchTopK(
      assigned, qVecs.toSeq.toDF("vec_id", "v"), fresh, k = 5, dim = dim, nprobe = 4)
      .select("qid", "vec_id", "cos", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted
    out shouldBe twin
  }

  test("annServeIngest reconsultEvery: quiet start, mid-run fire on appended shifted arrivals, fresh model afterward") {
    // The r19-verdict gap: a ProcessingTime serve never restarts, so a
    // verdict read only at start never sees arrivals drifting past the
    // floor. With reconsultEvery = 1 the maintained serve re-derives
    // rebuildDue before each later batch: batch 0 runs quiet on the
    // stationary fixture (base-era model serves), then the corpus table
    // is REPLACED by its shifted twin (the arrival rows drift to unseen
    // clusters), and batch 1's consult fires — that batch and everything
    // after serve the fresh full-corpus model's answers.
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("annreconsult").toString
    val dataDir = java.nio.file.Files.createTempDirectory("annreconsult-data").toFile
    val embPath = new java.io.File(dataDir, "embeddings.parquet").getPath
    def writeFixture(shift: Boolean): Unit = {
      graft.tools.ClusterGen.frame(spark, 600L, dim, 10, 0.7, shiftArrivals = shift)
        .coalesce(2).write.mode("overwrite").parquet(embPath)
      spark.catalog.refreshByPath(embPath)
    }
    writeFixture(shift = false)
    def readE = spark.read.parquet(embPath).select(col("vec_id"), col("embedding").as("v"))
    def eras() = (readE, readE.filter(pmod(col("vec_id"), lit(5L)) === 0))
    val cells = graft.ops.Similarity.sqrtCells(600L)

    // batch-0 twin captured BEFORE the table mutates: the base-era model
    // over the stationary corpus
    val q1 = readE.filter(col("vec_id") < 8 && pmod(col("vec_id"), lit(5L)) =!= 0)
      .collect().map(r => (8000L + r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "cos", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted
    val statBaseModel = graft.ops.AnnModels.ivfCentroids(
      spark, dataDir.getPath, readE.filter(pmod(col("vec_id"), lit(5L)) =!= 0), cells, 2, dim)
      .select(col("cell_id").as("vec_id"), col("cv").as("v"))
    val statE = Checkpoints.cut(readE)
    val twinQuiet = rows(Similarity.ivfSearchTopK(
      Similarity.ivfProbe(statE, statBaseModel, dim, 2),
      q1.toDF("vec_id", "v"), statBaseModel, k = 5, dim = dim, nprobe = 4))

    val in = MemoryStream[(Long, Seq[Float])]
    in.addData(q1)
    val (corpus0, arrivals0) = eras()
    val q = AnnStreams.annServeIngest(
      in.toDF().toDF("vec_id", "v"), corpus0, dataDir.getPath,
      s"$root/sink", s"$root/chk", k = 5, dim = dim, nprobe = 4, spill = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      baseCorpus = Some(corpus0.filter(pmod(col("vec_id"), lit(5L)) =!= 0)),
      arrivals = Some(arrivals0),
      reconsultEvery = 1,
      refreshEras = Some(() => eras()))
    try {
      q.processAllAvailable()
      rows(spark.read.parquet(s"$root/sink/batch_id=0")) shouldBe twinQuiet

      // the era moves: shifted arrivals land in the corpus table
      writeFixture(shift = true)
      val q2 = readE.filter(col("vec_id") < 20 && pmod(col("vec_id"), lit(5L)) === 0)
        .collect().map(r => (9000L + r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      in.addData(q2)
      q.processAllAvailable()

      // batch 1 was served by the FRESH full-corpus model (the consult
      // fired before serving it)
      val freshModel = graft.ops.AnnModels.ivfCentroids(
        spark, dataDir.getPath, readE, cells, 2, dim)
        .select(col("cell_id").as("vec_id"), col("cv").as("v"))
      val shiftE = Checkpoints.cut(readE)
      val twinFresh = rows(Similarity.ivfSearchTopK(
        Similarity.ivfProbe(shiftE, freshModel, dim, 2),
        q2.toDF("vec_id", "v"), freshModel, k = 5, dim = dim, nprobe = 4))
      rows(spark.read.parquet(s"$root/sink/batch_id=1")) shouldBe twinFresh
      // and it is NOT what the stale base-era model would have served
      val staleModel = graft.ops.AnnModels.ivfCentroids(
        spark, dataDir.getPath, readE.filter(pmod(col("vec_id"), lit(5L)) =!= 0), cells, 2, dim)
        .select(col("cell_id").as("vec_id"), col("cv").as("v"))
      val twinStale = rows(Similarity.ivfSearchTopK(
        Similarity.ivfProbe(shiftE, staleModel, dim, 2),
        q2.toDF("vec_id", "v"), staleModel, k = 5, dim = dim, nprobe = 4))
      twinFresh should not be twinStale
    } finally q.stop()
  }

  test("annServeIngest: full-cell probe serves exact brute-force answers") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("annserve2").toString
    val c = Checkpoints.cut(corpus)
    val qVec = c.filter(col("vec_id") === 3).collect().head.getSeq[Float](1)
    val in = MemoryStream[(Long, Seq[Float])]
    // enqueue BEFORE start: AvailableNow snapshots offsets at start, so
    // data added after can lose the race and the one-shot query
    // terminates having processed nothing
    in.addData(Seq((500L, qVec)))
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val q = AnnStreams.annServeIngest(
      in.toDF().toDF("vec_id", "v"), c, "/root/testdata/sf0.001",
      s"$root/sink", s"$root/chk", k = 4, dim = dim, nprobe = 8,
      spill = 1, cells = 8)
    q.processAllAvailable(); q.awaitTermination(60000)
    // storage hygiene: the index's cut frames (centroids + spill
    // assignment) are released once the query terminates — a session
    // starting and stopping serve streams must not accumulate
    // corpus-sized blocks (release rides a daemon thread, so poll)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while ((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).nonEmpty &&
        System.nanoTime() < deadline) Thread.sleep(100)
    (spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore) shouldBe empty
    val served = spark.read.parquet(s"$root/sink")
      .select("vec_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val brute = Similarity.bruteForceTopK(
      c, Seq((500L, qVec)).toDF("vec_id", "v"), k = 4, dim = dim)
      .select("vec_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    served shouldBe brute
  }
}
