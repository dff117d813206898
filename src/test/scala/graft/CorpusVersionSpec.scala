package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x70 corpus release diff + x71 padding-waste report on engineered
  * fixtures where every expected row is derived independently in the
  * test (not by mirroring the query's own expressions).
  */
class CorpusVersionSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def fixture(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("corpusver-fixture").toString
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x70: statuses partition into added/removed/changed/unchanged, additions never collide") {
    // ids 1..60 cover every branch: 17|34|51 removed, 13|26|39|52 changed,
    // 19|38|57 duplicated as additions at +1e12, the rest unchanged
    val ids = (1L to 60L)
    val dir = fixture(ids.map(i => (i, s"document $i body text")))
    val out = SparkEntry.queries("x70_corpus_diff")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val off = 1000000000000L
    val expected = (ids.map { i =>
      i -> (if (i % 17 == 0) "removed"
            else if (i % 13 == 0) "changed"
            else "unchanged")
    } ++ ids.filter(_ % 19 == 0).map(i => (i + off) -> "added")).sortBy(_._1)
    out shouldBe expected

    // the addition offset must clear any real doc_id — the round-10 1e6
    // offset collided with surviving ids beyond ~1M docs
    val maxRealId = ids.max
    out.collect { case (id, "added") => id }.foreach(_ should be > maxRealId + 1000000L)
  }

  test("x71: docs land in the smallest holding power-of-two cap; padding and waste are exact") {
    // bpeTokenCount counts letter runs, single digits, single symbols:
    // "a b c" = 3. Engineered counts hit an interior bucket, both edges
    // of a boundary (16 stays, 17 promotes), and the 4096 truncation cap.
    def words(n: Int): String = Seq.fill(n)("tok").mkString(" ")
    val dir = fixture(Seq(
      (1L, words(10)),   // cap 16, tok 10
      (2L, words(16)),   // cap 16 (boundary holds), tok 16
      (3L, words(17)),   // cap 32, tok 17
      (4L, words(5000)), // cap 4096, tok truncates to 4096 -> zero padding
      (5L, words(100)))) // cap 128, tok 100

    val out = SparkEntry.queries("x71_padding_waste")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    out shouldBe Seq(
      (16L, 2L, 26L, 6L, 6.0 / 32.0),
      (32L, 1L, 17L, 15L, 15.0 / 32.0),
      (128L, 1L, 100L, 28L, 28.0 / 128.0),
      (4096L, 1L, 4096L, 0L, 0.0))
  }

  test("x67: the eval slice is a fixed COUNT, not a corpus fraction") {
    // sf0.1 has 2000 embeddings — the round-10 proportional slice
    // (vec_id % 20) would hold out 100; the fixed-count contract holds
    // out exactly KnnEvalN regardless of corpus size.
    val out = SparkEntry.queries("x67_knn_label_vote")(spark, "/root/testdata/sf0.1")
    out.count() shouldBe 25L
  }
}
