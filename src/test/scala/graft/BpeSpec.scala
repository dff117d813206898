package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x45 BPE merge training on an engineered corpus: pair counts weighted
  * by word frequency, deterministic (count desc, pair asc) tie-break,
  * and boundary-safe left-to-right merge application.
  */
class BpeSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("x45 picks the engineered merges in order, with the lexicographic tie-break") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-fixture").toString
    // word counts: aaab x3, cc x1 ->
    //  round 1: "a a" (count 2 per aaab x3 = 6) beats "a b"(3), "c c"(1)
    //  round 2: "aa a" and "a b" tie at 3 -> pair asc picks "a b"
    //  round 3: "aa ab"(3) beats "c c"(1)
    Seq((1L, "aaab aaab cc"), (2L, "aaab"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x45_bpe_merges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1L, "a a", 6L), (2L, "a b", 3L), (3L, "aa ab", 3L))
  }

  test("x46 applies the trained merges: aaab collapses to one token, cc stays two") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-apply-fixture").toString
    // same corpus as the training test, so the merges are
    //   "a a" -> "aa", "a b" -> "ab", "aa ab" -> "aaab":
    // "aaab" segments to ONE token; "cc" (no c-merge trained) stays "c c"
    Seq((1L, "aaab aaab cc"), (2L, "aaab"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = SparkEntry.queries("x46_bpe_segment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Seq((1L, 3L, 4L), (2L, 1L, 1L))
    run() shouldBe expected
    // second run serves the persisted vocabulary (train-once/read-many)
    run() shouldBe expected
  }
}
