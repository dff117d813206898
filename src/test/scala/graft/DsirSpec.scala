package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x48 DSIR selection on an engineered corpus: a token exclusive to the
  * English (target) slice must pull its documents above mixed and
  * out-of-target documents in the importance ranking.
  */
class DsirSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("x48 ranks target-like docs first; weights fall with off-target mass") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-fixture").toString
    // 'alpha' appears only in the en doc (plus once in the mixed doc);
    // 'beta' never appears in target. Expected ranking: pure-alpha en
    // doc, then the mixed doc, then the pure-beta fr doc.
    Seq(
      (1L, "en", "alpha alpha alpha"),
      (2L, "fr", "beta beta beta"),
      (3L, "fr", "alpha beta"))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x48_dsir_select")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(_._1).toSeq shouldBe Seq(1L, 3L, 2L)
    out.map(_._2).toSeq shouldBe Seq(3L, 2L, 3L)
    // lr(alpha) = ln(((3+1)*(8+256)) / ((4+1)*(3+256))); lr(beta) uses
    // target count 0 — doc weights are token-count multiples of those
    val lrA = math.log((4.0 * 264.0) / (5.0 * 259.0))
    val lrB = math.log((1.0 * 264.0) / (5.0 * 259.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(0)._3 shouldBe 3 * r6(lrA) +- 1e-9
    out(1)._3 shouldBe (r6(lrA) + r6(lrB)) +- 1e-9
    out(2)._3 shouldBe 3 * r6(lrB) +- 1e-9
  }
}
