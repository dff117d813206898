package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x49 interpolated bigram LM on an engineered two-doc corpus with
  * hand-computed probabilities (lambda * bigram MLE + (1-lambda) * add-1
  * unigram), including the decimal quantization of each log-prob before
  * the per-doc mean.
  */
class BigramLmSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("x49 scores docs by the interpolated bigram model, exactly") {
    val dir = java.nio.file.Files.createTempDirectory("bigram-fixture").toString
    Seq((1L, "a b a b"), (2L, "a a"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // unigrams: a=4, b=2 (T=6, V=2); bigrams: (a,b)=2, (b,a)=1, (a,a)=1
    val lam = 0.9
    val mu = 1.0 - lam
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpAB = q6(math.log(lam * (2.0 / 4.0) + mu * (3.0 / 8.0)))
    val lpBA = q6(math.log(lam * (1.0 / 2.0) + mu * (5.0 / 8.0)))
    val lpAA = q6(math.log(lam * (1.0 / 4.0) + mu * (5.0 / 8.0)))
    val out = SparkEntry.queries("x49_bigram_lm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.toSeq shouldBe Seq(
      (1L, 3L, (2 * lpAB + lpBA) / 3.0),
      (2L, 1L, lpAA))
  }
}
