package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x50 logistic-regression trainer on an engineered corpus, compared
  * against an imperative replay of the same integer-micro-unit GD (same
  * op order, same HALF_UP sigmoid rounding) — the weights must match
  * bit for bit, and the stopword-density weight must learn positive
  * (stopword-rich docs are the English/target class).
  */
class QualityClassifierSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("x50 weights equal the imperative GD replay exactly; w2 learns positive") {
    val dir = java.nio.file.Files.createTempDirectory("lr-fixture").toString
    Seq(
      (1L, "en", "the a and of to in is"), // all stopwords, no punct
      (2L, "fr", "xyz qrs"),               // nothing target-like
      (3L, "en", "a b. c, d!"))            // 1 stopword, 3 puncts
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // micro-unit features per doc: (y, [f0m, f1m, f2m, f3m])
    val fs = Seq(
      (1L, Array(1000000L, 70000L, 875000L, 0L)),
      (0L, Array(1000000L, 20000L, 0L, 0L)),
      (1L, Array(1000000L, 40000L, 200000L, 600000L)))
    var w = Array(0.0, 0.0, 0.0, 0.0)
    val expect = (1 to 3).map { _ =>
      val g = Array.fill(4)(0L)
      for ((y, f) <- fs) {
        val z = (0 to 3).map(j => w(j) * (f(j).toDouble / 1000000.0)).sum
        val sigm = BigDecimal(1.0 / (1.0 + math.exp(-z)) * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        val rm = y * 1000000L - sigm
        for (j <- 0 to 3) g(j) += rm * f(j)
      }
      w = (0 to 3).map(j => w(j) + g(j).toDouble / 1000000000000.0 / fs.size * 0.5).toArray
      w.toSeq
    }
    val out = SparkEntry.queries("x50_quality_classifier")(spark, dir)
      .collect().map(r => (r.getLong(0), Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    out.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L)
    out.map(_._2).toSeq shouldBe expect
    out.last._2(2) should be > 0.0
  }
}
