package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x65 held-out perplexity filter on an engineered corpus whose
  * content-hash coins are verified in-test: the LM must train on the
  * train side only, a held-out doc of SEEN bigrams must score by the
  * interpolated model, and a held-out doc of fully UNSEEN tokens must
  * get the backoff floor (mu * 1/(T+V)) rather than silently dropping
  * (x49's inner join would lose it) — and must land below the keep
  * floor, which is the point of the filter.
  */
class LmHoldoutSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def coin(t: String): Long =
    graft.functions.TextExprCode.polyHash(UTF8String.fromString("lmsplit#" + t)) % 10

  test("x65: trains on the 80% coin side, floors unseen held-out bigrams") {
    // roles depend on the hash coin — pin them so a tokenizer/hash edit
    // that silently reshuffles the split fails HERE, not in the oracle
    coin("a b a b") shouldBe 7 // train
    coin("a a") shouldBe 2     // train
    coin("b a b") shouldBe 8   // held, all bigrams seen in train
    coin("x y") shouldBe 9     // held, nothing seen in train

    val dir = java.nio.file.Files.createTempDirectory("lmholdout-fixture").toString
    Seq((1L, "a b a b"), (2L, "a a"), (3L, "b a b"), (4L, "x y"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // TRAIN stats only: unigrams a=4, b=2 (T=6, V=2);
    // bigrams (a,b)=2, (b,a)=1, (a,a)=1
    val lam = 0.9
    val mu = 1.0 - lam
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpBA = q6(math.log(lam * (1.0 / 2.0) + mu * ((4.0 + 1.0) / 8.0)))
    val lpAB = q6(math.log(lam * (2.0 / 4.0) + mu * ((2.0 + 1.0) / 8.0)))
    val lpXY = q6(math.log(mu * ((0.0 + 1.0) / 8.0))) // pure backoff floor

    val out = SparkEntry.queries("x65_lm_holdout_filter")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    out.toSeq shouldBe Seq(
      (3L, 2L, (lpBA + lpAB) / 2.0, 1), // well-modeled -> kept
      (4L, 1L, lpXY, 0))                // out-of-domain -> cut
  }
}
