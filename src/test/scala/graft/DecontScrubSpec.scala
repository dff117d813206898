package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x98's reason to exist, verified end to end: scrubbing removes the
  * leaked spans such that RE-SWEEPING the scrubbed corpus against the
  * same benchmark finds no contamination span — the no-lost-passage
  * theorem applied twice (any surviving shared run >= w + n - 1 tokens
  * would have fingerprinted, matched, and been cut the first time).
  */
class DecontScrubSpec extends AnyFunSuite with Matchers with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("x98 scrub closes the loop: the scrubbed corpus re-sweeps clean") {
    val scrubbed = ExtensionQueries
      .queries("x98_decontamination_scrub")(spark, dir)
      .cache()
    val rows = scrubbed.collect()
    // the loop is actually exercised: plants implicate real docs and
    // real tokens are removed
    rows.length should be > 5
    all(rows.map(_.getAs[Long]("tokens_removed"))) should be > 0L
    rows.map(_.getAs[Long]("tokens_removed")).sum should be <
      rows.map(_.getAs[Long]("n_tokens")).sum
    // re-sweep: the scrubbed docs against the SAME benchmark, same
    // knobs (n=5, w=4, gap=n+2(w-1)=11, minFp=2, dfCap=64) — zero spans
    val (_, bench) = ExtensionQueries.decontFrames(spark, dir)
    val respans = ops.Dedup.fingerprintSpans(
      scrubbed.select(col("doc_id"), col("clean_text").as("text")),
      bench.select(col("doc_id"), col("text")),
      "doc_id", "text", n = 5, w = 4, mergeGap = 11, minFp = 2L, dfCap = 64L)
    respans.count() shouldBe 0L
    scrubbed.unpersist()
  }

  test("scrubSpans enforces its non-overlap precondition") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    // overlapping intervals — the raw per-(bench,train) fingerprintSpans
    // shape a caller might pass by mistake; must fail loudly, not
    // double-count n_spans silently
    val bad = Seq((1L, 1L, 4L), (1L, 3L, 6L)).toDF("id", "s", "e")
    val ex = intercept[Exception] {
      ops.Dedup.scrubSpans(docs, bad, "doc_id", "text").collect()
    }
    // the assert_true message may sit anywhere in the cause chain
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    msgs should include("non-overlapping")
    // adjacent-but-disjoint intervals are fine
    val ok = Seq((1L, 1L, 2L), (1L, 3L, 4L)).toDF("id", "s", "e")
    val row = ops.Dedup.scrubSpans(docs, ok, "doc_id", "text").collect().head
    row.getAs[Long]("n_spans") shouldBe 2L
    row.getAs[Long]("tokens_removed") shouldBe 4L
    row.getAs[String]("clean_text") shouldBe "a f g h"
  }
}
