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

  test("x100 byte scrub: re-sweeps clean AND non-span bytes are byte-identical") {
    val scrubbed = ExtensionQueries
      .queries("x100_byte_scrub")(spark, dir).cache()
    val rows = scrubbed.collect()
    rows.length should be > 5
    all(rows.map(_.getAs[Long]("tokens_removed"))) should be > 0L
    all(rows.map(_.getAs[Long]("chars_removed"))) should be > 0L
    // re-sweep: the byte-original scrubbed docs against the SAME
    // benchmark, same knobs — zero spans (tokenization lowercases, so
    // preserved casing can't hide a leaked passage)
    val (_, bench) = ExtensionQueries.decontFrames(spark, dir)
    val respans = ops.Dedup.fingerprintSpans(
      scrubbed.select(col("doc_id"), col("clean_text").as("text")),
      bench.select(col("doc_id"), col("text")),
      "doc_id", "text", n = 5, w = 4, mergeGap = 11, minFp = 2L, dfCap = 64L)
    respans.count() shouldBe 0L
    // byte identity: clean_text equals the ORIGINAL text with exactly
    // [char_start .. char_end + following-whitespace-run] cut per span
    // (the documented seam rule), independently reconstructed here from
    // x101's char offsets with plain string code
    val offs = ExtensionQueries.queries("x101_span_offsets")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        (r.getAs[Long]("char_start").toInt, r.getAs[Long]("char_end").toInt))
        .sortBy(_._1)).toMap
    val (train, _) = ExtensionQueries.decontFrames(spark, dir)
    val originals = train.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.length shouldBe offs.size
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = originals(id)
      val expected = offs(id).reverse.foldLeft(text) { case (acc, (cs, ce)) =>
        var cut = ce + 1
        while (cut < acc.length && " \t\n\r\f\u000B".indexOf(acc.charAt(cut)) >= 0)
          cut += 1
        acc.substring(0, cs) + acc.substring(cut)
      }
      withClue(s"doc $id: ") {
        r.getAs[String]("clean_text") shouldBe expected
      }
      // and every span's bytes really were in the original where x101
      // says (substr proven by the oracle too; this is the Scala-side
      // anchor)
      offs(id).foreach { case (cs, ce) =>
        ce should be < text.length
        text.charAt(cs) should not be ' '
      }
    }
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
