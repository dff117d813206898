package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Bloom prefilter contract (x52): no false negatives ever, false
  * positives bounded and removed by the confirm join, partials mergeable
  * across any partitioning.
  */
class BloomSpec extends AnyFunSuite with Matchers with SparkTest {

  private val W = 1 << 10 // 64 Ki bits — small enough to provoke some FPs
  private val K = 6

  private def buildBits(keys: Seq[Long], parts: Int): Array[Long] = {
    import spark.implicits._
    keys.toDF("k").repartition(parts)
      .agg(BloomExprs.bloomAgg(col("k"), W, K))
      .head.getSeq[Long](0).toArray
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 5000L).map(i => i * 0x9e3779b97f4a7c15L + 17L)
    val bits = buildBits(keys, 7)
    keys.foreach(k => BloomExprCode.mightContain(bits, k, K) shouldBe true)
  }

  test("merge is partition-count invariant: 1-partition and 13-partition builds agree") {
    val keys = (0L until 2000L).map(i => i * 31L + 5L)
    buildBits(keys, 1).toSeq shouldBe buildBits(keys, 13).toSeq
  }

  test("false positives exist but are bounded, and nulls are ignored") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 0x9e3779b97f4a7c15L + 17L)
    val bits = buildBits(keys, 4)
    val inserted = keys.toSet
    val probes = (1L to 20000L).map(i => i * 0x2545f4914f6cdd1dL + 3L).filterNot(inserted)
    val fp = probes.count(k => BloomExprCode.mightContain(bits, k, K))
    // 5000 keys in 65536 bits with k=6 -> theoretical fp ~ 2.4%; assert an
    // order-of-magnitude bound, not the exact rate
    fp.toDouble / probes.size should be < 0.10
    // null inputs contribute nothing (same bitset with nulls interleaved)
    val withNulls = keys.map(java.lang.Long.valueOf) ++ Seq.fill(100)(null.asInstanceOf[java.lang.Long])
    val bits2 = withNulls.toDF("k").agg(BloomExprs.bloomAgg(col("k"), W, K))
      .head.getSeq[Long](0).toArray
    bits2.toSeq shouldBe bits.toSeq
  }

  test("probe expression: codegen and interpreted paths agree") {
    import spark.implicits._
    val keys = (0L until 1000L).map(i => i * 131L + 7L)
    val bits = buildBits(keys, 3)
    val probes = (0L until 4000L).toDF("k")
    val viaExpr = probes
      .withColumn("m", BloomExprs.mightContain(col("k"), bits, K))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 4000L).foreach { k =>
      viaExpr(k) shouldBe BloomExprCode.mightContain(bits, k, K)
    }
  }

  test("x52 end-to-end: bloom-pruned result equals the plain anti-join, and pruning engages") {
    val dir = "/root/testdata/sf0.001"
    val keyed = graft.Tables(spark, dir, "documents").select(
      col("doc_id"), col("n_chars"),
      TextExprs.polyHash(array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")).as("k"))
    val corpus = keyed.filter(col("doc_id") % 10 =!= 0)
    val batch = keyed.filter(col("doc_id") % 10 === 0)
    val oracle = batch.join(corpus.select(col("k")), Seq("k"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val got = graft.SparkEntry.queries("x52_bloom_membership")(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    got.toSeq shouldBe oracle.toSeq
    // pruning: with a well-sized filter the candidate set is (members + fp
    // tail), strictly smaller than the batch when genuine new docs exist
    val words = corpus.agg(BloomExprs.bloomAgg(col("k"), 1 << 16, 6))
      .head.getSeq[Long](0).toArray
    val nBatch = batch.count()
    val nCand = batch.filter(BloomExprs.mightContain(col("k"), words, 6)).count()
    nCand should be < nBatch
  }
}
