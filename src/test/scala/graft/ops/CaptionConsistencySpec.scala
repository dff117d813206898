package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Caption↔media consistency scoring (Multimodal.captionConsistency):
  * planted swapped captions must be flagged, intact pairs must score a
  * perfect paired cosine and stay consistent, and the plan must be the
  * LSH-bucketed equi-join family — never all-pairs. No DuckDB oracle is
  * possible (the driver fixtures ship no media table; SURVEY records
  * this), so this spec IS the contract.
  */
class CaptionConsistencySpec extends AnyFunSuite with Matchers with SparkTest {

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
    .cache()

  private lazy val media = Multimodal.packFromDocuments(
    docs.select(col("doc_id"), col("text")))

  /** Captions = each doc's own text, except every 10th (doc_id % 10 == 0,
    * with a successor present) SWAPS captions with doc_id + 1 — the
    * mislabel plant, in both directions.
    */
  private lazy val captions = {
    import spark.implicits._
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    byId.keys.toSeq.sorted.map { id =>
      val partner =
        if (id % 10 == 0 && byId.contains(id + 1)) id + 1
        else if (id % 10 == 1 && byId.contains(id - 1)) id - 1
        else id
      (id, id, byId(partner))
    }.toDF("caption_id", "media_id", "caption")
  }

  private lazy val scored =
    Multimodal.captionConsistency(media, captions).cache()

  private lazy val swappedIds: Set[Long] = {
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    ids.filter(id =>
      (id % 10 == 0 && ids.contains(id + 1)) || (id % 10 == 1 && ids.contains(id - 1)))
  }

  test("intact pairs score a perfect paired cosine and stay consistent") {
    val rows = scored.collect().map(r =>
      (r.getAs[Long]("caption_id"), r.getAs[Double]("cos_pair"),
        r.getAs[Double]("best_cos"), r.getAs[Int]("consistent")))
    rows.length shouldBe docs.count()
    val intact = rows.filterNot(r => swappedIds.contains(r._1))
    intact should not be empty
    // caption text == payload text: identical bytes through the identical
    // stub kernel -> identical features -> cosine exactly 1
    intact.foreach { case (id, cp, _, cons) =>
      withClue(s"caption $id: ") { cp shouldBe 1.0; cons shouldBe 1 }
    }
  }

  test("planted swapped captions are flagged: retrieval beats the pairing") {
    val byId = scored.collect()
      .map(r => r.getAs[Long]("caption_id") ->
        ((r.getAs[Double]("cos_pair"), r.getAs[Double]("best_cos"), r.getAs[Int]("consistent"))))
      .toMap
    swappedIds should not be empty
    swappedIds.foreach { id =>
      val (cp, bc, cons) = byId(id)
      withClue(s"swapped caption $id: ") {
        // its true media (the swap partner's payload) matches its features
        // exactly, shares every LSH bucket, and out-scores the mislabeled
        // pairing — the review flag fires
        bc shouldBe 1.0
        cp should be < 1.0
        cons shouldBe 0
      }
    }
  }

  test("plan: payloads stay map-side; candidates come from equi-joins, never all-pairs") {
    val df = Multimodal.captionConsistency(media, captions)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // both the paired score (media_id) and retrieval (bucket) joins are
    // hash-family equi-joins
    p should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[media_id"""
    p should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[bucket"""
    // no payload or caption text column crosses a join
    p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin"))
      .foreach { l => l should not include "payload"; l should not include "caption#" }
  }
}
