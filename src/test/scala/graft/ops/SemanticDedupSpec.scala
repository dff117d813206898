package graft.ops

import graft.{SparkEntry, SparkTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x47 semantic dedup on an engineered corpus: one-hot base vectors (all
  * mutually orthogonal, so nothing passes tau by accident), one exact
  * clone INSIDE the base corpus (vec 7 = vec 2), plus the query's own
  * planted +100000 clones of every 5th vector. The removal rule must
  * drop exactly the higher id of each duplicate pair and report the
  * keeper.
  */
class SemanticDedupSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("x47 removes in-base and planted clones with the lower-id keeper") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup-fixture").toString
    val dim = 64
    def oneHot(i: Int): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(i) = 1.0f; a
    }
    // vec 7 duplicates vec 2; everything else is orthogonal
    val vecs = (0 until 10).map(i => (i.toLong, if (i == 7) oneHot(2) else oneHot(i)))
    vecs.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("x47_semantic_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // planted clones: 0 and 5 (vec_id % 5 == 0) -> +100000; in-base: 7 dup of 2
    out.toSeq shouldBe Seq(
      (7L, 2L, 1.0, 1L),
      (100000L, 0L, 1.0, 1L),
      (100005L, 5L, 1.0, 1L))
  }
}
