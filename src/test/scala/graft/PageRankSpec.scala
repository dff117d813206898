package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x51 PageRank on an engineered star graph (one supplier serving two
  * customers), compared against an imperative replay of the same
  * all-integer pico-rank iterations — ranks must match exactly, and the
  * hub must out-rank the leaves.
  */
class PageRankSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("x51 ranks equal the integer power-iteration replay; hub first") {
    val dir = java.nio.file.Files.createTempDirectory("pr-fixture").toString
    Seq((1L, 1L), (2L, 1L))
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // graph: supplier node 2 <-> customer nodes 3 and 5
    val edges = Seq(2L -> 3L, 2L -> 5L).flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    var r = nodes.map(v => v -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val cs = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / odeg(src) }.sum
      }
      r = nodes.map(v =>
        v -> ((15L * (1000000000000L / n)) / 100L + (85L * cs.getOrElse(v, 0L)) / 100L)).toMap
    }
    val expect = r.toSeq.sortBy { case (v, rk) => (-rk, v) }
    val out = SparkEntry.queries("x51_pagerank")(spark, dir)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
    out shouldBe expect
    out.head._1 shouldBe 2L // the supplier hub
  }
}
