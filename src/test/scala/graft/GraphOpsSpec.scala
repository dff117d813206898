package graft

import scala.collection.mutable

import graft.ops.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Large-star/small-star connected components (ops/GraphOps.scala):
  * exact agreement with a sequential union-find reference on random
  * graphs, the O(log n) round count on engineered high-diameter chains
  * (the case diameter-bounded label propagation cannot handle), and the
  * edge-list hygiene corners (self-loops, duplicates, empty input).
  */
class GraphOpsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  /** Sequential brute-force triangle reference: node -> (degree, triangle
    * count) over the deduplicated self-loop-free edge set.
    */
  private def triReference(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val es = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val esSet = es.toSet
    val tri = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- es; c <- adj(b) if c > b && esSet.contains((a, c))) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    adj.map { case (n, s) => n -> (s.size.toLong, tri(n)) }.toMap
  }

  private def runTri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    GraphOps.triangleCounts(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("triangles: random graph matches brute-force enumeration exactly") {
    val rnd = new scala.util.Random(11)
    val n = 60
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    runTri(edges) shouldBe triReference(edges)
  }

  test("triangles: complete K6 gives every node C(5,2) = 10") {
    val edges = for (a <- 0L until 6L; b <- (a + 1) until 6L) yield (a, b)
    val got = runTri(edges)
    got.values.toSet shouldBe Set((5L, 10L))
    got.keySet shouldBe (0L until 6L).toSet
  }

  test("triangles: a chain has none, degrees still correct") {
    val got = runTri((0L until 9L).map(i => (i, i + 1)))
    got.values.map(_._2).toSet shouldBe Set(0L)
    got(0L)._1 shouldBe 1L
    got(4L)._1 shouldBe 2L
  }

  test("triangles: the last-reducer star — hub degree n-1, zero triangles") {
    // Degree orientation points every edge AT the hub, so the hub's wedge
    // fan-out is zero — the exact case the Suri-Vassilvitskii orientation
    // exists for. A naive wedge join would emit C(99,2) hub wedges.
    val got = runTri((1L to 99L).map(i => (0L, i)))
    got(0L) shouldBe (99L, 0L)
    got(1L) shouldBe (1L, 0L)
  }

  test("triangles: duplicates, reversed duplicates and self-loops are hygiene, not data") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L), (1L, 2L))
    runTri(noisy) shouldBe triReference(base)
    runTri(noisy).values.map(_._2).toSet shouldBe Set(1L)
  }

  /** Sequential union-find reference: node -> min id of its component. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)], maxIter: Int = 25): (Map[Long, Long], Int) = {
    val (df, rounds) = GraphOps.ccWithRounds(
      edges.toDF("a", "b"), maxIter, failOnNonConvergence = true)
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("random sparse graph matches union-find exactly") {
    val rnd = new scala.util.Random(42)
    val n = 500
    val edges = Seq.fill(600)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val (got, _) = run(edges)
    got shouldBe reference(edges)
  }

  test("random dense graph (one giant component) matches union-find") {
    val rnd = new scala.util.Random(7)
    val n = 300
    val edges = Seq.fill(2000)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val (got, _) = run(edges)
    got shouldBe reference(edges)
    got.values.toSet.size shouldBe reference(edges).values.toSet.size
  }

  test("2048-node chain converges in O(log n) rounds, not O(diameter)") {
    // Node ids permuted by an odd multiplier mod a prime so the chain is
    // not already sorted (a sorted chain collapses artificially fast).
    val p = 4099L
    def relabel(i: Long): Long = (i * 1103L) % p
    val edges = (0L until 2047L).map(i => (relabel(i), relabel(i + 1)))
    val (got, rounds) = run(edges)
    val root = edges.flatMap(e => Seq(e._1, e._2)).min
    got.values.toSet shouldBe Set(root)
    // Diameter 2047: per-round min-label propagation would need ~2047
    // rounds. Star contraction: observed 12 ≈ log2(2048) + 1; assert with
    // slack but far below any diameter-proportional count.
    info(s"chain of diameter 2047 converged in $rounds rounds")
    rounds should be <= 16
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L))
    val (got, _) = run(edges)
    // 3 only ever appears in self-loops — it carries no connectivity and
    // drops out of the edge set entirely (documented: output covers the
    // endpoints of real edges).
    got shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L)
  }

  test("already-star input is detected converged in one round") {
    val edges = (2L to 20L).map(i => (1L, i))
    val (got, rounds) = run(edges)
    got.values.toSet shouldBe Set(1L)
    rounds shouldBe 1
  }

  test("empty edge list yields an empty labeling") {
    val (got, rounds) = run(Seq.empty)
    got shouldBe Map.empty
    rounds shouldBe 0
  }

  test("two components keep disjoint labels equal to each component min") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (21L, 22L), (22L, 20L))
    val (got, _) = run(edges)
    got shouldBe Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  private def runIncremental(
      prior: Seq[(Long, Long)], delta: Seq[(Long, Long)]): Map[Long, Long] = {
    val prevLabels = GraphOps.connectedComponents(prior.toDF("a", "b"))
    GraphOps.incrementalComponents(prevLabels, delta.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental: star forest + delta equals full recompute on a random graph") {
    val rnd = new scala.util.Random(23)
    val n = 400
    def rndEdges(m: Int): Seq[(Long, Long)] =
      Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
    val prior = rndEdges(500)
    val delta = rndEdges(60)
    runIncremental(prior, delta) shouldBe reference(prior ++ delta)
  }

  test("incremental: a delta bridging two prior components merges their labels") {
    val prior = Seq((10L, 11L), (20L, 21L))
    runIncremental(prior, Seq((11L, 21L))) shouldBe
      Map(10L -> 10L, 11L -> 10L, 20L -> 10L, 21L -> 10L)
  }

  test("incremental: prior singletons survive and unseen delta nodes appear") {
    // Node 5 is a prior singleton (self-labeled, no edges) — it must not
    // vanish just because the star forest carries no edge for it; 99/98
    // are brand-new delta-only nodes.
    val prevLabels = Seq((5L, 5L), (10L, 10L), (11L, 10L)).toDF("node", "component")
    val got = GraphOps.incrementalComponents(prevLabels, Seq((98L, 99L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(5L -> 5L, 10L -> 10L, 11L -> 10L, 98L -> 98L, 99L -> 98L)
  }

  test("incremental: empty delta reproduces the prior labeling (stars re-converge in ~1 round)") {
    val prior = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val full = reference(prior)
    runIncremental(prior, Seq.empty) shouldBe full
    // The star forest is already contracted — re-running costs one
    // detection round, not a replay of the original convergence.
    val stars = full.toSeq.filter { case (n, c) => n != c }
    val (_, rounds) = GraphOps.ccWithRounds(stars.toDF("a", "b"))
    rounds shouldBe 1
  }
}
