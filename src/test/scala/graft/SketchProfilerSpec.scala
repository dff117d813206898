package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x60 (KMV sketch profiler) against x55 (exact profiler) on the same
  * fixture: identical row/null bookkeeping, exact agreement below the
  * sketch size, and the Bar-Yossef ±ε estimate bound above it — the
  * machine-checked content of x55's "at 100 TB the exact distincts swap
  * for the KMV sketch family" claim.
  */
class SketchProfilerSpec extends AnyFunSuite with Matchers with SparkTest {

  private val dir = "/root/testdata/sf0.001"
  private val K = 64

  private lazy val exact: Map[(String, String), (Long, Long, Long)] =
    SparkEntry.queries("x55_table_profile")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  private lazy val sketch: Map[(String, String), (Long, Long, Double)] =
    SparkEntry.queries("x60_table_profile_sketch")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("x60 profiles exactly x55's columns with identical n_rows / n_nulls") {
    sketch.keySet shouldBe exact.keySet
    sketch.foreach { case (k, (nRows, nNulls, _)) =>
      (k, nRows, nNulls) shouldBe ((k, exact(k)._1, exact(k)._2))
    }
  }

  test("below the sketch size the KMV 'estimate' IS the exact distinct count") {
    val small = exact.filter(_._2._3 < K)
    small should not be empty // lang/source/event_type live here
    small.foreach { case (k, (_, _, nd)) =>
      // polyHash collisions could only LOWER the hash count; none occur on
      // these low-cardinality label columns
      (k, sketch(k)._3) shouldBe ((k, nd.toDouble))
    }
  }

  test("above the sketch size every estimate is within the KMV error bound of exact") {
    val big = exact.filter(_._2._3 >= K)
    big should not be empty // doc_id/text/event_id/ts live here
    big.foreach { case (k, (_, _, nd)) =>
      val est = sketch(k)._3
      // RSE ~ 1/sqrt(K-2) = 12.7%; assert 3.2 sigma — loose enough to be
      // deterministic on this fixture, tight enough that a broken
      // estimator (wrong H, off-by-one kth) fails by orders of magnitude.
      val relErr = math.abs(est / nd.toDouble - 1.0)
      withClue(s"$k exact=$nd est=$est relErr=$relErr: ") {
        relErr should be < (3.2 / math.sqrt((K - 2).toDouble))
      }
    }
  }
}
