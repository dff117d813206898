package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x68 (exact grid) vs x68b (IVF-served) bitext-mining agreement: the
  * measured recall evidence the ANN serve path's scale claim rests on.
  *
  * Caveat pinned here on purpose: the fixture embeddings are isotropic
  * random vectors — the WORST case for any space-partitioning index
  * (no cluster structure for cells to capture, all cross-language
  * cosines concentrate near 0). Real text embeddings cluster strongly
  * and IVF recall there is far higher; these floors are the measured
  * worst-case behavior, not the expected production recall. The recall
  * knob itself (nprobe) is what the numbers certify: at sf0.01,
  * kept-pair recall moved 52/145 -> 86/145 as nprobe went 2 -> 4.
  */
class BitextSpec extends AnyFunSuite with Matchers with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private lazy val exact = SparkEntry.queries("x68_bitext_margin")(spark, dir)
    .select(col("en_id"), col("es_id"), col("keep")).cache()
  private lazy val ann = SparkEntry.queries("x68b_bitext_ann")(spark, dir)
    .select(col("en_id"), col("es_id"), col("keep")).cache()

  test("x68b serves every English query the exact miner serves") {
    // IVF pruning narrows the CANDIDATE set per en vector but must not
    // drop en vectors: each probes >= 1 cell, and a probed cell with no
    // Spanish member is the only way a query goes unanswered.
    val exactIds = exact.select("en_id").collect().map(_.getLong(0)).toSet
    val annIds = ann.select("en_id").collect().map(_.getLong(0)).toSet
    assert(annIds == exactIds,
      s"en coverage diverged: exact ${exactIds.size}, ann ${annIds.size}")
  }

  test("x68b top-1 and kept-pair agreement with the exact miner clears the measured floor") {
    val top1Agree = exact.as("a").join(ann.as("b"), Seq("en_id"))
      .filter(col("a.es_id") === col("b.es_id")).count()
    val nEn = exact.count()
    val exactKept = exact.filter(col("keep") === 1).count()
    val bothKept = exact.filter(col("keep") === 1).as("a")
      .join(ann.filter(col("keep") === 1).as("b"), Seq("en_id", "es_id")).count()
    info(f"top-1 agreement: $top1Agree/$nEn (${top1Agree.toDouble / nEn}%.2f)")
    info(f"kept-pair recall: $bothKept/$exactKept (${bothKept.toDouble / exactKept}%.2f)")
    // Floors sit below the measured sf0.001/sf0.01 values (see Scaladoc);
    // a regression in cell assignment or probe width trips them.
    (top1Agree.toDouble / nEn) should be >= 0.4
    (bothKept.toDouble / exactKept) should be >= 0.4
  }
}
