package graft.streaming

import graft.SparkTest
import graft.tools.StreamRestartProbe
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kill-and-restart exactly-once contract (the CatalogStream replay
  * pattern generalized to the stateful operators): a query killed
  * mid-run in the worst crash window — offsets written, commit marker
  * lost, so the engine must REPLAY a batch whose effects were already
  * applied — restarts from the checkpoint and produces output identical
  * to an uninterrupted twin. [[StreamRestartProbe]]'s main runs the same
  * code at soak scale (40 batches, SURVEY table); this pins the behavior
  * at CI scale with enough event-time advance that windows actually
  * close (non-vacuous file-sink output).
  */
class StreamRestartSpec extends AnyFunSuite with Matchers with SparkTest {

  test("windowedTopUsers: file-sink output after kill+replay equals the uninterrupted twin") {
    // 25 batches x 10 min of event time -> several 1 h windows pass the
    // 2 h watermark, so the append sink has real rows to disagree on
    val r = StreamRestartProbe.runTopUsers(spark, batches = 25, perBatch = 300, killAt = 12)
    r.rows should be > 0L
    r.agree shouldBe true
  }

  test("nearDupIngest: store-driven admits after kill+replay equal the uninterrupted twin") {
    val r = StreamRestartProbe.runNearDup(spark, batches = 6, perBatch = 200, killAt = 3)
    r.rows should be > 0L
    r.agree shouldBe true
  }

  test("sourceDriftMonitor: final per-source state after kill+replay equals the twin") {
    val r = StreamRestartProbe.runDrift(spark, batches = 8, perBatch = 90, killAt = 4)
    r.rows should be > 0L
    r.agree shouldBe true
  }

  test("temperatureMixMonitor: final allocation after kill+replay equals the twin") {
    val r = StreamRestartProbe.runMix(spark, batches = 8, perBatch = 120, killAt = 4)
    r.rows should be > 0L
    r.agree shouldBe true
  }

  test("domainGateMonitor: final gate table after kill+replay equals the twin (count+decimal+KMV state)") {
    val r = StreamRestartProbe.runDomainGate(spark, batches = 8, perBatch = 120, killAt = 4)
    r.rows should be > 0L
    r.agree shouldBe true
  }

  test("dupGramRateMonitor: final rates after worst-window kill+replay equal the twin") {
    val r = StreamRestartProbe.runDupGram(spark, batches = 6, perBatch = 60, killAt = 3)
    r.rows should be > 0L
    r.agree shouldBe true
  }
}
