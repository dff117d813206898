package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The documented cluster conf must actually parse and apply: every key
  * is runtime-settable on a live session (no typos, no static-only keys
  * in the "paste this" block), and numeric values are numeric.
  */
class GraftConfSpec extends AnyFunSuite with Matchers with SparkTest {

  test("every cluster conf entry applies to a live session and reads back") {
    val saved = GraftConf.cluster.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      GraftConf(spark)
      GraftConf.cluster.foreach { case (k, v) =>
        spark.conf.get(k) shouldBe v
      }
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("numeric knobs are well-formed and consistent") {
    GraftConf.cluster("spark.sql.shuffle.partitions").toInt should be > 0
    GraftConf.cluster("spark.sql.files.maxPartitionBytes").toLong shouldBe (256L * 1024 * 1024)
    GraftConf.cluster("spark.sql.autoBroadcastJoinThreshold").toLong should
      be <= GraftConf.cluster("spark.sql.files.maxPartitionBytes").toLong
    // the skew threshold must stay >= the broadcast threshold: a skewed
    // partition smaller than a broadcastable table is not worth splitting
    GraftConf.cluster("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes").toLong should
      be >= GraftConf.cluster("spark.sql.autoBroadcastJoinThreshold").toLong
  }
}
