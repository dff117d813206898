package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Conf-selected lineage cutting ([[Checkpoints]]): the reliable path
  * writes RDD checkpoint files under the configured dir and produces the
  * same results as the default localCheckpoint path — the cluster-deploy
  * toggle changes durability, never values.
  */
class CheckpointsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def clusterRows(pairs: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    Dedup.duplicateClusters(pairs).select(col("id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq

  test("reliable checkpoint path: same propagation result, files under the checkpoint dir") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 12L)).toDF("id1", "id2")
    val local = clusterRows(pairs)

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    spark.conf.set(Checkpoints.ReliableKey, "true")
    spark.conf.set(Checkpoints.DirKey, dir.getPath)
    try {
      val reliable = clusterRows(pairs)
      reliable shouldBe local
      // the reliable path actually wrote checkpoint data to the dir
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(dir).nonEmpty shouldBe true
    } finally {
      spark.conf.unset(Checkpoints.ReliableKey)
      spark.conf.unset(Checkpoints.DirKey)
    }
  }

  test("reliable=true without a dir fails with the contract message") {
    // fresh context state: the shared session may already have a
    // checkpoint dir from the previous test — only assert when it does not
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoints.ReliableKey, "true")
      try {
        val err = intercept[IllegalArgumentException] {
          Checkpoints.cut(Seq(1, 2, 3).toDF("x"))
        }
        err.getMessage should include(Checkpoints.DirKey)
      } finally spark.conf.unset(Checkpoints.ReliableKey)
    }
  }
}
