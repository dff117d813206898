package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The 100 TB co-location story for repeated equi-joins: both sides
  * bucketed (and sorted) on the join key at write time means the join
  * plans with NO shuffle exchange on either side — the layout move that
  * turns an every-query shuffle of the fact table into a one-time write
  * cost. Complements PartitionedLayoutSpec (pruning) with the join side
  * of physical design.
  */
class BucketedLayoutSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("bucketed tables co-locate: equi-join and downstream agg plan no shuffle") {
    val root = Files.createTempDirectory("graft-bucketed").toString
    val facts = (0 until 50000).map(i => (i.toLong % 1000, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0 until 1000).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    facts.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$root/facts").saveAsTable("graft_bt_facts")
    dims.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$root/dims").saveAsTable("graft_bt_dims")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val joined = spark.table("graft_bt_facts").join(spark.table("graft_bt_dims"), "k")
      joined.count() shouldBe 50000L
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange" // neither side shuffles: bucket layout IS the partitioning
      plan should not include "ShuffleQueryStage"
      // The bucket partitioning also feeds the downstream aggregate shuffle-free.
      val agg = spark.table("graft_bt_facts").groupBy("k").count()
      agg.count() shouldBe 1000L
      val aggPlan = agg.queryExecution.executedPlan.toString
      aggPlan should not include "Exchange"
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_bt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bt_dims")
    }
  }
}
