package graft.io

import java.nio.file.Files

import graft.{SparkTest, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Columnar-format interchange beyond parquet: the engine's frames round-
  * trip through ORC (schema, values, and pushdown) so a deployment whose
  * lake standardizes on ORC can run the same operators unchanged.
  */
class FormatsSpec extends AnyFunSuite with Matchers with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves schema and values; filters push into the ORC scan") {
    val src = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate"))
    val out = Files.createTempDirectory("graft-orc").toString + "/li"
    src.write.mode("overwrite").orc(out)

    val back = spark.read.orc(out)
    back.schema shouldBe src.schema
    back.count() shouldBe src.count()
    // value fidelity: decimal-exact aggregate equality on both paths
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("string"),
        sum(col("l_orderkey")).cast("string")).head()
    agg(back) shouldBe agg(src)
    // pushdown: the range predicate must reach the ORC scan
    val plan = back.filter(col("l_partkey") >= 100)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThanOrEqual(l_partkey,100)")
  }
}
