package graft

import org.apache.spark.sql.types.{StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Fixture-drift tripwire (Tables.SchemaContract): every driver table's
  * read schema pinned against all three sf dirs, and a deliberate-drift
  * negative test proving the diff NAMES the offending column and types
  * (the round-7 NTZ regression was exactly a quiet fixture drift — this
  * spec makes the next one fail loudly, for every table, not just
  * `events`).
  */
class SchemaContractSpec extends AnyFunSuite with Matchers with SparkTest {

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    test(s"all 10 tables conform to the contract at $dir") {
      SchemaContract.validate(spark, dir)
    }

  test("contract covers exactly the 10 driver tables") {
    SchemaContract.Expected.keySet shouldBe Set(
      "region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
  }

  test("deliberate drift fails with the column and both types named") {
    // documents with n_chars silently re-encoded int64 -> int32 and lang
    // dropped — the shape of a real regen drift
    val drifted = StructType(Seq(
      StructField("doc_id", org.apache.spark.sql.types.LongType),
      StructField("text", org.apache.spark.sql.types.StringType),
      StructField("source", org.apache.spark.sql.types.StringType),
      StructField("n_chars", org.apache.spark.sql.types.IntegerType),
      StructField("bonus", org.apache.spark.sql.types.StringType)))
    val diffs = SchemaContract.diff("documents", drifted)
    diffs.exists(d => d.contains("MISSING") && d.contains("lang")) shouldBe true
    diffs.exists(d => d.contains("UNEXPECTED") && d.contains("bonus")) shouldBe true
    diffs.exists(d =>
      d.contains("n_chars") && d.contains("INT") && d.contains("BIGINT")) shouldBe true
  }

  test("a pure column reorder is reported as a reorder, not as missing/extra") {
    val exp = SchemaContract.Expected("region")
    val reordered = StructType(exp.fields.reverse.toIndexedSeq)
    val diffs = SchemaContract.diff("region", reordered)
    diffs should have size 1
    diffs.head should include("reordered")
  }

  test("a conforming schema diffs empty") {
    SchemaContract.diff("lineitem", SchemaContract.Expected("lineitem")) shouldBe empty
  }
}
