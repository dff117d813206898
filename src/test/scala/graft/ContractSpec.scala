package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The driver contract itself: every registered query must carry an oracle
  * (a query without one silently downgrades to a rows-only check in the
  * driver's compare), names must be unique across the two registries, and
  * oracle SQL must be non-trivially formed.
  */
class ContractSpec extends AnyFunSuite with Matchers {

  test("every query has an oracle and every oracle has a query") {
    SparkEntry.oracleSql.keySet shouldBe SparkEntry.queries.keySet
  }

  test("core and extension registries do not shadow each other") {
    val core = SparkEntry.queries.keySet -- ExtensionQueries.queries.keySet
    core.size + ExtensionQueries.queries.size shouldBe SparkEntry.queries.size
  }

  /** Global aggregates returning exactly one row are trivially ordered. */
  private val singleRow = Set("q06_selective_sum", "q15_correlated_subquery")

  test("oracle SQL strings are well-formed (non-empty, ORDER BY present)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(s"$name: ") {
        sql.trim should not be empty
        // deterministic row order is part of the hash-compare contract
        if (!singleRow(name)) sql.toUpperCase should include("ORDER BY")
      }
    }
  }
}
