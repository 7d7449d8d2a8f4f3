package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract completeness: the correctness gate only checks queries
  * that HAVE an oracle, so a query accidentally shipped without one
  * silently downgrades to a rows-only check. This spec makes the
  * rows-only set an explicit allowlist.
  */
class ContractSpec extends AnyFunSuite {

  /** Deliberately un-oracled (cross-engine hash-unstable by nature);
    * each is documented at its SparkEntry definition site.
    */
  private val rowsOnly = Set(
    "q_approx_distinct",   // HLL++ sketch values differ across engines
    "q_approx_percentile", // quantile sketch, same rationale
    "q_hll_merge",         // DataSketches rollup, same rationale
    "q_simsearch_cosine")  // double-float rank order not portable

  test("every query has an oracle or is an allowlisted rows-only check") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty,
      s"queries without oracle SQL (add one or allowlist): $missing")
  }

  test("no orphan oracles (oracle SQL without a query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("rows-only allowlist stays minimal (everything in it exists)") {
    val stale = rowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlisted names no longer exist: $stale")
    assert((rowsOnly & SparkEntry.oracleSql.keySet).isEmpty,
      "allowlisted queries now HAVE oracles — remove from the allowlist")
  }
}
