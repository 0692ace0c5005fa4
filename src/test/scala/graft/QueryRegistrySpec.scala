package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards for the round-6 SparkEntry split: the per-family query
  * objects must partition the inventory (no key claimed twice — a
  * duplicate would silently collapse in the `++` union), and the
  * union's key set must equal the oracle map's exactly, so every
  * query the driver runs has a DuckDB twin and vice versa.
  */
class QueryRegistrySpec extends AnyFunSuite {

  test("family maps are pairwise disjoint (no silent ++ collapse)") {
    val sizes = SparkEntry.families.map(_._2.size).sum
    assert(sizes === SparkEntry.queries.size,
      "duplicate query key across family objects")
  }

  test("query keys equal oracle keys exactly") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty, s"queries without oracle: ${q -- o}")
    assert((o -- q) === Set.empty, s"oracles without query: ${o -- q}")
  }

  test("inventory size is the declared 187") {
    assert(SparkEntry.queries.size === 187)
  }

  test("every family is non-empty and names its queries by prefix convention") {
    SparkEntry.families.foreach { case (name, defs) =>
      assert(defs.nonEmpty, s"$name is empty")
    }
  }
}
