package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the scale-critical plan
  * properties the operator Scaladocs claim — column pruning reaching
  * the scan, map-side prunes, TakeOrderedAndProject instead of global
  * sorts, and exchange reuse on the banded self-joins. A future edit
  * that silently de-optimizes one of these shapes fails here, not in
  * a 100 TB postmortem. Assertions are deliberately loose (substring
  * presence, not full plan text) to survive Spark version drift. */
class PlanShapeSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  /** Pre-execution formatted plan. */
  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Post-AQE executed plan (runtime ReusedExchange lives only here). */
  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    s
  }

  test("p5 projection prunes the documents scan to the selected columns") {
    val plan = formatted("p5_final_project")
    val schema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(schema.contains("doc_id") && schema.contains("lang"))
    assert(!schema.contains("text"), "unprojected text column read from parquet")
  }

  test("q40 probes the Bloom bitmap in a Filter, not inside the join") {
    val plan = formatted("q40_bloom_join")
    // the probe (xxhash64 bit tests) must appear in a Filter node so
    // it runs map-side before the exchange
    val filterBlock = plan.split("\\n\\n").filter(_.startsWith("("))
      .filter(b => b.contains("Filter") && b.contains("xxhash64"))
    assert(filterBlock.nonEmpty, "bloom probe not in a standalone Filter")
  }

  test("q10 sort+limit plans as TakeOrderedAndProject, never a global sort") {
    val plan = formatted("q10_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q34 and q45 rank-filters get the WindowGroupLimit map-side prune") {
    assert(formatted("q34_group_sample").contains("WindowGroupLimit"))
    assert(formatted("q45_latest_per_key").contains("WindowGroupLimit"))
  }

  test("q41 top-k aggregate runs a map-side partial before the exchange") {
    val plan = formatted("q41_topk_agg")
    assert(plan.contains("partial_top_k_rows"),
      "no map-side partial: every row would cross the shuffle")
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("d2b banded self-join reuses one signature exchange") {
    assert(executed("d2b_minhash_pairs").contains("ReusedExchange"),
      "both self-join sides recomputed the signature pass")
  }

  test("d3b banded self-join reuses one simhash exchange") {
    assert(executed("d3b_simhash_pairs").contains("ReusedExchange"))
  }

  test("d5 banded self-join reuses one sketch exchange") {
    assert(executed("d5_embed_neardup").contains("ReusedExchange"))
  }
}
