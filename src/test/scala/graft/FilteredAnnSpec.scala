package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** s18 (metadata-filtered exact top-k) — what the corpus oracle
  * cannot state directly:
  *
  *  - PRE-filter semantics: results equal exact top-k computed over
  *    the filtered subset, which on a class with ≥ k members always
  *    yields k rows — where post-filtering a fixed-k unfiltered pool
  *    can starve (verified on a planted geometry where the two
  *    disagree);
  *  - the attribute match is the broadcast-hash-join KEY: the plan
  *    contains a BroadcastHashJoin and no BroadcastNestedLoopJoin
  *    (a nested-loop plan would score |Q|·|C| pairs then filter).
  */
class FilteredAnnSpec extends AnyFunSuite with SparkSessionFixture {

  // planted geometry: label-0 vectors cluster near axis e1, label-1
  // near e2; query 0 has label 1 but sits nearer the label-0 cloud,
  // so an unfiltered pool is dominated by wrong-label neighbors
  private def corpus() = {
    import spark.implicits._
    val rows =
      // query: label 1, pointing at e1 (the label-0 direction)
      Seq((0L, Array(1.0f, 0.1f, 0f), 1)) ++
      // 20 label-0 vectors near e1
      (1 to 20).map(i =>
        (i.toLong, Array(1.0f, 0.01f * i, 0f), 0)) ++
      // 5 label-1 vectors near e2
      (21 to 25).map(i =>
        (i.toLong, Array(0.05f * (i - 20), 1.0f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
  }

  test("pre-filter == exact top-k over the filtered subset; no starvation") {
    val c = corpus()
    val q = c.filter(col("vec_id") === 0L)
    val got = SimilarityOps.filteredTopK(
        c, q, "vec_id", "embedding", "label", 5)
      .select("vec_id", "rn").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rn"))).toSet
    // naive subset spelling: restrict the corpus to label 1 first
    val want = SimilarityOps.bruteForceTopK(
        c.filter(col("label") === 1), q, "vec_id", "embedding", 5)
      .select("vec_id", "rn").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rn"))).toSet
    assert(got === want)
    assert(got.size === 5, "class has 5 members; pre-filter must fill k")
    // the starvation contrast: a post-filtered k=5 unfiltered pool
    // keeps ZERO label-1 rows here (top-5 all label 0)
    val pool = SimilarityOps.bruteForceTopK(
        c, q, "vec_id", "embedding", 5)
      .join(c.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") === 1).count()
    assert(pool === 0L)
  }

  test("attribute equality plans as BroadcastHashJoin, not nested loop") {
    val c = corpus()
    val plan = SimilarityOps.filteredTopK(
        c, c.filter(col("vec_id") === 0L), "vec_id", "embedding",
        "label", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
