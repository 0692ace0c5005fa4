package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** kNN-classifier eval (SimilarityOps.knnClassifyEval): vote
  * tie-break determinism on a crafted geometry, accuracy arithmetic,
  * and self-exclusion. */
class KnnEvalSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  // 2-D toy space: two tight clusters on the axes. Labels chosen so
  // one query sees a 2-2 vote tie among its 4 neighbors.
  private def toy = Seq(
    // id, (x, y), label
    (0, Array(1.0f, 0.00f), 0), // query (id % 5 semantics not used here)
    (1, Array(1.0f, 0.01f), 0),
    (2, Array(1.0f, 0.02f), 0),
    (3, Array(1.0f, 0.03f), 1),
    (4, Array(1.0f, 0.04f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("2-2 vote tie breaks to the smaller label, deterministically") {
    val out = SimilarityOps.knnClassifyEval(
      toy, toy.filter($"vec_id" === 0), "vec_id", "embedding", "label", k = 4)
      .collect()
    // neighbors of q0 = {1,2,3,4}: labels {0,0,1,1} — tie → label 0,
    // which matches q0's own label → accuracy 1
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Int]("true_label") === 0)
    assert(r.getAs[Long]("n_queries") === 1L)
    assert(r.getAs[Long]("n_correct") === 1L)
    assert(r.getAs[Long]("acc_mu") === 1000000L)
  }

  test("self is excluded from the neighbor set") {
    // k = 4 over 5 vectors: if self leaked in, q0's top-4 would
    // include id 0 and the vote would be {0,0,0,1} not {0,0,1,1};
    // distinguish via a label flip that only matters with self present
    val flipped = toy.withColumn("label",
      when($"vec_id" === 1, 1).otherwise($"label"))
    // neighbors {1,2,3,4}: labels {1,0,1,1} → majority 1 ≠ true 0
    val out = SimilarityOps.knnClassifyEval(
      flipped, flipped.filter($"vec_id" === 0),
      "vec_id", "embedding", "label", k = 4).collect()
    assert(out.head.getAs[Long]("n_correct") === 0L)
  }

  test("per-class accuracy aggregates over the sampled query set (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = SimilarityOps.knnClassifyEval(
      emb, emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding", "label", 5)
      .collect()
    val nq = out.map(_.getAs[Long]("n_queries")).sum
    assert(nq === emb.filter($"vec_id" % 5 === 0).count())
    out.foreach { r =>
      val (n, c, mu) = (r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_correct"), r.getAs[Long]("acc_mu"))
      assert(c >= 0 && c <= n)
      assert(mu === 1000000L * c / n)
    }
  }
}
