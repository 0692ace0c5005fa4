package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** [[SimilarityOps.mmrSelect]] / [[graft.plans.MmrSelect]] — greedy
  * MMR diversity selection. The driver oracle proves hash parity on
  * real embeddings; pinned here: the greedy recurrence against an
  * independent scalar reference, the property the operator exists for
  * (a redundant near-duplicate of pick 1 loses to a diverse
  * candidate), the negative-penalty path (anti-correlated candidates
  * get a bonus, not a zero clamp), and pool exhaustion (k > pool). */
class MmrSelectSpec extends AnyFunSuite with SparkSessionFixture {

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private def embDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 4),
      schema)
  }

  private def run(rows: Seq[(Long, Seq[Double])], qIds: Set[Long],
                  poolK: Int, k: Int, lambda: Double = 0.7,
                  mu: Double = 0.3): Seq[(Long, Long, Long)] = {
    val e = embDf(rows)
    SimilarityOps.mmrSelect(e, e.filter(col("vec_id").isin(qIds.toSeq: _*)),
        "vec_id", "embedding", poolK, k, lambda, mu)
      .orderBy(col("q_id"), col("sel_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  // ---- independent scalar reference ---------------------------------

  private def cos6(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
    }
    val v = dot / (math.sqrt(na) * math.sqrt(nb))
    val scaled = v * 1e6
    (if (scaled >= 0) math.floor(scaled + 0.5)
     else math.ceil(scaled - 0.5)) / 1e6
  }

  private def refMmr(q: Seq[Double], cands: Seq[(Long, Seq[Double])],
                     k: Int, lambda: Double = 0.7,
                     mu: Double = 0.3): Seq[Long] = {
    val sims = cands.map { case (id, v) => id -> cos6(q, v) }.toMap
    var selected = Vector.empty[Long]
    var remaining = cands
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v) =>
        val pen =
          if (selected.isEmpty) 0.0
          else mu * selected.map(s =>
            cos6(v, cands.find(_._1 == s).get._2)).max
        (id, lambda * sims(id) - pen)
      }
      val best = scored.minBy { case (id, s) => (-s, id) }._1
      selected :+= best
      remaining = remaining.filterNot(_._1 == best)
    }
    selected
  }

  test("matches the scalar greedy reference on an irregular set") {
    val rng = new scala.util.Random(42)
    val rows = (0L until 20L).map(i =>
      i -> Seq.fill(8)(rng.nextGaussian()))
    val got = run(rows, Set(0L), poolK = 12, k = 5)
    // reference pool: top-12 by (cos6 desc, id) excluding the anchor
    val q = rows.head._2
    val pool = rows.tail.sortBy { case (id, v) => (-cos6(q, v), id) }.take(12)
    assert(got.map(_._3) === refMmr(q, pool, 5))
  }

  test("a redundant near-duplicate loses to a diverse candidate") {
    // diversity-weighted (0.3/0.7): top-2 by relevance would be the
    // twins 1, 2; MMR's second pick must be the diverse 3
    val rows = Seq(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(1.0, 0.01, 0.0),
      2L -> Seq(1.0, 0.02, 0.0), 3L -> Seq(0.5, 0.0, 0.866))
    val got = run(rows, Set(0L), poolK = 3, k = 2,
      lambda = 0.3, mu = 0.7).map(_._3)
    assert(got === Seq(1L, 3L))
  }

  test("anti-correlated candidates earn a negative-penalty bonus") {
    // after pick 1 (=vec 1), vec 2 has NEGATIVE max-sim to the
    // selection (-0.21): its true score 0.7*0.1998 + 0.3*0.212 =
    // 0.204 beats vec 3 (0.152) — a zero-clamped penalty would rank
    // 3 (0.152) above 2 (0.140) instead. Margins ~0.05, rounding-safe.
    val rows = Seq(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.9, 0.436, 0.0),
      2L -> Seq(0.2, -0.9, 0.39), 3L -> Seq(0.26, -0.307, 0.9154))
    val got = run(rows, Set(0L), poolK = 3, k = 2).map(_._3)
    assert(got === Seq(1L, 2L))
  }

  test("k beyond the pool returns the whole pool, ranks contiguous") {
    val rows = Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.9, 0.1),
      2L -> Seq(0.5, 0.5))
    val got = run(rows, Set(0L), poolK = 5, k = 5)
    assert(got.map(_._2) === Seq(1L, 2L))
    assert(got.map(_._3).toSet === Set(1L, 2L))
  }
}
