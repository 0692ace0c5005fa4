package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** [[SimilarityOps.ndcgAtK]] — rank-aware retrieval quality. Pins the
  * frozen micro-unit discount table against first-principles
  * recomputation, the perfect-retrieval fixed point, the
  * undefined-NDCG exclusion (a label with no second member), and full
  * bit-parity against an independent scalar reference on a seeded
  * random corpus (cosine rounding reproduced via BigDecimal HALF_UP at
  * 6 dp, Spark's own double-round semantics). */
class NdcgSpec extends AnyFunSuite with SparkSessionFixture {

  private val wt = Seq(1000000L, 630930L, 500000L, 430677L, 386853L)

  test("frozen discount and prefix-sum literals match first principles") {
    val recomputed = (1 to 5).map { i =>
      val v = 1.0 / (math.log(i + 1.0) / math.log(2.0))
      (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
        1000000).toLongExact
    }
    assert(recomputed === wt)
    assert(wt.scanLeft(0L)(_ + _).tail ===
      Seq(1000000L, 1630930L, 2130930L, 2561607L, 2948460L))
  }

  // deterministic corpus: 30 vectors, dim 8, labels a/b/c cycling,
  // plus one unique-label query vector (excluded: NDCG undefined)
  private val corpus: Seq[(Long, Array[Float], String)] = {
    val rnd = new scala.util.Random(42)
    val base = (1L to 30L).map { id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f),
        Seq("a", "b", "c")((id % 3).toInt))
    }
    base :+ ((35L, Array.fill(8)(rnd.nextFloat() * 2f - 1f), "z"))
  }

  private def scalarRef(k: Int): Map[String, (Long, Long)] = {
    val labCnt = corpus.groupBy(_._3).map { case (l, v) => l -> v.size }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]) = math.sqrt(dot(a, a))
    val perQ = corpus.filter(_._1 % 5 == 0).flatMap { case (qid, qe, ql) =>
      if (labCnt(ql) < 2) None
      else {
        val top = corpus.filter(_._1 != qid).map { case (id, e, l) =>
          val s = BigDecimal(dot(qe, e) / (nrm(qe) * nrm(e)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, l, s)
        }.sortBy { case (id, _, s) => (-s, id) }.take(k)
        val dcg = top.zipWithIndex
          .map { case ((_, l, _), i) => if (l == ql) wt(i) else 0L }.sum
        val idcg = wt.take(math.min(k, labCnt(ql) - 1)).sum
        Some(ql -> (1000000L * dcg) / idcg)
      }
    }
    perQ.groupBy(_._1).map { case (l, v) =>
      l -> (v.size.toLong, v.map(_._2).sum / v.size)
    }
  }

  private def run(k: Int): Map[String, (Long, Long)] = {
    import spark.implicits._
    val df = corpus.toDF("vec_id", "embedding", "label")
    SimilarityOps.ndcgAtK(df, df.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", "label", k)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("bit-parity with the scalar reference; unique label excluded") {
    val got = run(5)
    assert(!got.contains("z"))
    assert(got === scalarRef(5).filter { case (l, _) => l != "z" })
  }

  test("perfect retrieval scores exactly 1.0") {
    import spark.implicits._
    // two tight same-label clusters: every query's top-2 shares its
    // label, so DCG == IDCG (n_label - 1 == 2 == k)
    val docs = Seq(
      (0L, Array(1f, 0f, 0.00f), "a"), (1L, Array(1f, 0f, 0.01f), "a"),
      (2L, Array(1f, 0f, 0.02f), "a"),
      (3L, Array(0f, 1f, 0.00f), "b"), (4L, Array(0f, 1f, 0.01f), "b"),
      (5L, Array(0f, 1f, 0.02f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.ndcgAtK(docs, docs, "vec_id", "embedding",
        "label", 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 1000000L, "b" -> 1000000L))
  }
}
