package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{DetParams, SimilarityOps}

/** Product-quantization ANN against an exact driver-side reference
  * implementation (same fold order, rounding, and tie-breaks). */
class PqTopKSpec extends AnyFunSuite with SparkSessionFixture {

  private val Subspaces = 4
  private val SubDim = DetParams.EmbedDim / Subspaces

  // identical arithmetic to the operator: left-to-right double dot,
  // d2 = <a,a> - 2<a,b> + <b,b>, round half-up to 6 dp
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def d2(a: Array[Double], b: Array[Double], m: Int): BigDecimal = {
    val sa = a.slice(m * SubDim, (m + 1) * SubDim)
    val sb = b.slice(m * SubDim, (m + 1) * SubDim)
    BigDecimal(dot(sa, sa) - 2.0 * dot(sa, sb) + dot(sb, sb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("matches an exact driver-side reference on sf0.001 embeddings") {
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val cents = rows.filter(_._1 < 16)
    val queries = rows.filter(_._1 < 10)

    // reference: codes then ADC top-3 per query
    val codes: Map[(Long, Int), Long] = (for {
      (vid, emb) <- rows; m <- 0 until Subspaces
    } yield {
      val best = cents.map { case (cid, cemb) => (d2(emb, cemb, m), cid) }
        .minBy(identity) // (distance, centroid id) lexicographic
      (vid, m) -> best._2
    }).toMap
    val expected = (for { (qid, qemb) <- queries } yield {
      val qtab = (for {
        (cid, cemb) <- cents; m <- 0 until Subspaces
      } yield (m, cid) -> d2(qemb, cemb, m)).toMap
      rows.filter(_._1 != qid)
        .map { case (vid, _) =>
          val s = (0 until Subspaces).map(m => qtab((m, codes((vid, m))))).sum
          (s, vid)
        }
        .sorted.take(3).zipWithIndex
        .map { case ((s, vid), i) => (qid, vid, s.toDouble, i + 1) }
    }).flatten.toSet

    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = SimilarityOps.pqTopK(
        e, e.filter(col("vec_id") < 10), e.filter(col("vec_id") < 16),
        "vec_id", "embedding", Subspaces, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expected)
  }

  test("IVF-PQ composition matches the same reference restricted to probed cells") {
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val cents = rows.filter(_._1 < 16)
    val queries = rows.filter(_._1 < 10)

    def fullDist(a: Array[Double], b: Array[Double]): BigDecimal =
      (0 until Subspaces).map(m => d2(a, b, m)).sum
    def cellOf(emb: Array[Double]): Long =
      cents.map { case (cid, cemb) => (fullDist(emb, cemb), cid) }.minBy(identity)._2
    val codes = (for {
      (vid, emb) <- rows; m <- 0 until Subspaces
    } yield (vid, m) ->
      cents.map { case (cid, cemb) => (d2(emb, cemb, m), cid) }.minBy(identity)._2
    ).toMap
    val cellIndex = rows.map { case (vid, emb) => vid -> cellOf(emb) }.toMap

    val expected = (for { (qid, qemb) <- queries } yield {
      val probed = cents.map { case (cid, cemb) => (fullDist(qemb, cemb), cid) }
        .sorted.take(2).map(_._2).toSet
      val qtab = (for {
        (cid, cemb) <- cents; m <- 0 until Subspaces
      } yield (m, cid) -> d2(qemb, cemb, m)).toMap
      rows.filter { case (vid, _) => vid != qid && probed(cellIndex(vid)) }
        .map { case (vid, _) =>
          ((0 until Subspaces).map(m => qtab((m, codes((vid, m))))).sum, vid)
        }
        .sorted.take(3).zipWithIndex
        .map { case ((s, vid), i) => (qid, vid, s.toDouble, i + 1) }
    }).flatten.toSet

    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = SimilarityOps.ivfPqTopK(
        e, e.filter(col("vec_id") < 10), e.filter(col("vec_id") < 16),
        "vec_id", "embedding", Subspaces, probes = 2, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expected)
  }
}
