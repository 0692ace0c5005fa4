package graft

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.QuantileSketchAgg
import graft.plans.QuantileSketchAgg.Sketch

/** Specs for the mergeable quantile sketch (q51's machinery).
  *
  * The load-bearing claims, each pinned here:
  *   1. n is EXACT under any insert/merge shape (weight preservation);
  *   2. the self-accounted rank bound is honored: for every φ, the
  *      estimate's true rank window intersects ⌈φ·n⌉ ± bound — under
  *      sequential insert, chunked merges of either association, and
  *      adversarial (sorted / reversed / duplicate-heavy) inputs;
  *   3. with n ≤ k the sketch never compacts and quantiles are exact;
  *   4. the aggregate wiring (groupBy over a multi-partition frame,
  *      SQL registration) produces the same guarantees.
  */
class QuantileSketchSpec extends AnyFunSuite with SparkSessionFixture {

  private def trueRankWindow(data: Seq[Double], est: Double): (Long, Long) =
    (data.count(_ < est).toLong + 1L, data.count(_ <= est).toLong)

  /** rank window of est intersects [target-bound, target+bound]? */
  private def holds(data: Seq[Double], n: Long, bound: Long,
                    phi: Double, est: Double): Boolean = {
    val target = math.max(1L, math.ceil(phi * n).toLong)
    val (lo, hi) = trueRankWindow(data, est)
    lo <= target + bound && hi >= target - bound
  }

  private val phis = Seq(0.1, 0.5, 0.9, 0.95, 0.99)

  private def checkAll(data: Seq[Double], s: Sketch): Unit = {
    assert(s.n == data.length.toLong, "weight not preserved")
    val ests = s.quantiles(phis)
    phis.zip(ests).foreach { case (p, e) =>
      assert(data.contains(e), s"estimate $e at phi=$p is not an input value")
      assert(holds(data, s.n, s.queryBound, p, e),
        s"phi=$p est=$e outside rank bound ${s.queryBound} (n=${s.n})")
    }
  }

  test("n <= k: no compaction, quantiles exact, bound floor") {
    val rnd = new Random(7)
    val data = Seq.fill(300)(rnd.nextDouble() * 100)
    val s = Sketch.empty(400)
    data.foreach(s.insert)
    assert(s.compactionBound == 0L)
    val sorted = data.sorted
    phis.zip(s.quantiles(phis)).foreach { case (p, e) =>
      val target = math.max(1L, math.ceil(p * data.length).toLong)
      assert(e == sorted(target.toInt - 1),
        s"phi=$p: expected exact ${sorted(target.toInt - 1)}, got $e")
    }
  }

  test("sequential insert honors the self-accounted bound (n >> k)") {
    val rnd = new Random(11)
    val data = Seq.fill(50000)(rnd.nextGaussian())
    val s = Sketch.empty(64)
    data.foreach(s.insert)
    checkAll(data, s)
    // the bound must also be nontrivial: far below n (else vacuous)
    assert(s.queryBound < data.length / 4,
      s"bound ${s.queryBound} is vacuously wide for n=${data.length}")
  }

  test("merge shape independence: ((a+b)+c) and (a+(b+c)) both hold") {
    val rnd = new Random(13)
    val chunks = Seq.fill(3)(Seq.fill(20000)(rnd.nextDouble() * 1e6))
    val all = chunks.flatten
    def sk(c: Seq[Double]) = { val s = Sketch.empty(64); c.foreach(s.insert); s }
    val left = sk(chunks(0)); left.mergeIn(sk(chunks(1))); left.mergeIn(sk(chunks(2)))
    val bc = sk(chunks(1)); bc.mergeIn(sk(chunks(2)))
    val right = sk(chunks(0)); right.mergeIn(bc)
    checkAll(all, left)
    checkAll(all, right)
  }

  test("serialize/deserialize round-trip preserves state") {
    val rnd = new Random(17)
    val data = Seq.fill(10000)(rnd.nextDouble())
    val s = Sketch.empty(64)
    data.foreach(s.insert)
    val r = Sketch.deserialize(s.serialize(), 64)
    assert(r.n == s.n && r.compactionBound == s.compactionBound)
    assert(r.quantiles(phis) == s.quantiles(phis))
  }

  test("adversarial orders: sorted, reversed, duplicate-heavy") {
    val asc = (1 to 30000).map(_.toDouble)
    val desc = asc.reverse
    val rnd = new Random(19)
    val dupes = Seq.fill(30000)(rnd.nextInt(5).toDouble) // 5 distinct values
    for (data <- Seq(asc, desc, dupes)) {
      val s = Sketch.empty(64)
      data.foreach(s.insert)
      checkAll(data, s)
    }
  }

  test("aggregate over a multi-partition frame honors the bound") {
    import spark.implicits._
    val rnd = new Random(23)
    val rows = Seq.tabulate(40000)(i => (s"g${i % 3}", rnd.nextDouble() * 1000))
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(QuantileSketchAgg.of(col("v"), 64, Seq(0.5, 0.95)).as("sk"))
      .select(col("g"), col("sk.n"), col("sk.bound"), col("sk.qs"))
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      val g = r.getString(0)
      val data = rows.filter(_._1 == g).map(_._2)
      assert(r.getLong(1) == data.length.toLong)
      val bound = r.getLong(2)
      r.getSeq[org.apache.spark.sql.Row](3).foreach { q =>
        val (p, e) = (q.getDouble(0), q.getDouble(1))
        assert(holds(data, data.length.toLong, bound, p, e),
          s"group $g phi=$p est=$e bound=$bound")
      }
    }
  }

  test("SQL registration: quantile_sketch(v, k, phis...) usable in SQL") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rows = Seq.tabulate(5000)(i => ("g", (i % 997).toDouble))
    rows.toDF("g", "v").createOrReplaceTempView("qs_in")
    val r = spark.sql(
      "SELECT g, quantile_sketch(v, 64, 0.5, 0.95) AS sk FROM qs_in GROUP BY g")
      .select(col("sk.n"), col("sk.bound"))
      .collect().head
    assert(r.getLong(0) == 5000L && r.getLong(1) >= 0L)
  }

  test("nulls skipped, NaN rejected") {
    import spark.implicits._
    val df = Seq[(String, Option[Double])](("g", Some(1.0)), ("g", None),
      ("g", Some(2.0))).toDF("g", "v")
    val n = df.groupBy(col("g"))
      .agg(QuantileSketchAgg.of(col("v"), 64, Seq(0.5)).as("sk"))
      .select(col("sk.n")).collect().head.getLong(0)
    assert(n == 2L)
    val nan = Seq(("g", Double.NaN)).toDF("g", "v")
    val ex = intercept[Exception] {
      nan.groupBy(col("g"))
        .agg(QuantileSketchAgg.of(col("v"), 64, Seq(0.5)).as("sk"))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
