package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamPipeline

/** [[StreamPipeline.quantileSnapshotStream]] — the transformWithState
  * per-key running-quantile operator, q51's invariants carried to the
  * stream:
  *
  *   1. batch-split invariance: the FINAL snapshot per key is
  *      identical whether the rows arrive as 1 batch or many (state
  *      IS the sketch; insertion order is arrival order either way);
  *   2. bounded per-key state: one state row per key, and the
  *      emitted rank bound stays far below n (non-vacuous) while n
  *      is exact;
  *   3. exactness at n ≤ k: nothing compacts, estimates are the true
  *      quantiles regardless of batching;
  *   4. the self-accounted bound is honored cross-batch: every
  *      estimate's true rank window intersects ⌈φ·n⌉ ± bound;
  *   5. key isolation: interleaved keys produce the same snapshots
  *      as each key alone.
  *
  * TimeMode.None (unlike the TTL twins) latches under
  * `processAllAvailable()`, so the harness needs no progress
  * listener. Runs under the RocksDB state store provider the API
  * requires. */
class QuantileSnapshotStreamSpec extends AnyFunSuite
    with SparkSessionFixture {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val Phis = Seq(0.1, 0.5, 0.9)
  private val K = 16

  /** Deterministic value stream per key (LCG — no RNG in specs). */
  private def vals(key: String, n: Int): Seq[Double] = {
    var x = key.hashCode.toLong & 0x7fffffffL
    (0 until n).map { _ =>
      x = (x * 48271) % 2147483647L
      (x % 10000).toDouble / 10.0
    }
  }

  /** Drives the stream with the given per-batch row groups; returns
    * (all emitted snapshots in emission order, final state rows). */
  private def run(name: String, batches: Seq[Seq[(String, Double)]],
                  k: Int = K)
      : (Seq[(String, Long, Long, Seq[Double])], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[(String, Double)]
      val out = StreamPipeline.quantileSnapshotStream(
        input.toDF().toDF("src", "v"), "src", "v", k, Phis)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        val rows = spark.table(name).collect().map { r =>
          (r.getString(0), r.getLong(1), r.getLong(2),
            r.getSeq[Double](3).toSeq)
        }.toSeq
        (rows, state)
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(ProviderKey))(
        spark.conf.set(ProviderKey, _))
    }
  }

  /** Last snapshot per key = the one with the largest n. */
  private def finalSnaps(rows: Seq[(String, Long, Long, Seq[Double])])
      : Map[String, (Long, Long, Seq[Double])] =
    rows.groupBy(_._1).map { case (k, rs) =>
      val m = rs.maxBy(_._2)
      k -> ((m._2, m._3, m._4))
    }

  private def exactQuantiles(data: Seq[Double]): Seq[Double] = {
    val sorted = data.sorted
    Phis.map { p =>
      val target = math.max(1L, math.ceil(p * data.size).toLong)
      sorted((target - 1).toInt)
    }
  }

  /** True-rank window of est intersects ⌈φ·n⌉ ± bound (the
    * QuantileSketchSpec device). */
  private def holds(data: Seq[Double], n: Long, bound: Long,
                    phi: Double, est: Double): Boolean = {
    val sorted = data.sorted
    val lo = sorted.count(_ < est) + 1L
    val hi = sorted.count(_ <= est).toLong
    val target = math.max(1L, math.ceil(phi * n).toLong)
    lo <= target + bound && hi >= target - bound
  }

  test("n <= k: exact quantiles, identical for 1 batch and 3 batches") {
    val data = vals("a", K - 2)
    val rows = data.map(("a", _))
    val (one, _) = run("qs_exact1", Seq(rows))
    val (three, _) = run("qs_exact3", rows.grouped(5).toSeq)
    val fo = finalSnaps(one)("a")
    val ft = finalSnaps(three)("a")
    assert(fo === ft, "final snapshot differs across batching")
    assert(fo._1 === data.size.toLong)
    assert(fo._3 === exactQuantiles(data), "small-n estimates not exact")
  }

  test("split invariance + honored bound at n >> k, one state row per key") {
    // k = 64 here: the rank bound scales ~ (n/k)·log(n/k), so the
    // non-vacuity assertion (bound << n) needs a real capacity, while
    // the exactness/batching tests above stress the tiny-k edge
    val k = 64
    val data = vals("big", 40 * k)
    val rows = data.map(("big", _))
    val (one, st1) = run("qs_big1", Seq(rows), k)
    val (many, stM) = run("qs_bigM", rows.grouped(37).toSeq, k)
    val fo = finalSnaps(one)("big")
    val fm = finalSnaps(many)("big")
    assert(fo === fm,
      "final snapshot differs between 1 batch and 18 batches")
    assert(fo._1 === data.size.toLong, "n must stay exact")
    assert(st1 === 1L && stM === 1L, "state must be one sketch row per key")
    // bound non-vacuous and honored against the raw data
    assert(fo._2 < data.size / 4, s"bound ${fo._2} vacuous for n=${data.size}")
    Phis.zip(fo._3).foreach { case (p, e) =>
      assert(holds(data, fo._1, fo._2, p, e),
        s"phi=$p est=$e outside bound ${fo._2}")
    }
    // every intermediate snapshot carried an exact running n
    val ns = many.filter(_._1 == "big").map(_._2).sorted
    assert(ns === ns.distinct.sorted && ns.last === data.size.toLong)
  }

  test("key isolation: interleaved keys reproduce solo snapshots") {
    val a = vals("a", 3 * K).map(("a", _))
    val b = vals("b", 2 * K).map(("b", _))
    // interleave a and b rows batch by batch
    val mixed = a.grouped(8).toSeq.zipAll(b.grouped(8).toSeq, Nil, Nil)
      .map { case (xa, xb) => xa ++ xb }
    val (mix, stMix) = run("qs_mix", mixed)
    val (soloA, _) = run("qs_soloA", a.grouped(8).toSeq)
    val (soloB, _) = run("qs_soloB", b.grouped(8).toSeq)
    assert(stMix === 2L)
    assert(finalSnaps(mix)("a") === finalSnaps(soloA)("a"))
    assert(finalSnaps(mix)("b") === finalSnaps(soloB)("b"))
  }

  test("null values are skipped, not inserted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[(String, Option[Double])]
      val out = StreamPipeline.quantileSnapshotStream(
        input.toDF().toDF("src", "v"), "src", "v", K, Phis)
      val q = out.writeStream.format("memory").queryName("qs_null")
        .outputMode("append").start()
      try {
        input.addData(Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0))))
        q.processAllAvailable()
        val r = spark.table("qs_null").collect().map { r =>
          (r.getString(0), r.getLong(1))
        }
        assert(r.toSeq === Seq(("a", 2L)), "NULL must not count toward n")
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(ProviderKey))(
        spark.conf.set(ProviderKey, _))
    }
  }
}
