package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamPipeline

/** [[StreamPipeline.psiDriftStream]] — the per-key streaming PSI
  * drift monitor:
  *
  *   1. the first data-bearing batch per key seeds state and emits
  *      NOTHING (PSI needs two distributions); every later one emits
  *      exactly one row per key;
  *   2. the emitted psi_mu is the t36/t37 integer algebra applied to
  *      (previous census, current census) — pinned both against
  *      [[StreamPipeline.psiMicroNats]] on independently-counted
  *      censuses AND against hand-derived facts (identical
  *      distributions → exactly 0; a full mass shift → large);
  *   3. state rotates: batch 3 scores against batch 2, not batch 1;
  *   4. key isolation + bounded state: interleaved keys emit what
  *      each key emits alone, one state row per key;
  *   5. a key silent in a batch keeps its census (emits vs its LAST
  *      data-bearing batch when it reappears).
  */
class PsiDriftStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val NB = 4
  private val Width = 10L

  /** Independent census of a batch's values for one key (the spec's
    * own counting — not the operator's). */
  private def census(vals: Seq[Long]): Array[Long] = {
    val c = new Array[Long](NB)
    vals.foreach(v => c(math.min(math.max(v, 0L) / Width, NB - 1L).toInt) += 1)
    c
  }

  private def run(name: String, batches: Seq[Seq[(String, Long)]],
                  nB: Int = NB, width: Long = Width)
      : (Seq[(String, Long, Long, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[(String, Long)]
      val out = StreamPipeline.psiDriftStream(
        input.toDF().toDF("src", "v"), "src", "v", nB, width)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        val rows = spark.table(name).collect().map { r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }.toSeq
        (rows, state)
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(ProviderKey))(
        spark.conf.set(ProviderKey, _))
    }
  }

  test("first batch emits nothing; second emits the exact integer PSI") {
    val b1 = Seq(1L, 2L, 11L, 12L, 21L)   // buckets 0,0,1,1,2
    val b2 = Seq(1L, 31L, 32L, 35L)       // buckets 0,3,3,3
    val (rows, _) = run("psi_two",
      Seq(b1.map(("a", _)), b2.map(("a", _))))
    assert(rows.size == 1)
    val (k, nPrev, nCur, psi) = rows.head
    assert(k == "a" && nPrev == 5 && nCur == 4)
    assert(psi == StreamPipeline.psiMicroNats(census(b1), census(b2)))
    assert(psi > 0) // mass moved from buckets 0-2 into bucket 3
  }

  test("identical distributions give PSI exactly 0") {
    val b = Seq(1L, 11L, 21L, 31L)
    val (rows, _) = run("psi_zero", Seq(b.map(("a", _)), b.map(("a", _))))
    assert(rows == Seq(("a", 4L, 4L, 0L)))
  }

  test("state rotates: batch 3 scores against batch 2, not batch 1") {
    val b1 = Seq(1L, 2L, 3L)       // all bucket 0
    val b2 = Seq(31L, 32L, 33L)    // all bucket 3
    val b3 = Seq(31L, 32L, 33L)    // identical to b2
    val (rows, _) = run("psi_rotate",
      Seq(b1, b2, b3).map(_.map(("a", _))))
    assert(rows.size == 2)
    // b1→b2 is a full mass shift (large); b2→b3 identical (zero).
    // Were state NOT rotating, the second row would score b3 vs b1.
    val sorted = rows.sortBy(-_._4)
    assert(sorted(0)._4 == StreamPipeline.psiMicroNats(census(b1), census(b2)))
    assert(sorted(0)._4 > 0)
    assert(sorted(1)._4 == 0)
  }

  test("key isolation and one state row per key") {
    val a1 = Seq(1L, 2L); val a2 = Seq(31L, 32L)
    val x1 = Seq(11L); val x2 = Seq(11L)
    val (mixed, state) = run("psi_iso", Seq(
      a1.map(("a", _)) ++ x1.map(("x", _)),
      a2.map(("a", _)) ++ x2.map(("x", _))))
    assert(state == 2) // one census per key
    val byKey = mixed.groupBy(_._1)
    assert(byKey("a") ==
      Seq(("a", 2L, 2L, StreamPipeline.psiMicroNats(census(a1), census(a2)))))
    assert(byKey("x") == Seq(("x", 1L, 1L, 0L)))
  }

  test("psiMicroNats reproduces the ORACLED batch t36 query exactly") {
    import org.apache.spark.sql.functions._
    // rebuild t36's epoch censuses independently, then check the
    // shared scalar algebra returns the query's own psi_mu per
    // adjacent-epoch pair — ties the streaming monitor to the
    // DuckDB-oracled batch arithmetic
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cells = docs.select(
        pmod(graft.operators.DedupOps.md5Hash32(
          concat(col("doc_id").cast("string"), lit(":t36"))), lit(4))
          .as("epoch"),
        expr("least(n_chars div 64, 15L)").as("bucket"))
      .groupBy("epoch", "bucket").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def epochCensus(e: Long): Array[Long] =
      Array.tabulate(16)(b => cells.getOrElse((e, b.toLong), 0L))
    val batch = graft.queries.TextQueries.defs("t36_psi_drift")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(batch.size == 3)
    batch.foreach { case (eFrom, psiMu) =>
      assert(StreamPipeline.psiMicroNats(
        epochCensus(eFrom), epochCensus(eFrom + 1)) == psiMu,
        s"epoch $eFrom: streaming algebra != batch query")
    }
  }

  test("event-day replay: streamed per-source PSI == batch t37-shape slices (production claim)") {
    import org.apache.spark.sql.functions._
    // The operator's production claim (r11 verdict #5): replaying the
    // corpus through psiDriftStream in REAL event-time order — one
    // micro-batch per calendar day of each doc's ingestion event,
    // keyed by source, t37's bucket expression — must reproduce,
    // row for row, a batch computation over the same (source, day)
    // slices: psiMicroNats between each source's ADJACENT
    // DATA-BEARING days (silent days keep the census, per the
    // operator contract).
    val sf = "/root/testdata/sf0.001"
    val nB = 16; val width = 64L
    val sliced = spark.read.parquet(s"$sf/documents.parquet")
      .join(QuerySupport.t(spark, sf, "events")
          .select(col("event_id"), to_date(col("ts")).as("day")),
        col("doc_id") === col("event_id"))
      .select(col("day").cast("string").as("day"), col("source"),
        expr(s"least(n_chars div $width, ${nB - 1}L)").as("bucket"),
        col("n_chars"))
    // batch side: independent Spark-SQL census per (source, day, bucket)
    val cells = sliced.groupBy("source", "day", "bucket").count().collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val bySrcDay = cells.keySet.groupBy(_._1)
      .map { case (src, ks) => src -> ks.map(_._2).toSeq.sorted }
    def cen(src: String, day: String): Array[Long] =
      Array.tabulate(nB)(b => cells.getOrElse((src, day, b.toLong), 0L))
    val want = (for {
      (src, days) <- bySrcDay.toSeq
      Seq(d0, d1) <- days.sliding(2).toSeq if days.size >= 2
      p = cen(src, d0); c = cen(src, d1)
    } yield (src, p.sum, c.sum, StreamPipeline.psiMicroNats(p, c)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(want.nonEmpty, "fixture produced no adjacent day pairs")
    // stream side: one micro-batch per calendar day, chronological,
    // feeding the RAW n_chars so the operator's own bucketing
    // (integer div + clamp) is the code under test
    val perDoc = sliced.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val batches = perDoc.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.toSeq.map(r => (r._2, r._3)) }
    assert(batches.size >= 3) // a real multi-day replay, not a toy
    val (got, _) = run("psi_event_replay", batches, nB, width)
    assert(got.groupBy(identity).view.mapValues(_.size).toMap == want)
  }

  test("a key silent in a batch resumes against its LAST census") {
    val a1 = Seq(1L, 2L)           // seeds a
    val b2 = Seq(("other", 5L))    // a silent
    val a3 = Seq(31L, 32L)         // a resumes
    val (rows, _) = run("psi_silent", Seq(
      a1.map(("a", _)), b2, a3.map(("a", _))))
    val aRows = rows.filter(_._1 == "a")
    assert(aRows ==
      Seq(("a", 2L, 2L, StreamPipeline.psiMicroNats(census(a1), census(a3)))))
  }
}
