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
}
