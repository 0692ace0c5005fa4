package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** [[CorpusOps.c4Filters]] — the C4 rule table. The real corpus has
  * no punctuation, so the driver oracle proves hash parity while
  * every keep-rule path sits at zero; the rules themselves are pinned
  * here on hand-built docs (terminal-punct variants, the 5-word
  * floor, the javascript line drop, brace/lorem document drops), plus
  * the stateless-streaming face and the zero-exchange plan. */
class C4FiltersSpec extends AnyFunSuite with SparkSessionFixture {

  private val corpus: Seq[(Long, String)] = Seq(
    // 3 kept lines (./!/" endings, >= 5 words), 1 short, 1 unpunctuated
    1L -> ("one two three four five.\nsix seven eight nine ten!\n" +
      "\"quoted line with five words\"\nshort line.\nno punctuation here at all"),
    // javascript mention kills an otherwise-kept line; ? ending kept
    2L -> ("enable JavaScript to view this page.\n" +
      "is this a kept question line?"),
    // brace and lorem drops; still >= 3 terminal chars each
    3L -> "int main() { return 0; }. Yes. Done.",
    4L -> "Lorem Ipsum dolor sit amet. Fine. Sure.",
    // passes the document rules with zero kept lines
    5L -> "a. b? c!",
    6L -> "   \n  ") // no lines -> dropped

  private def run(): Map[Long, Map[String, Long]] = {
    import spark.implicits._
    val df = CorpusOps.c4Filters(corpus.toDF("doc_id", "text"),
      "doc_id", "text")
    df.collect().map { r =>
      r.getLong(0) -> df.columns.drop(1).map(c =>
        c -> r.getAs[Long](c)).toMap
    }.toMap
  }

  test("line retention: terminal punct, 5-word floor, javascript drop") {
    val m = run()
    assert(!m.contains(6L))
    assert(m(1L)("n_lines") === 5L)
    assert(m(1L)("n_kept") === 3L) // short "." line and bare line drop
    assert(m(1L)("kept_mu") === 600000L)
    assert(m(2L)("n_kept") === 1L) // javascript line dropped, ? kept
    assert(m(5L)("n_kept") === 0L)
  }

  test("document rules: sentence floor, brace and lorem drops") {
    val m = run()
    assert(m(1L)("n_term") === 3L && m(1L)("pass_c4") === 1L)
    assert(m(3L)("has_brace") === 1L && m(3L)("pass_c4") === 0L)
    assert(m(4L)("has_lorem") === 1L && m(4L)("pass_c4") === 0L)
    assert(m(5L)("n_term") === 3L && m(5L)("pass_c4") === 1L)
    assert(m(2L)("n_term") === 2L && m(2L)("pass_c4") === 0L)
  }

  test("stateless: runs unchanged on a stream, batch-equal, no state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val out = CorpusOps.c4Filters(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      corpus.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
    val streamed = spark.table("c4_stream").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_kept")).toMap
    assert(streamed === run().map { case (k, v) => k -> v("n_kept") })
  }

  test("zero exchanges") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    def countShuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countShuffles(a.finalPhysicalPlan)
      case s: ShuffleQueryStageExec => 1 + countShuffles(s.plan)
      case q: QueryStageExec => countShuffles(q.plan)
      case _ => p.children.map(countShuffles).sum
    }
    import spark.implicits._
    val df = CorpusOps.c4Filters(corpus.toDF("doc_id", "text"),
      "doc_id", "text")
    df.write.format("noop").mode("overwrite").save()
    assert(countShuffles(df.queryExecution.executedPlan) === 0)
  }
}
