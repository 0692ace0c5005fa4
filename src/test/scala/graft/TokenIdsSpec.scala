package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** CorpusOps.tokenizeToIds — the dictionary-encode contract: ids are
  * 1-based positions in the vocab's priority order, OOV encodes as 0,
  * empty token arrays encode to empty id arrays, and the encode pass
  * is completely narrow (broadcast dictionary literal — no join, no
  * shuffle). */
class TokenIdsSpec extends AnyFunSuite with SparkSessionFixture {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, Seq("the", "cat", "sat", "the")),
      (2L, Seq("cat", "unseen")),
      (3L, Seq.empty[String])
    ).toDF("doc_id", "toks")
  }

  test("ids are 1-based vocab positions; OOV is 0; order preserved") {
    import spark.implicits._
    // priority order handed in explicitly: the, cat, sat
    val vocab = Seq("the", "cat", "sat").toDF("term")
    val out = CorpusOps.tokenizeToIds(docsDf, col("toks"), vocab)
      .select("doc_id", "token_ids").as[(Long, Seq[Int])]
      .collect().toMap
    assert(out(1L) == Seq(1, 2, 3, 1)) // repeated token repeats its id
    assert(out(2L) == Seq(2, 0))       // "unseen" is OOV -> 0
    assert(out(3L) == Seq.empty[Int])  // empty stays empty, not null
  }

  test("vocabularyWithIdf order feeds the id assignment (df desc, term)") {
    // df(cat)=2 docs outranks the df=1 tier, which orders lex
    // (sat, the, unseen); limit=3 cuts "unseen" at the rank boundary,
    // so it round-trips as OOV even though the corpus contains it
    val vocab = CorpusOps.vocabularyWithIdf(docsDf, "doc_id", col("toks"), 3)
    import spark.implicits._
    val out = CorpusOps.tokenizeToIds(docsDf, col("toks"), vocab)
      .select("doc_id", "token_ids").as[(Long, Seq[Int])]
      .collect().toMap
    // order: cat(1), sat(2), the(3)
    assert(out(1L) == Seq(3, 1, 2, 3))
    assert(out(2L) == Seq(1, 0))
  }

  test("encode pass plans with zero shuffle exchanges") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val vocab = Seq("the", "cat", "sat").toDF("term")
    val enc = CorpusOps.tokenizeToIds(docsDf, col("toks"), vocab)
    enc.collect()
    def shuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.finalPhysicalPlan)
      case s: ShuffleQueryStageExec => 1 + shuffles(s.plan)
      case q: QueryStageExec => shuffles(q.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(shuffles).sum
      case _ => p.children.map(shuffles).sum
    }
    assert(shuffles(enc.queryExecution.executedPlan) == 0,
      s"dictionary encode must be narrow:\n${enc.queryExecution.executedPlan}")
  }
}
