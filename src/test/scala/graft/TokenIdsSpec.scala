package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** CorpusOps.tokenizeToIds — the dictionary-encode contract: ids are
  * 1-based positions in the vocab's priority order, OOV encodes as 0,
  * empty token arrays encode to empty id arrays, and the encode pass
  * is completely narrow (lazily-broadcast dictionary probed by the
  * graft.plans.DictTokenIds codegen expression — no join, no shuffle,
  * no plan-embedded literal). Round-8 addition: proven at the
  * reference's own 262,144-term vocabulary (BASELINE.md
  * CountVectorizer vocabSize) with a serialized-expression size
  * assertion — the task-binary bloat the round-7 typedlit spelling
  * would have hit at that scale. */
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

  test("reference-scale vocab (262,144 terms): correct ids, literal-free plan, small expression") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.MapType
    val n = 262144 // the reference's CountVectorizer vocabSize (BASELINE.md)
    val terms = (0 until n).map(i => f"term$i%06d")
    val docs = Seq(
      (1L, Seq(terms.head, terms(n / 2), terms.last, "zzz_oov")),
      (2L, Seq.empty[String])
    ).toDF("doc_id", "toks")
    val enc = CorpusOps.tokenizeToIds(docs, col("toks"), terms, "token_ids")
    // correctness at full scale: first/middle/last rank + OOV
    val out = enc.select("doc_id", "token_ids").as[(Long, Seq[Int])]
      .collect().toMap
    assert(out(1L) == Seq(1, n / 2 + 1, n, 0))
    assert(out(2L) == Seq.empty[Int])
    // the dictionary must NOT be embedded in the plan as a map literal
    // (the r7 typedlit spelling): only the broadcast handle rides the
    // expression tree, so every stage's task binary stays small
    val mapLits = enc.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: Literal if l.dataType.isInstanceOf[MapType] => l })
    }.flatten
    assert(mapLits.isEmpty, s"plan embeds ${mapLits.size} map literal(s)")
    // task-binary proxy: the serialized encode EXPRESSION (what every
    // task submission carries) must be orders of magnitude below the
    // serialized r7 literal spelling of the same dictionary
    def serializedSize(a: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(a); oos.close(); bos.size
    }
    val bc = spark.sparkContext.broadcast(
      new graft.plans.TokenDict(terms.toArray))
    val newSize = serializedSize(
      ColumnBridge.expression(graft.plans.DictTokenIds.of(col("toks"), bc)))
    assert(newSize < 64 * 1024,
      s"broadcast-probe expression serialized to $newSize bytes")
    val dict: Map[String, Int] =
      terms.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap
    val oldSize = serializedSize(ColumnBridge.expression(
      transform(col("toks"),
        t => coalesce(element_at(typedlit(dict), t), lit(0)))))
    assert(oldSize > 1024 * 1024,
      s"typedlit control serialized to only $oldSize bytes — control invalid")
  }
}
