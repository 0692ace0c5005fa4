package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** [[CorpusOps.repetitionSignals]] — the Gopher table-A1 repetition
  * sub-table. The driver's DuckDB oracle (t27) proves hash parity on
  * the real corpus, but that corpus never duplicates a 5-gram inside a
  * document, so the paths a repetition filter actually exists for are
  * pinned HERE on hand-built docs with hand-computed values: the
  * position-UNION dup coverage (overlapping duplicate windows must not
  * double-count a character), the count-then-char-mass tie-break of
  * the top family, and the occurrence-mass semantics that let a
  * top fraction legitimately exceed 1.0 on a pathological doc. */
class RepetitionSignalsSpec extends AnyFunSuite with SparkSessionFixture {

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private def docsDf(rows: Seq[(Long, Seq[String])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("toks", ArrayType(StringType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 4),
      schema)
  }

  private def run(rows: Seq[(Long, Seq[String])]): Map[Long, Row] =
    CorpusOps.repetitionSignals(docsDf(rows), "doc_id", col("toks"))
      .collect().map(r => r.getLong(0) -> r).toMap

  private def mus(r: Row): (Long, Long, Long) =
    (r.getAs[Long]("top2_mu"), r.getAs[Long]("top3_mu"),
      r.getAs[Long]("top4_mu"))

  test("top family: occurrence char mass of the most frequent n-gram") {
    // [a b a b a b]: "a b" x3 (cover 3*2=6 of 6 chars -> 1.0);
    // "a b a"/"b a b" x2 (cover 6 -> 1.0); "a b a b" x2 from
    // OVERLAPPING windows (cover 2*4=8 of 6 -> 4/3 > 1, the
    // occurrence-mass semantics — not clipped)
    val r = run(Seq(1L -> Seq("a", "b", "a", "b", "a", "b")))(1L)
    assert(r.getAs[Long]("n_toks") === 6L)
    assert(r.getAs[Long]("tok_chars") === 6L)
    assert(mus(r) === ((1000000L, 1000000L, 1333333L)))
    assert(r.getAs[Long]("pass_rep") === 0L)
  }

  test("top-family ties on count break to the larger gram char mass") {
    // "aa bb" x2 (gchars 4) and "c d" x2 (gchars 2) tie on count; the
    // winner must be the 4-char gram: cover 2*4=8 of 12 -> 666666
    val r = run(Seq(
      2L -> Seq("aa", "bb", "aa", "bb", "c", "d", "c", "d")))(2L)
    assert(r.getAs[Long]("tok_chars") === 12L)
    assert(r.getAs[Long]("top2_mu") === 666666L)
  }

  test("dup family: position-union coverage, no double counting") {
    // [a b c d e f g h a b c d e i j]: exactly one duplicated 5-gram,
    // "a b c d e" at positions 1 and 9, covering {1..5} U {9..13} =
    // 10 of 15 chars; no 6-gram (or longer) repeats
    val r = run(Seq(3L -> Seq("a", "b", "c", "d", "e", "f", "g", "h",
      "a", "b", "c", "d", "e", "i", "j")))(3L)
    assert(r.getAs[Long]("dup5_mu") === 666666L)
    assert((6 to 10).map(n => r.getAs[Long](s"dup${n}_mu")) ===
      Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("overlapping duplicate windows saturate at full coverage") {
    // [x y z w v] x3 (15 tokens): every 5-gram window repeats 5
    // positions later; the union covers every position exactly once ->
    // 1.0, where occurrence-sum would give 6*5/15 = 2.0
    val toks = (0 until 3).flatMap(_ => Seq("x", "y", "z", "w", "v"))
    val r = run(Seq(4L -> toks))(4L)
    assert(r.getAs[Long]("dup5_mu") === 1000000L)
  }

  test("the whole table is one narrow projection: zero exchanges") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    def countShuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countShuffles(a.finalPhysicalPlan)
      case s: ShuffleQueryStageExec => 1 + countShuffles(s.plan)
      case q: QueryStageExec => countShuffles(q.plan)
      case _ => p.children.map(countShuffles).sum
    }
    val df = CorpusOps.repetitionSignals(
      docsDf(Seq(1L -> Seq("a", "b", "a"))), "doc_id", col("toks"))
    df.write.format("noop").mode("overwrite").save()
    val n = countShuffles(df.queryExecution.executedPlan)
    assert(n === 0,
      s"repetition signals must not exchange, got $n:\n" +
        df.queryExecution.executedPlan)
  }

  test("repetition_stats is SQL-registered and equals the Column spelling") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(Seq("a", "b", "a", "b"), Seq("x")).toDF("toks")
      .createOrReplaceTempView("rep_sql")
    val viaSql = spark.sql(
      "SELECT repetition_stats(toks) AS st FROM rep_sql").collect()
    val viaCol = Seq(Seq("a", "b", "a", "b"), Seq("x")).toDF("toks")
      .select(graft.plans.RepetitionStats.of(org.apache.spark.sql.functions.col("toks")).as("st"))
      .collect()
    assert(viaSql.map(_.toString) === viaCol.map(_.toString))
  }

  test("diverse doc passes the A1 conjunction; short docs default 0") {
    // all-distinct tokens: top2 cover = 1*2/26 chars, no dups at all
    val div = ('a' to 'z').map(_.toString)
    val r = run(Seq(5L -> div, 6L -> Seq("solo")))
    assert(r(5L).getAs[Long]("pass_rep") === 1L)
    // single-token doc: no n-grams of any order -> all fractions 0
    val solo = r(6L)
    assert(mus(solo) === ((0L, 0L, 0L)))
    assert((5 to 10).forall(n => solo.getAs[Long](s"dup${n}_mu") === 0L))
    assert(solo.getAs[Long]("pass_rep") === 1L)
  }
}
