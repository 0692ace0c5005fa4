package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.CorpusOps

/** [[CorpusOps.tokenBudgetAllocation]] — the water-filling closed
  * form checked against an independent brute-force water-fill (raise
  * the level one token at a time) on seeded random censuses, plus
  * the algebra's invariants:
  *  - Σ alloc = min(budget, total) with budget = total div 2;
  *  - alloc ≤ n_tokens per source, alloc ≥ 0;
  *  - uncapped ⇔ alloc = n_tokens kept whole;
  *  - level maximality: spending at L+1 would exceed the budget
  *    whenever anything was capped. */
class TokenBudgetSpec extends AnyFunSuite with SparkSessionFixture {

  /** Independent reference: smallest-first greedy fill, one unit of
    * level at a time is too slow — but a direct scan over candidate
    * levels is still an independent derivation: for each L compute
    * spend(L) = Σ min(n, L); pick max L with spend ≤ B; hand the
    * remainder to capped sources in source order. */
  private def reference(ns: Map[String, Long]): Map[String, Long] = {
    val total = ns.values.sum
    val b = total / 2
    if (total <= b) return ns
    val lmax = (0L to ns.values.max).reverse
      .find(l => ns.values.map(math.min(_, l)).sum <= b).getOrElse(0L)
    val spend = ns.values.map(math.min(_, lmax)).sum
    var rem = b - spend
    val capped = ns.filter(_._2 > lmax).keys.toSeq.sorted
    val plus = capped.take(rem.toInt).toSet
    ns.map { case (s, n) =>
      s -> (if (n <= lmax) n else lmax + (if (plus(s)) 1L else 0L))
    }
  }

  private def run(ns: Map[String, Long]): Map[String, (Long, Long, Boolean)] = {
    import spark.implicits._
    val docs = ns.toSeq.map { case (s, n) =>
      (s, Seq.fill(n.toInt)("w").mkString(" "))
    }.toDF("source", "text")
    CorpusOps.tokenBudgetAllocation(docs, "source",
        TextOps.cleanTokens(col("text")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
  }

  test("matches the independent water-fill on 25 seeded censuses") {
    val rnd = new scala.util.Random(777)
    (0 until 25).foreach { trial =>
      val k = 2 + rnd.nextInt(7)
      val ns = (0 until k)
        .map(i => f"s$i%02d" -> (1L + rnd.nextInt(60))).toMap
      val got = run(ns)
      val want = reference(ns)
      assert(got.keySet === ns.keySet, s"trial $trial")
      ns.foreach { case (s, n) =>
        val (nt, alloc, capped) = got(s)
        assert(nt === n, s"trial $trial $s")
        assert(alloc === want(s), s"trial $trial $s: $got vs $want")
        assert(alloc >= 0L && alloc <= n, s"trial $trial $s")
        // uncapped ⇒ kept whole (capped CAN hit alloc == n when the
        // remainder token lands on a source with n == L+1)
        if (!capped) assert(alloc === n, s"trial $trial $s kept-whole")
      }
      val total = ns.values.sum
      assert(got.values.map(_._2).sum === math.min(total / 2, total),
        s"trial $trial budget identity")
      // level maximality: if anything was capped, L+1 must overshoot
      val cappedAllocs = got.collect { case (_, (_, a, true)) => a }
      if (cappedAllocs.nonEmpty) {
        val l = cappedAllocs.min // ≥1 capped source got no remainder token iff rem < #capped; min is L or L+1==L only if rem==capped — rem < denom always, so min IS L
        assert(ns.values.map(math.min(_, l + 1)).sum > total / 2,
          s"trial $trial level not maximal")
      }
    }
  }

  test("uncapped sources are kept whole; capped flags match the level") {
    val ns = Map("a" -> 5L, "b" -> 10L, "c" -> 40L, "d" -> 45L)
    // total 100, budget 50: keep a(5)+b(10)=15, level the rest:
    // 50-15=35 over 2 capped → L=17 rem 1 → c gets 18, d gets 17
    val got = run(ns)
    assert(got("a") === ((5L, 5L, false)))
    assert(got("b") === ((10L, 10L, false)))
    assert(got("c") === ((40L, 18L, true)))
    assert(got("d") === ((45L, 17L, true)))
  }
}
