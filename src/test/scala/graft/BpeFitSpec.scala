package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.CorpusOps

/** Specs for the iterative BPE vocabulary fit (m14). The hand-computed
  * pins below are engine-independent facts about greedy BPE, so they
  * hold for the DuckDB oracle twin by construction. */
class BpeFitSpec extends AnyFunSuite with SparkSessionFixture {

  private def fit(texts: Seq[String], n: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    CorpusOps.bpeFit(texts.toDF("text"), TextOps.cleanTokens(col("text")), n)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
  }

  test("merges are leftmost-first NON-overlapping within a pass") {
    // one doc, tokens [aaaa, aaaa]: round 1 counts (a,a) 3x per word;
    // the rewrite must produce [aa][aa] (non-overlap), NOT [aa][a][a] —
    // which round 2 exposes: (aa,aa) exists only under the correct
    // rewrite ((aa,a)/(a,a) would win under the overlap bug)
    val got = fit(Seq("aaaa aaaa"), 2)
    assert(got == Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)))
  }

  test("count ties break lexicographically on (lsym, rsym)") {
    // (c,d) and (a,b) both count 1 → (a,b) must win rank 1
    val got = fit(Seq("cd ab"), 1)
    assert(got == Seq((1L, "a", "b", 1L)))
  }

  test("merged symbols cascade into later rounds") {
    // "abab" x3 words: r1 (a,b) cnt 6 → words become [ab][ab];
    // r2 (ab,ab) cnt 3; r3 merges across the doc's second token "ab"
    // with nothing left — rounds stop early and return 2 rows
    val got = fit(Seq("abab abab abab"), 3)
    assert(got.take(2) == Seq((1L, "a", "b", 6L), (2L, "ab", "ab", 3L)))
    // after [abab] every word is a single symbol: no pairs remain, the
    // fit returns fewer rows than requested instead of failing
    assert(got.size == 2)
  }

  test("merge counts are non-increasing (greedy argmax invariant)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = CorpusOps.bpeFit(docs, TextOps.cleanTokens(col("text")), 8)
      .orderBy("merge_rank").collect().map(_.getLong(3)).toSeq
    assert(got.size == 8)
    assert(got.zip(got.tail).forall { case (a, b) => a >= b },
      s"counts increased across rounds: $got")
  }

  test("encode census: hand-computed example") {
    import spark.implicits._
    // "abab ac" x2 docs: r1 merges (a,b) cnt 4 -> words [ab][ab], [a][c];
    // r2 TIES (ab,ab)=2 vs (a,c)=2 and the (l,r) lex tie-break picks
    // (a,c) ("a" < "ab") -> [ab][ab], [ac]. census: ab x4, ac x2
    val got = CorpusOps.bpeEncode(
        Seq("abab ac", "abab ac").toDF("text"),
        TextOps.cleanTokens(col("text")), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("ab" -> 4L, "ac" -> 2L))
  }

  test("encode census conserves characters (merges never drop mass)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextOps.cleanTokens(col("text"))
    val totalChars = docs
      .select(explode(toks).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    val censusChars = CorpusOps.bpeEncode(docs, toks, 8)
      .agg(sum(length(col("sym")) * col("cnt"))).collect()(0).getLong(0)
    assert(censusChars == totalChars,
      s"encoded census covers $censusChars chars, corpus has $totalChars")
  }

  test("encode with zero merges is the per-character census") {
    import spark.implicits._
    val got = CorpusOps.bpeEncode(
        Seq("aab ba").toDF("text"), TextOps.cleanTokens(col("text")), 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L))
  }

  test("encode census survives merge exhaustion (the round-6 oracle fix)") {
    import spark.implicits._
    // "abab abab abab" fully merges after 2 rounds; requesting 8 must
    // return the merged vocab census, not an empty table (the oracle
    // twin's words chain is LEFT JOIN + coalesce for exactly this)
    val got = CorpusOps.bpeEncode(
        Seq("abab abab abab").toDF("text"),
        TextOps.cleanTokens(col("text")), 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("abab" -> 3L))
  }

  test("fit is deterministic across runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = CorpusOps.bpeFit(docs, TextOps.cleanTokens(col("text")), 6)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  /** Greedy BPE reference in plain Scala over a (word, freq) table —
    * same greedy argmax, same (cnt desc, l, r asc) tie-break, same
    * leftmost-first non-overlapping rewrite. Exists to pin the
    * lineage-CHECKPOINTED fit loop (re-materialization every 16
    * merges) value-identical to unchunked greedy BPE at a depth that
    * crosses several checkpoint boundaries. Matches the engine's
    * semantics exactly, not just on ASCII (r10 advice): words split
    * into CODE POINTS (Java regex `.` matches a surrogate pair as one
    * char, so the engine's per-char wrap is code-point-granular),
    * words containing the U+001F wrap separator are dropped like
    * bpeFitCore drops them, and ties break on UTF-8 BYTE order (Spark
    * compares UTF8String bytes, which diverges from Java String
    * UTF-16 ordering for supplementary-plane symbols). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
  private def referenceBpe(wordFreqs: Seq[(String, Long)], nMerges: Int)
      : Seq[(Long, String, String, Long)] = {
    var words = wordFreqs
      .filter { case (w, _) => !w.contains('\u001f') }
      .map { case (w, f) =>
        (w.codePoints().toArray.toList.map(Character.toString), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1L
    var done = false
    while (k <= nMerges && !done) {
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        cnt((syms(i), syms(i + 1))) = cnt.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (cnt.isEmpty) done = true
      else {
        val ((l, r), c) = cnt.toSeq.reduceLeft { (a, b) =>
          // (cnt desc, l asc, r asc) with UTF-8 byte-order string ties
          val ((al, ar), ac) = a; val ((bl, br), bc) = b
          val bWins =
            bc > ac || (bc == ac && (utf8Lt(bl, al) ||
              (bl == al && utf8Lt(br, ar))))
          if (bWins) b else a
        }
        out += ((k, l, r, c))
        words = words.map { case (syms, f) =>
          val b = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.toList, f)
        }
        k += 1
      }
    }
    out.toSeq
  }

  test("64-merge fit crosses 3 lineage checkpoints value-identically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextOps.cleanTokens(col("text"))
    // word freqs via the SAME tokenizer, so the reference isolates the
    // merge loop (the checkpointed code path) and nothing else
    val wf = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = referenceBpe(wf, 64)
    val got = CorpusOps.bpeFit(docs, toks, 64)
      .orderBy("merge_rank").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got.size == want.size)
    assert(got == want)
  }

  test("batched merge selection equals sequential greedy on tie-heavy corpora") {
    // r16 batches top-R pair selection per Spark job (the 32k-merge
    // driver ceiling). Equality with per-merge argmax rests on the
    // disjoint-prefix/truncate/tie-group rules in bpeFitCore —
    // adversarial inputs here are TINY alphabets, where nearly every
    // count ties and most candidates conflict: the worst case for
    // batch acceptance and the easiest place for a tie-hazard bug to
    // change the merge sequence. The reference is the independent
    // plain-Scala sequential implementation above.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 6) {
      val alphabet = Seq("ab", "abc", "abcd")(trial % 3)
      val texts = (0 until 40).map { _ =>
        (0 until (2 + rnd.nextInt(5))).map { _ =>
          (0 until (1 + rnd.nextInt(6)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val docs = texts.toDF("text")
      val toks = TextOps.cleanTokens(col("text"))
      val wf = docs.select(explode(toks).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = referenceBpe(wf, 12)
      val got = CorpusOps.bpeFit(docs, toks, 12)
        .orderBy("merge_rank").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got == want, s"trial $trial (alphabet $alphabet): $got != $want")
    }
  }

  test("checkpointing bounds the encode vocabulary's analyzed plan size") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextOps.cleanTokens(col("text"))
    def planNodes(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.analyzed.foreach(_ => n += 1)
      n
    }
    // 64 merges checkpoint at 16/32/48: the encode plan hangs at most
    // 16 merge-rewrite projections off a LogicalRDD leaf. Without the
    // checkpoints this plan carries all 64 plus the full base aggregate
    // (>70 nodes); the bound fails loudly if the cadence regresses.
    val encoded = CorpusOps.bpeEncode(docs, toks, 64)
    assert(planNodes(encoded) < 40,
      s"analyzed plan has ${planNodes(encoded)} nodes — checkpoint cadence lost?")
  }
}
