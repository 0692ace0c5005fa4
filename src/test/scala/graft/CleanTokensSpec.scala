package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** The fused clean+tokenize scanner (graft.plans.CleanTokens) must be
  * BYTE-EQUAL to the literal regex chain
  * (`filter(split(regexp_replace(lower(trim(s)), CleanRegex, ""),
  * "\\s+"), len > 0)`) — every oracle in the suite derives from that
  * spelling. Pins: hand-picked adversarial semantics, randomized
  * fuzzing over a URL/unicode/control-char alphabet, and the full
  * real corpus at two SFs. */
class CleanTokensSpec extends AnyFunSuite with SparkSessionFixture {

  private def both(texts: Seq[String]): Seq[(String, Seq[String], Seq[String])] = {
    import spark.implicits._
    texts.toDF("text")
      .select(col("text"),
        TextOps.cleanTokensReference(col("text")).as("ref"),
        TextOps.cleanTokens(col("text")).as("fused"))
      .as[(String, Seq[String], Seq[String])]
      .collect().toSeq
  }

  private def assertAllEqual(texts: Seq[String]): Unit =
    both(texts).foreach { case (t, ref, fused) =>
      assert(fused == ref,
        s"divergence on ${t.map(c => f"\\u${c.toInt}%04x").mkString} " +
          s"(${t.take(80)}): ref=$ref fused=$fused")
    }

  test("hand-picked adversarial semantics match the regex chain") {
    val cases = Seq(
      "Hello, World! 123",
      "  padded   with\tspaces  ",
      "ca:t joins",                    // deletion joins fragments
      "check http://foo.com/bar next", // URL swallowed to whitespace
      "http",                          // bare http: \S+ unsatisfied, kept
      "http ",
      "httpx",                         // http + >=1 \S: all deleted
      "ahttpx b",                      // match starts mid-word
      "hhttp x",                       // failed match at inner position
      "httphttp",
      "www x",                         // `.` matches the SPACE
      "www\nx",                        // `.` refuses \n
      "www\rx",
      "wwwa",                          // `.`='a' but \S+ empty: kept
      "wwwab",                         // deleted whole
      "www.example.com trailing",
      "wwww.deep.url x",
      "na\u00efve caf\u00e9",          // non-ASCII deletes and joins
      "www\u2028x",               // `.` refuses U+2028; joins to wwwx
      "www\u0085x",               // `.` refuses U+0085
      "www\u2029x",               // `.` refuses U+2029
      "www\u00e9x",               // `.` matches e-acute, \S+ = "x"
      "www\u00e9",                // `.` matches e-acute, \S+ empty: kept
      "emoji \ud83d\ude00 inside",     // supplementary plane deletes
      "www\ud83d\ude00x y",            // `.` matches the emoji code point
      "www\ud83d\ude00",               // `.` = emoji, \S+ empty: kept
      "tab\there",
      "digits123between",
      "UPPER Case MiXeD",
      "\n\nnewlines\n\n",
      "",
      " ",
      "\r",
      "x" * 5000,                      // long single token
      ("word " * 2000).trim)           // many tokens
    assertAllEqual(cases)
  }

  test("randomized fuzzing over a URL-heavy alphabet") {
    val rnd = new scala.util.Random(0x8c1ea7)
    val atoms = Array(
      "a", "b", "z", "Q", " ", "  ", "\n", "\t", "\r", ".", ":", "/",
      "http", "www", "ws", "1", "9", ",", "é", "ß",
      "\u2028", "\u0085", "\ud83d\ude00", "\u4e2d", "-", "_", "%", "x")
    val texts = (0 until 4000).map { _ =>
      val len = rnd.nextInt(24)
      (0 until len).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }.distinct
    assertAllEqual(texts)
  }

  test("multi-byte boundary enumeration around the url markers") {
    // round-9 breadth (r8 verdict item): the scanner's risky seam is
    // a marker (`www`/`http`) abutting a code point whose UTF-8/
    // UTF-16 width differs — 4-byte emoji (surrogate pair), 3-byte
    // CJK, 2-byte Latin-1, and the non-ASCII line terminators `.`
    // refuses (U+0085/U+2028/U+2029). Enumerate the FULL cartesian
    // of prefix × marker × boundary × suffix instead of sampling:
    // every case byte-equal against the regex chain.
    val emoji = "😀" // U+1F600, 4-byte UTF-8
    val prefixes = Seq("", "a", " ", "é", "中", emoji)
    val markers = Seq("www", "http", "ww", "htt", "wwww", "xhttp")
    val boundaries = Seq("", "", " ", " ", "\n", "\r",
      emoji, "é", "中", ".", " ", emoji + emoji)
    val suffixes = Seq("", "x", emoji, "é x", " y")
    val cases = for {
      p <- prefixes; m <- markers; b <- boundaries; s <- suffixes
    } yield p + m + b + s
    assertAllEqual(cases.distinct)
  }

  test("randomized multi-byte boundary fuzzing (markers + wide code points)") {
    val rnd = new scala.util.Random(0x9b0a2d)
    val emoji = Array("😀", "🤖", "𐀀")
    val atoms = Array(
      "www", "http", "w", "h", "t", "p",
      "", " ", " ", "\n", "\r", " ", ".",
      "é", "ß", "中", "ア",
      emoji(0), emoji(1), emoji(2), "x", "")
    val texts = (0 until 4000).map { _ =>
      val len = 1 + rnd.nextInt(10)
      (0 until len).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }.distinct
    assertAllEqual(texts)
  }

  test("full real corpus equivalence at sf0.01 and sf0.1") {
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val diverged = docs
        .select(TextOps.cleanTokensReference(col("text")).as("ref"),
          TextOps.cleanTokens(col("text")).as("fused"))
        .filter(not(col("ref") === col("fused")))
        .count()
      assert(diverged == 0L, s"$sf: $diverged documents diverge")
    }
  }

  test("clean_tokens is SQL-registered and equals the Column spelling") {
    GraftExtensions.register(spark)
    import spark.implicits._
    spark.createDataset(Seq("Check http://x.io then ca:t www ok"))
      .toDF("text").createOrReplaceTempView("ct_sql")
    val viaSql = spark.sql(
      "SELECT clean_tokens(lower(trim(text))) AS toks FROM ct_sql")
      .as[Seq[String]].collect().head
    val viaCol = spark.table("ct_sql")
      .select(TextOps.cleanTokensReference(col("text")).as("toks"))
      .as[Seq[String]].collect().head
    assert(viaSql == viaCol)
  }

  test("fused scanner stays inside whole-stage codegen") {
    // parquet-backed: a local relation would constant-fold the whole
    // projection into a LocalTableScan and prove nothing
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextOps.cleanTokens(col("text")).as("toks"))
    df.collect()
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(wsc.exists(_.toString.contains("clean_tokens")),
      df.queryExecution.executedPlan.toString)
  }
}
