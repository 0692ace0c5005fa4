package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Shared helpers for the query inventory (table readers, shared
  * expressions). Split out of [[SparkEntry]] (round 6, hygiene item)
  * so the per-family query objects in `graft.queries` can share them;
  * bodies are byte-identical to the pre-split definitions.
  */
private[graft] object QuerySupport {

  // ---- table readers -------------------------------------------------
  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (which Spark's vectorized
    * reader only surfaces as long under the nanosAsLong legacy flag)
    * through round 5, TIMESTAMP(MICROS, isAdjustedToUTC=false) from
    * round 6 — so normalize whatever we find to a microsecond
    * session-tz TimestampType column (the session tz is pinned UTC in
    * Verify/Bench/specs, so the NTZ→LTZ cast is value-preserving and
    * matches DuckDB's naive TIMESTAMP read of the same file). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long: integer div, not double — ns values overflow
        // double's 2^53 mantissa
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        raw // already the normalized session-tz form
      case other =>
        // fail-loudly policy: a THIRD physical-type generation must not
        // flow unnormalized into the time queries and silently diverge
        // from the DuckDB oracle (r6 ADVICE item)
        throw new IllegalStateException(
          s"events.ts has unhandled type $other; extend QuerySupport.events " +
            "for this testdata generation")
    }
  }

  // ---- shared expressions -------------------------------------------
  private[graft] val cleanTokens: Column = TextOps.cleanTokens(col("text"))

  /** Feature projection shared by the LR re-fit family (m7 fit,
    * m10 AUC evaluation): is-English target, bias, scaled token count,
    * type/token ratio, scaled char count. */
  private[graft] val LrFitCols = Seq("xb", "x1", "x2", "x3")
  /** The single LR feature projection m7/m10/m16 share (edit here and
    * the oracle `d` CTE together). */
  private[graft] val lrFeatureProj: Seq[Column] = Seq(
    when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
    lit(1.0).as("xb"),
    (size(cleanTokens).cast("double") / lit(100.0)).as("x1"),
    coalesce(size(array_distinct(cleanTokens)).cast("double") /
      nullif(size(cleanTokens), lit(0)), lit(0.0)).as("x2"),
    (col("n_chars").cast("double") / lit(1000.0)).as("x3"))

  private[graft] def lrFitFeatures(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(lrFeatureProj: _*)

  /** m16's split view: the same features plus the two deterministic
    * md5 residues — `r` (mod 4; 0 = held-out eval fold) and `sub`
    * (mod 100; orders the train pool so frac-% subsamples nest). */
  private[graft] def lrFitFeaturesSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(lrFeatureProj ++ Seq(
      pmod(graft.operators.DedupOps.md5Hash32(col("doc_id").cast("string")),
        lit(4)).as("r"),
      pmod(graft.operators.DedupOps.md5Hash32(
        concat(col("doc_id").cast("string"), lit(":m16"))),
        lit(100)).as("sub")): _*)

  /** Marker-word language prediction over [[cleanTokens]] — THE
    * heuristic; the single definition t3, m12, and m13 all consume
    * (edit here and the CTE twin together, or the oracle parity of
    * all three silently breaks). */
  private[graft] lazy val langPredCol: Column = {
    val toks = cleanTokens
    def score(words: Seq[String]): Column =
      size(filter(toks, w => w.isInCollection(words)))
    val sEn = score(LangMarkers.en); val sDe = score(LangMarkers.de)
    val sEs = score(LangMarkers.es); val sFr = score(LangMarkers.fr)
    val g = greatest(sEn, sDe, sEs, sFr)
    when(g === 0, "und")
      .when(sEn === g, "en").when(sDe === g, "de")
      .when(sEs === g, "es").otherwise("fr")
  }

  /** (actual, predicted, count) confusion matrix of the t3 lang-ID
    * heuristic — shared by m12 (raw matrix) and m13 (per-class PRF). */
  private[graft] def langConfusion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), langPredCol.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
}

/** Marker-word profiles for the language-ID heuristic. */
private[graft] object LangMarkers {
  val en = Seq("the", "and", "is", "of", "to", "in", "that", "it")
  val de = Seq("der", "die", "und", "ist", "das", "nicht", "ein", "zu")
  val es = Seq("el", "los", "es", "y", "que", "de", "una", "por")
  val fr = Seq("le", "les", "est", "et", "dans", "une", "pour", "sur")
}
