package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{ModelLoader, SentimentModel, SentimentScorer}
import graft.queries._

/** Driver contract — flagship entry, per-operator query inventory, and
  * the DuckDB oracle SQL for each SQL-expressible query.
  * Blueprint: SURVEY.md §2 (operator inventory) and §7 (build plan).
  *
  * Conventions for oracle parity (driver hashes values after sorting
  * columns by name):
  *  - every computed column aliased identically in Spark and SQL;
  *  - double-summing avoided: sums go through DECIMAL (exact, order-
  *    independent) and only then to DOUBLE;
  *  - timestamps compared as epoch BIGINT;
  *  - token arrays compared as space-joined strings.
  *
  * The query bodies live in per-family objects under `graft.queries`
  * (split round 6 for maintainability, byte-identical entries); shared
  * readers/expressions in [[QuerySupport]]; oracle SQL in
  * [[OracleQueries]]. QueryRegistrySpec proves the family maps are
  * disjoint and the union's key set equals the oracle map's exactly.
  */
object SparkEntry {

  /** Model artifacts (reference's frozen PipelineModel, read-only). */
  val ModelDir: String =
    sys.env.getOrElse("GRAFT_MODEL_DIR", "/root/reference/pre_trained_model")

  /** Committed model-fixture parquet (flattened vocab/idf/coef tables
    * for the relational m5 oracle; see graft.tools.DumpModelFixture). */
  val FixtureDir: String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/fixtures")

  // model + broadcast scorer cached per JVM (Verify/Bench are one-shot)
  @volatile private var cachedScorer: SentimentScorer = _
  def scorer(s: SparkSession): SentimentScorer = {
    if (cachedScorer == null) synchronized {
      if (cachedScorer == null)
        cachedScorer = SentimentModel.scorer(s, ModelLoader.load(s, ModelDir))
    }
    cachedScorer
  }

  /** Flagship query (driver smoke-checks rows > 0 on sf0.001):
    * scan documents → clean/tokenize → stop words → native 5-stage
    * sentiment scoring → aggregate sentiment mix per language. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = QuerySupport.t(spark, "/root/testdata/sf0.001", "documents")
    scorer(spark).scoreText(docs, "text")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("prediction")).as("n_negative"),
        avg(size(col("cleaned_data"))).as("avg_tokens"))
      .orderBy(col("lang"))
  }

  // ---- query inventory ----------------------------------------------
  /** All family maps, in the registry order QueryRegistrySpec pins. */
  private[graft] val families: Seq[(String, Map[String, (SparkSession, String) => DataFrame])] =
    Seq(
      "PipelineQueries"   -> PipelineQueries.defs,
      "RelationalQueries" -> RelationalQueries.defs,
      "SketchGraphQueries" -> SketchGraphQueries.defs,
      "TextQueries"       -> TextQueries.defs,
      "DedupQueries"      -> DedupQueries.defs,
      "SimilarityQueries" -> SimilarityQueries.defs,
      "TrainEvalQueries"  -> TrainEvalQueries.defs,
      "MediaQueries"      -> MediaQueries.defs)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(_._2).reduce(_ ++ _)

  // ---- oracle SQL ----------------------------------------------------
  /** One DuckDB twin per query — the full map lives in
    * [[OracleQueries]] (moved for maintainability, byte-identical). */
  def oracleSql: Map[String, String] = OracleQueries.all
}
