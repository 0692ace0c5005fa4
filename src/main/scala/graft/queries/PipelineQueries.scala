package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, MapType, StringType}

import graft.{LangMarkers, SparkEntry}
import graft.QuerySupport._
import graft.functions.TextOps
import graft.operators.{CorpusOps, DedupOps, DetParams, GraphOps, SimilarityOps, SketchOps}

/** Reference ETL/ML pipeline surface (SURVEY.md §2a/2b/2g): the
  * p-, f-, and m1–m5 operator chain of the reference consumer.
  *
  * Split from [[graft.SparkEntry]] (round 6, hygiene item): entry
  * bodies are byte-identical to the pre-split map; QueryRegistrySpec
  * proves family disjointness and exact oracle key coverage.
  */
private[graft] object PipelineQueries {
  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // == reference operator surface (SURVEY.md §2a/2b/2g) ==

    // P1: binary→string cast projection (Kafka `CAST(value AS STRING)`)
    "p1_cast_project" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        decode(encode(col("text"), "UTF-8"), "UTF-8").as("message"))),


    // P2/F2: JSON field decode (from_json / get_json_object)
    "p2_json_decode" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))),


    // P3: null-dropping filter (dropna) — pinned to the computed
    // column so the predicate matches the oracle's `et IS NOT NULL`
    // exactly (a bare .na.drop() would also drop on event_id nulls).
    "p3_null_filter" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          nullif(col("event_type"), lit("click")).as("et"))
        .na.drop(Seq("et"))),


    // P4/F3-F6: clean + tokenize chain (pure built-ins, codegen'd)
    "p4_clean_tokenize" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", cleanTokens).as("toks"))),


    // P5: final narrow projection
    "p5_final_project" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"))),


    // P6: comma scrub (producer-side)
    "p6_comma_scrub" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), TextOps.scrubCommas(col("text")).as("scrubbed"))),


    // F7: JSON encode (producer envelope)
    "f7_json_encode" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        to_json(struct(col("lang").as("message"))).as("payload"))),


    // M1: stop-word removal (181-word English list, case-insensitive)
    "m1_stopwords" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", TextOps.removeStopWords(cleanTokens)).as("words"))),


    // M2: term-frequency as an un-pivoted (doc_id, term, tf) table
    "m2_tf" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(cleanTokens).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))),


    // M2–M5: native 5-stage sentiment scoring (DuckDB oracle scores
    // relationally against the flattened model fixture; the golden
    // corpus + mllib parity specs cross-check in ScalaTest)
    "m5_sentiment" -> ((s, dir) => {
      val sc = SparkEntry.scorer(s)
      sc.scoreText(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("prediction"))
    }),


    // capstone composition — the LLM data-prep pipeline END TO END in
    // one declarative plan: length/token quality gate → exact dedup
    // (min-id per content hash, WindowGroupLimit-pruned) →
    // deterministic 50% hash-residue sample → per-language mix
    // report. Every stage is an operator proven elsewhere (t2, d1,
    // t7, q1-family); the point is that they COMPOSE into a single
    // Catalyst plan with no materialization barriers between stages.
    "p7_prep_pipeline" -> ((s, dir) => {
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
          cleanTokens.as("toks"))
        .filter(col("n_chars").between(100, 5000) && size(col("toks")) >= 10)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .filter(pmod(DedupOps.md5Hash32(col("text")), lit(2)) === 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(size(col("toks")).cast("decimal(18,0)")).cast("double") /
            count(lit(1))).as("avg_tokens"))
    })
  )
}
