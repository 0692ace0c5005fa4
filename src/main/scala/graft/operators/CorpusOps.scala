package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level text statistics — the training-side aggregations the
  * reference froze into its model artifacts (CountVectorizer corpus
  * vocabulary, IDF document frequencies; SURVEY.md §2c-2f note), made
  * first-class so the engine can re-fit them:
  * one shuffle on term (hash partitioned, map-side combine), document
  * counts via a broadcast 1-row cross join.
  */
object CorpusOps {

  /** Per-term document frequency + smoothed idf
    * (`ln((N+1)/(df+1))`, Spark ML IDF formula), top `limit` terms by
    * (df desc, term) with a deterministic rank cutoff.
    *
    * The cutoff is `orderBy(...).limit(limit)`, which Spark executes as
    * `TakeOrderedAndProject` — per-partition partial top-k merged on
    * the driver — so the unbounded distinct-term set never funnels
    * through a single-partition sort (a corpus-scale vocabulary is
    * millions of terms; only `limit` rows ever leave the executors). */
  def vocabularyWithIdf(docs: DataFrame, idCol: String, tokens: Column,
                        limit: Int): DataFrame = {
    val total = broadcast(docs.agg(count(lit(1)).as("nd")))
    val dfreq = docs
      .select(col(idCol), explode(array_distinct(tokens)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    dfreq.crossJoin(total)
      .select(col("term"), col("df"),
        round(log((col("nd") + 1).cast("double") / (col("df") + 1)), 6)
          .as("idf"))
      .orderBy(col("df").desc, col("term"))
      .limit(limit)
  }
}
