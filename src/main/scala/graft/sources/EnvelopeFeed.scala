package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** Producer-side twin of the reference's ingest path
  * (`producer.py:31-54`): turn a stream of raw texts into the JSON
  * envelope wire format `{"message": <text>}` and feed it where the
  * consumer's source tails.
  *
  * The reference publishes to Kafka (`producer.send`,
  * `producer.py:15,39-42`); with no Kafka broker in this environment
  * the feed writes newline-delimited envelope files that
  * [[StreamPipeline.fromJsonFileSource]] tails — the producer/consumer
  * contract (envelope schema, comma scrub) is byte-identical, so a
  * Kafka sink/source pair drops in with zero change to either side.
  */
object EnvelopeFeed {

  /** Envelope a text column (comma scrub + JSON encode — P6/F7). */
  def enveloped(df: DataFrame, textCol: String): DataFrame =
    df.select(StreamPipeline.envelope(col(textCol)).as("value"))

  /** Batch-write one "wave" of envelope lines into `dir` (one file per
    * partition, append) — the file-source twin of a Kafka publish. */
  def publishWave(df: DataFrame, textCol: String, dir: String): Unit =
    enveloped(df, textCol).write.mode("append").text(dir)

  /** Deterministic demo feed drawn from the documents testdata. */
  def fromDocuments(spark: SparkSession, sfDir: String, limit: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .orderBy("doc_id").limit(limit)
}
