package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Scratch stage-timing for the d4 near-dup pipeline (not part of the
  * driver contract): times each stage in isolation so optimization
  * effort lands where the seconds are. */
object TimeD4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[timed] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      System.gc()
    }

    time("scan_only")(docs.select(col("doc_id"), length(col("text")).as("l")))
    time("trigrams")(docs.select(col("doc_id"),
      size(DedupOps.charTrigrams(col("text"))).as("n")))
    time("trigrams+hash")(docs.select(col("doc_id"),
      size(graft.plans.Md5Hash32Array(DedupOps.charTrigrams(col("text")))).as("n")))
    time("signature")(DedupOps.withMinhashSignature(docs, "doc_id", "text"))
    time("cand_pairs")(DedupOps.minhashCandidatePairs(docs, "doc_id", "text"))
    time("full_d4")(DedupOps.nearDuplicatePairs(docs, "doc_id", "text", 0.6))
    // second run: JIT+page-cache warm
    time("full_d4_warm")(DedupOps.nearDuplicatePairs(docs, "doc_id", "text", 0.6))
    spark.stop()
  }
}
