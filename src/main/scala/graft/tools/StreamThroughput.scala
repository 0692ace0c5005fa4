package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** STREAMING scorer throughput micro-bench — the reference's own
  * headline metric shape (BASELINE.md: 92 msg/s sustained through
  * the Kafka→clean→tokenize→TF·IDF·LR→sink loop on the author's
  * laptop). The rate source feeds corpus texts (broadcast lookup
  * table joined on `value % n` — codegen'd, no UDF, no typed-map
  * boundary) through the SAME native scoring chain the streaming
  * pipeline runs, into the noop sink under the default
  * as-fast-as-possible trigger; `rate-micro-batch` pins every batch
  * at exactly 1M rows (always ready — no wall-clock pacing), so
  * `processedRowsPerSecond` measures the PIPELINE, not the feed.
  * Reports per-batch and steady-state docs/s (mean of batches after
  * the first third) with per-core figures. Usage:
  *   runMain graft.tools.StreamThroughput [seconds] [lutSize]
  * Builder harness only (NOT the artifact bench); record results in
  * SURVEY §6 with this harness named. */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(30)
    val lutSize = args.lift(1).map(_.toInt).getOrElse(5000)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scorer = graft.SparkEntry.scorer(spark)
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").limit(lutSize).collect().map(_.getString(0))
    val lut = broadcast(
      spark.createDataFrame(texts.zipWithIndex.toSeq.map {
        case (t, i) => (i.toLong, t)
      }).toDF("i", "text"))
    val src = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 1000000L)
      .option("numPartitions", cores)
      .load()
      .select(pmod(col("value"), lit(texts.length.toLong)).as("i"))
      .join(lut, "i")
      .select("text")
    val q = scorer.scoreText(src, "text")
      .select("prediction")
      .writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("stream_tp").toString)
      .start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    val rates = progress.map(_.processedRowsPerSecond)
      .filter(r => !r.isNaN && r > 0)
    val steady = rates.drop(rates.size / 3)
    val rows = progress.map(_.numInputRows).sum
    println(s"STREAM_THROUGHPUT batches=${rates.size} rows=$rows cores=$cores")
    if (steady.nonEmpty) {
      val mean = steady.sum / steady.size
      val best = steady.max
      println(f"STREAM_THROUGHPUT steady_docs_per_s=$mean%.0f " +
        f"per_core=${mean / cores}%.0f best_batch=$best%.0f")
    }
    spark.stop()
  }
}
