package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-scorer throughput micro-bench against BASELINE.md's
  * engine-side target (≥10⁴ docs/s/core for the m5 chain: clean →
  * tokenize → stop words → TF·IDF·LR over the frozen 262k-term
  * model). The per-round bench can't see this — m5 at sf0.1 is 5k
  * docs and wall-clock is planning/startup — so this tool replicates
  * the sf0.1 corpus to ~`nDocs` rows, CACHES the input (the scan and
  * replication are not the thing measured), runs one warm-up pass,
  * then times scoring passes alone through the noop sink and reports
  * docs/s and docs/s/core. Usage:
  *   runMain graft.tools.ScoreThroughput [nDocs] [passes]
  * Record the best pass in SURVEY §6 with this harness named. */
object ScoreThroughput {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scorer = graft.SparkEntry.scorer(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("text")
    val base = docs.count()
    val mult = math.max(1L, nDocs / base)
    val big = docs
      .withColumn("__r", explode(sequence(lit(1L), lit(mult))))
      .select(col("text"))
      .repartition(cores * 4) // even task sizes; replication is skewless
      .persist()
    val n = big.count() // materialize the cache outside the timed region
    println(s"SCORE_THROUGHPUT input: $n docs (${base} x $mult), $cores cores")
    for (p <- 0 to passes) {
      val t0 = System.nanoTime()
      scorer.scoreText(big, "text")
        .select("prediction")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val tag = if (p == 0) "warmup" else s"pass$p"
      println(f"SCORE_THROUGHPUT $tag t=$dt%.2fs docs_per_s=${n / dt}%.0f " +
        f"per_core=${n / dt / cores}%.0f")
    }
    big.unpersist()
    spark.stop()
  }
}
