package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming SCALE SOAK (round-9 verdict item 8, builder harness, NOT
  * the artifact bench): [[StreamThroughput]] measures steady docs/s on
  * a 5k-doc lookup corpus with a noop sink; this tool stresses the two
  * claims that measurement can't see —
  *
  *  1. a 10× lookup corpus (50k docs broadcast, the d10-scale text
  *     mix) sustains the same scoring-chain throughput, and
  *  2. the JSON FILE SINK's exactly-once contract survives a
  *     checkpoint restart MID-RUN: the query is stopped cold between
  *     micro-batches and restarted on the same checkpoint + output
  *     path, then the committed output (read back through
  *     `_spark_metadata`, the only-committed-files view) must hold
  *     exactly one row per source value — no gaps, no duplicates.
  *
  * The `rate-micro-batch` source is deterministic (value = dense
  * 0..N), so exactly-once is checkable by arithmetic: committed rows
  * == distinct values == max value + 1.
  *
  * Usage: runMain graft.tools.StreamSoak [secsPerLeg] [lutSize]
  * Record results in SURVEY §6 with this harness named. */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val secsPerLeg = args.headOption.map(_.toInt).getOrElse(20)
    val lutSize = args.lift(1).map(_.toInt).getOrElse(50000)
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

    // 10× lookup corpus: sf0.1 documents tiled with a per-copy suffix
    // so the broadcast text mix is lutSize DISTINCT strings, not 5k
    // recycled ones (string interning would shrink the working set)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val texts = Array.tabulate(lutSize)(i =>
      base(i % base.length) + " copytag" + (i / base.length))
    val lut = broadcast(
      spark.createDataFrame(texts.zipWithIndex.toSeq.map {
        case (t, i) => (i.toLong, t)
      }).toDF("i", "text"))

    val ckpt = java.nio.file.Files.createTempDirectory("soak_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("soak_out").toString

    def startQuery() = {
      val src = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000000L)
        .option("numPartitions", cores)
        .load()
        .withColumn("i", pmod(col("value"), lit(texts.length.toLong)))
        .join(lut, "i")
        .select(col("value"), col("text"))
      scorer.scoreText(src, "text")
        .select(col("value"), col("prediction"))
        .writeStream.format("json")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .start()
    }

    def report(leg: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val rates = q.recentProgress.toSeq.map(_.processedRowsPerSecond)
        .filter(r => !r.isNaN && r > 0)
      val steady = rates.drop(rates.size / 3)
      if (steady.nonEmpty)
        println(f"STREAM_SOAK $leg batches=${rates.size} " +
          f"steady_docs_per_s=${steady.sum / steady.size}%.0f " +
          f"per_core=${steady.sum / steady.size / cores}%.0f")
    }

    // leg 1, then a cold stop BETWEEN batches (stop() interrupts the
    // trigger thread; any in-flight batch that missed its sink commit
    // must be re-run on restart without duplicating output)
    val q1 = startQuery()
    Thread.sleep(secsPerLeg * 1000L)
    report("leg1", q1)
    q1.stop()

    // leg 2: same checkpoint, same path — offsets resume
    val q2 = startQuery()
    Thread.sleep(secsPerLeg * 1000L)
    report("leg2", q2)
    q2.stop()
    spark.stop()

    // exactly-once audit through _spark_metadata (committed-only view)
    val spark2 = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark2.sparkContext.setLogLevel("ERROR")
    val got = spark2.read.json(out)
    val agg = got.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("value")).as("distinct_vals"),
      max(col("value")).as("max_val")).head()
    val (rows, dvals, maxV) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    println(s"STREAM_SOAK audit rows=$rows distinct=$dvals expected=${maxV + 1}")
    println(if (rows == dvals && rows == maxV + 1)
      "STREAM_SOAK EXACTLY_ONCE OK"
    else "STREAM_SOAK EXACTLY_ONCE VIOLATED")
    spark2.stop()
  }
}
