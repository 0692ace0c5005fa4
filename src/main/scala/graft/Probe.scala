package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"

    def time(label: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = f
        println(f"[probe] $label#$i rows=$c in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    // pure in-memory shuffle — no parquet involved
    time("range_shuffle")(spark.range(1000).groupBy(expr("id % 5")).count().count())
    // parquet scan, no shuffle
    val raw = spark.read.parquet(s"$dir/events.parquet")
    time("raw_count")(raw.count())
    // parquet scan + shuffle
    time("grp_type")(raw.groupBy(col("event_type")).count().count())
    spark.stop()
  }
}
