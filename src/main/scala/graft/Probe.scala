package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val d4 = SparkEntry.queries("d4_ngram_jaccard")
    time("d4_count") { d4(spark, dir).count(): Unit }
    time("d4_coalesce1_write") {
      d4(spark, dir).coalesce(1).write.mode("overwrite").parquet("/tmp/probe_d4")
    }
    time("d4_write_nocoalesce") {
      d4(spark, dir).write.mode("overwrite").parquet("/tmp/probe_d4b")
    }
    spark.stop()
  }
}
