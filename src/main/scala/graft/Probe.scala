package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan/perf probe (not part of the driver contract): prints
  * formatted physical plans for the headline queries so pushdown,
  * broadcast choices, and codegen spans can be audited. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join_topn", "p4_clean_tokenize", "d2b_minhash_pairs",
               "d5_embed_neardup", "s1_ann_topk", "m5_sentiment", "q5_time_window")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
