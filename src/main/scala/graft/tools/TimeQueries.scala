package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm per-query timing: runs each named query `reps` times in one
  * session and prints every pass, separating JVM/codegen warmup from
  * steady-state cost (the per-round bench charges warmup to whichever
  * query runs first; this tool answers "is it the query or the VM").
  * Usage: runMain graft.tools.TimeQueries q1,q2 [reps] */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("d5_embed_neardup"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.scorer(spark)
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        println(f"TIMEQ $n pass$r $dt%.3f")
      }
    }
    spark.stop()
  }
}
