package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKRows

/** Unit specs for the bounded-state top-k aggregate. */
class TopKRowsSpec extends AnyFunSuite with SparkSessionFixture {

  private def topk(rows: Seq[(String, Double, Long)], k: Int,
                   parts: Int): Seq[(String, Long, Double)] = {
    import spark.implicits._
    rows.toDF("g", "v", "id").repartition(parts)
      .groupBy(col("g"))
      .agg(TopKRows.of(col("v"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("r"))
      .select(col("g"), col("r.id"), col("r.ord"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(x => (x._1, -x._3, x._2))
  }

  test("matches the window row_number spelling on any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(500)(
      (s"g${rnd.nextInt(4)}", rnd.nextInt(50).toDouble, rnd.nextLong().abs))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val expect = rows.toDF("g", "v", "id")
      .select(col("g"), col("v"), col("id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(1)))
      .toSeq.sortBy(x => (x._1, -x._3, x._2))
    for (parts <- Seq(1, 7, 32)) {
      assert(topk(rows, 5, parts) == expect, s"parts=$parts")
    }
  }

  test("equal ord values tie-break on the smaller id") {
    val got = topk(Seq(("g", 1.0, 9L), ("g", 1.0, 3L), ("g", 1.0, 7L)), 2, 3)
    assert(got == Seq(("g", 3L, 1.0), ("g", 7L, 1.0)))
  }

  test("null inputs are skipped; k larger than the group returns all") {
    import spark.implicits._
    val df = Seq(
      ("g", Some(2.0), Some(1L)),
      ("g", None, Some(2L)),
      ("g", Some(5.0), None),
      ("g", Some(1.0), Some(4L))).toDF("g", "v", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKRows.of(col("v"), col("id"), 10).as("top"))
      .select(explode(col("top")).as("r")).select(col("r.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 4L))
  }

  test("NaN ordering values fail loudly, never sort silently") {
    import spark.implicits._
    val df = Seq((Double.NaN, 1L), (1.0, 2L)).toDF("v", "id")
    val e = intercept[Exception] {
      df.groupBy(lit(1)).agg(TopKRows.of(col("v"), col("id"), 2).as("t"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NaN")), e.toString)
  }

  test("SQL registration: top_k_rows usable from spark.sql") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1.0, 1L), (3.0, 2L), (2.0, 3L)).toDF("v", "id")
      .createOrReplaceTempView("tkr_in")
    val got = spark.sql(
      "SELECT top_k_rows(v, id, 2) AS top FROM tkr_in")
      .select(explode(col("top")).as("r")).select(col("r.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L))
  }
}
