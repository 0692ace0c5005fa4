package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.BitmapDistinctCount

/** Custom bitmap TypedImperativeAggregate vs built-in countDistinct. */
class BitmapDistinctSpec extends AnyFunSuite with SparkSessionFixture {

  test("bitmap distinct == countDistinct per group on real events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      // many input partitions → partial buffers must merge correctly
      .repartition(8)
    val both = ev.groupBy(col("event_type"))
      .agg(
        BitmapDistinctCount(col("user_id"), 1 << 20).as("bm"),
        countDistinct(col("user_id")).as("cd"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("nulls ignored; empty group counts zero; global aggregate works") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "a"), (Some(5L), "a"), (None, "a"),
      (None, "b"))
      .toDF("id", "g")
    val rows = df.groupBy(col("g"))
      .agg(BitmapDistinctCount(col("id"), 64).as("n"))
      .orderBy("g").collect()
    assert(rows(0).getLong(1) == 2L) // {1, 5}
    assert(rows(1).getLong(1) == 0L) // only null
    val total = df.agg(BitmapDistinctCount(col("id"), 64)).head().getLong(0)
    assert(total == 2L)
  }

  test("out-of-domain id fails loudly instead of corrupting the count") {
    import spark.implicits._
    val df = Seq(100L).toDF("id")
    val ex = intercept[Exception] {
      df.agg(BitmapDistinctCount(col("id"), 64)).collect()
    }
    assert(ex.getMessage != null)
  }
}
