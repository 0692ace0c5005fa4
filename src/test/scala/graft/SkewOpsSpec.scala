package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends AnyFunSuite with SparkSessionFixture {

  test("saltedEquiJoin returns exactly the plain equi-join result on skewed data") {
    import spark.implicits._
    // heavily skewed: 90% of rows share key 1
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (9999L, "unmatched"))
      .toDF("k", "dim")

    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewOps.saltedEquiJoin(large, small, "k", saltFactor = 8)
      .select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted

    assert(salted.length == 901) // 900 hot + 1 cold
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt actually spreads the hot key across buckets") {
    import spark.implicits._
    val large = (1 to 1000).map(i => (1L, s"v$i")).toDF("k", "payload")
    val nBuckets = large.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("__salt").distinct().count()
    assert(nBuckets == 8L)
  }
}
