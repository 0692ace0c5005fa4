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

  test("saltedEquiJoinHot: plain-join result; only detected-hot keys replicate") {
    import spark.implicits._
    // key 1 carries 90% (hot at any sane share); keys 2..101 one row
    // each (cold — far under the 1/128 default)
    val large = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i - 899).toLong + 1L, s"v$i"))
      .toDF("k", "payload")
    val small = (1 to 120).map(i => (i.toLong, s"d$i")).toDF("k", "dim")

    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val hot = SkewOps.saltedEquiJoinHot(large, small, "k", saltFactor = 8)
      .select("k", "payload", "dim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(hot.toSeq == plain.toSeq)

    // no hot key at all (uniform) must also reproduce the plain join
    // through the all-cold salt-0 path
    val uniform = (1 to 200).map(i => (i.toLong, s"u$i")).toDF("k", "payload")
    val plainU = uniform.join(small, Seq("k")).count()
    val hotU = SkewOps
      .saltedEquiJoinHot(uniform, small, "k", saltFactor = 4).count()
    assert(hotU == plainU)
  }
}
