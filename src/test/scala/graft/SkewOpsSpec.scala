package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Salted-join specs. Note on the per-row salt disambiguator
  * (`monotonically_increasing_id`, r17): these tests feed the salted
  * side from deterministically-ordered sources (local relations /
  * file scans), which is the operator's documented contract — a
  * nondeterministically-ordered shuffle input could see
  * retry-divergent salts (see the SkewOps scaladoc's SPARK-38388
  * caveat, r17 advice / r18). Salt-invariance of the OUTPUT is what
  * the equality tests below pin. */
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

  test("saltedEquiJoinHot on an EMPTY large side returns empty, not NPE") {
    // r16 advice: sum over zero rows is NULL — the detection pull must
    // coalesce, matching the plain join's empty result
    import spark.implicits._
    val large = Seq.empty[(Long, String)].toDF("k", "payload")
    val small = Seq((1L, "d")).toDF("k", "dim")
    assert(SkewOps.saltedEquiJoinHot(large, small, "k", 8).count() == 0L)
    assert(SkewOps.saltedEquiJoin(large, small, "k", 8).count() == 0L)
  }

  test("fully identical duplicate rows of a hot key still spread across salts") {
    // r16 advice: a content-only salt lands every identical row of a
    // hot key on ONE salt — the per-row disambiguator must spread them
    import spark.implicits._
    val large = (1 to 2000).map(_ => (1L, "same payload")).toDF("k", "payload")
    val small = Seq((1L, "dim")).toDF("k", "dim")
    for (join <- Seq(
        SkewOps.saltedEquiJoin(large, small, "k", 8),
        SkewOps.saltedEquiJoinHot(large, small, "k", 8))) {
      assert(join.count() == 2000L) // result still the plain join
    }
    // inspect the spread directly with the operator's salt spelling
    val spread = large.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload"),
          monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(spread == 8L, "identical rows collapsed onto one salt")
  }
}
