package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.CorpusOps

/** t41 (token-budget shard manifest) — the operator invariants the
  * corpus oracle states only implicitly, checked on synthetic
  * censuses where the expected layout is computable by the NAIVE
  * global-window spelling in-test:
  *
  *  - bucketed two-offset assignment == naive global cumulative sum
  *    (the same proof shape as t39: distributed prefix == global
  *    prefix, here over a measure);
  *  - shards partition the position line contiguously and exactly;
  *  - doc-atomicity bounds overflow: every shard's token mass stays
  *    below target + its own largest doc (the greedy-fill guarantee).
  */
class ShardManifestSpec extends AnyFunSuite with SparkSessionFixture {

  private val target = 100L

  private def docs(n: Int) = {
    import spark.implicits._
    // token counts vary 1..40 deterministically; text = that many words
    (0 until n).map { i =>
      val toks = 1 + (i * 17 + 5) % 40
      (i.toLong, Seq.fill(toks)("w").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def naive(n: Int) = {
    val key = md5(concat(lit("s:"), col("doc_id").cast("string")))
    val w = Window.orderBy(col("_k"), col("doc_id"))
    docs(n).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("_n"), key.as("_k"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .withColumn("cumb", sum(col("_n")).over(w) - col("_n"))
      .withColumn("shard_id", expr(s"cumb div ${target}L"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("n_tokens"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))
  }

  private def got(n: Int) =
    CorpusOps.shardManifest(docs(n), "doc_id",
      split(col("text"), " "), seed = "s", targetTokens = target)

  test("bucketed assignment == naive global cumulative-sum spelling") {
    for (n <- Seq(1, 7, 250)) {
      val g = got(n).orderBy("shard_id").collect().map(_.toSeq)
      val w = naive(n).orderBy("shard_id").collect().map(_.toSeq)
      assert(g.toSeq === w.toSeq, s"n=$n")
    }
  }

  test("shards tile the position line; totals conserved") {
    val rows = got(250).orderBy("shard_id").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 250L)
    // contiguous, non-overlapping, covering 0..n-1
    assert(rows.head.getAs[Long]("first_pos") === 0L)
    assert(rows.last.getAs[Long]("last_pos") === 249L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("last_pos") + 1L === b.getAs[Long]("first_pos"))
      assert(a.getAs[Long]("n_docs") ===
        a.getAs[Long]("last_pos") - a.getAs[Long]("first_pos") + 1L)
    }
  }

  test("doc-atomic overflow bound: shard tokens < target + max own doc") {
    import spark.implicits._
    val perDoc = docs(250).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val key: Long => String = id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val order = perDoc.keys.toSeq.sortBy(id => (key(id), id))
    // recompute membership independently, then bound each shard
    var cum = 0L
    val byShard = order.map { id =>
      val s = cum / target; cum += perDoc(id); (s, perDoc(id))
    }.groupBy(_._1)
    val manifest = got(250).collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(manifest.keySet === byShard.keySet)
    byShard.foreach { case (s, members) =>
      val toks = members.map(_._2)
      assert(manifest(s) === toks.sum)
      assert(toks.sum < target + toks.max,
        s"shard $s exceeds the doc-atomic overflow bound")
    }
  }
}
