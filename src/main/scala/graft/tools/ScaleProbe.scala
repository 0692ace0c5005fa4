package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, GraphOps, SimilarityOps}

/** Builder-side 10× SCALE PROBE (round-9 verdict item 7, NOT part of
  * the shipped library): every 100 TB claim in the operator Scaladocs
  * is a plan-shape argument verified at sf0.1 — this tool checks the
  * two scale-critical families EMPIRICALLY one decade up, on a
  * deterministic ~10× corpus built in /tmp.
  *
  * Corpus construction (isolates pure volume scaling):
  *  - documents ×10: copy k caesar-shifts letters by k AND rotates
  *    digits and punctuation by k, and each copy k>0 gets a per-copy
  *    salt token prepended (`translate` + `concat`) whose trigrams
  *    are disjoint across copies (`qKqKqK` — the only trigrams are
  *    `qKq`/`KqK`); copy 0 is the 1× corpus verbatim, so the 10× run
  *    is a strict superset. Copies are thus trigram-disjoint —
  *    including trigrams made purely of whitespace/punctuation, which
  *    a letters-only shift leaves translate-invariant and which would
  *    otherwise grow cross-copy candidate pairs superlinearly on
  *    punctuation-heavy text (r9 advice). The planted near-dup structure replicates exactly per
  *    copy, candidate pair volume scales linearly, and no artificial
  *    10-cliques distort the closure (naive replication would square
  *    the pair count and measure the synthetic, not the scaling).
  *    The salt is one whitespace-delimited token, so it perturbs at
  *    most the first two word-shingles of each copy — planted
  *    within-copy near-dup similarity is preserved to ~1 shingle.
  *  - embeddings ×10: copy k circularly shifts the vector by k
  *    dims — norms preserved, copies decorrelated, within-copy
  *    similarity structure intact.
  *
  * Probes (wall-clock + result cardinality at 1× and 10×):
  *  1. LSH candidate pairs → exact verify → CC closure (the d7/d10
  *     spine). Expect ≈ linear wall growth; pairs ≈ ×10.
  *  2. SemDeDup with cell capacity held CONSTANT by scaling
  *     numCentroids 16 → 160 (the documented capacity/recall knob —
  *     at 100 TB you grow cells with the corpus, never let cell
  *     population grow unbounded). Expect ≈ linear.
  *  3. IVF top-k with a FIXED 100-query broadcast set. Expect ≈
  *     linear in the corpus (the probe side is constant).
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/tmp/graft_scale10"
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    if (!new java.io.File(s"$base/documents").exists()) {
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digits = "0123456789"
      // the trigram shingle alphabet is the RAW text (HashedTrigrams32
      // lowercases but strips nothing), so copies must disagree on
      // every character class that can form a trigram: letters AND
      // digits AND punctuation all rotate by k (r9 advice — a
      // letters-only shift left digit/punct-run trigrams
      // translate-invariant across copies). Whitespace runs are the
      // one residual shared class; a trigram needs 3 consecutive
      // whitespace chars, which the corpus's single-space tokenized
      // text essentially never produces.
      val punct = ".,!?;:'-()\"#@/"
      def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
      val copies = (0 until 10).map { k =>
        val from = lower + upper + digits + punct
        val to = rot(lower, k) + rot(upper, k) + rot(digits, k) + rot(punct, k)
        // per-copy salt token (k>0 only — copy 0 stays the 1× corpus
        // verbatim): shifts the first word-boundary too, so even a
        // hypothetical normalizer that strips punctuation cannot
        // re-align copy prefixes; `qKqKqK` trigrams ({qKq, KqK}) are
        // disjoint across copies
        val salted =
          if (k == 0) col("text")
          else concat(lit(s"q$k" * 3 + " "), translate(col("text"), from, to))
        docs1.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          salted.as("text"))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$base/documents")
      val dim = emb1.select(size(col("embedding"))).head().getInt(0)
      val embCopies = (0 until 10).map { k =>
        val rot = k % dim
        emb1.select(
          (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          concat(slice(col("embedding"), rot + 1, dim - rot),
            slice(col("embedding"), 1, rot)).as("embedding"))
      }
      embCopies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$base/embeddings")
    }
    val docs10 = spark.read.parquet(s"$base/documents")
    val emb10 = spark.read.parquet(s"$base/embeddings")

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def time(what: String)(body: => Long): Unit = {
      sweep()
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $what%-28s ${dt}%8.2fs  rows=$n")
      sweep()
    }

    def closure(d: DataFrame): Long = {
      val (pairs, rel) = DedupOps.nearDuplicatePairsReleasable(
        d, "doc_id", "text", threshold = 0.6)
      val (lab, rel2) = GraphOps.connectedComponentsReleasable(
        pairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
      val n = lab.count()
      rel(); rel2(); n
    }
    def semdedup(d: DataFrame, cents: Int): Long = {
      val (kept, rel) = SimilarityOps.semanticDedupReleasable(
        d, "vec_id", "embedding", numCentroids = cents, minCos = 0.45)
      val n = kept.count()
      rel(); n
    }
    def ivf(corpus: DataFrame): Long =
      SimilarityOps.ivfTopK(corpus, corpus.filter(col("vec_id") < 100),
        "vec_id", "embedding", numCentroids = 16, probes = 4, k = 10)
        .count()

    // 4. PageRank on the q38-shaped bipartite graph (supplier↔customer
    //    via shared orders); ×10 = 10 node-disjoint copies (ids shifted
    //    by k·10⁹ — component structure replicates, iteration count is
    //    fixed at 5, so wall growth isolates pure edge volume).
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"),
        (col("l_suppkey").cast("long") * 2).as("src"))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("ok"),
        (col("o_custkey").cast("long") * 2 + 1).as("dst"))
    val edges1 = li.join(ord, Seq("ok")).select(col("src"), col("dst"))
    val edges10 = (0 until 10).map { k =>
      edges1.select((col("src") + lit(k * 1000000000L)).as("src"),
        (col("dst") + lit(k * 1000000000L)).as("dst"))
    }.reduce(_ unionByName _)
    def pagerank(e: DataFrame): Long = {
      val (ranks, rel) = GraphOps.pageRankReleasable(e, "src", "dst", iters = 5)
      val n = ranks.count(); rel(); n
    }

    // JIT/codegen warmup pass at 1x, uncounted
    closure(docs1); semdedup(emb1, 16); ivf(emb1); pagerank(edges1); sweep()

    time("closure 1x")(closure(docs1))
    time("closure 10x")(closure(docs10))
    time("semdedup 1x (C=16)")(semdedup(emb1, 16))
    time("semdedup 10x (C=160)")(semdedup(emb10, 160))
    time("ivf-topk 1x")(ivf(emb1))
    time("ivf-topk 10x")(ivf(emb10))
    time("pagerank 1x")(pagerank(edges1))
    time("pagerank 10x")(pagerank(edges10))
    spark.stop()
  }
}
