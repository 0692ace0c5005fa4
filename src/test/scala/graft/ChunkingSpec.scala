package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Property pins for the chunk family (t15/t16/d15) and SQ8 (s10):
  * the mathematical contracts the oracle hash cannot express —
  * window-count formula, overlap invariant, greedy packing bound,
  * quantization error bound — asserted on the real corpus so a
  * constant or spelling edit that still hash-matches a re-derived
  * oracle cannot silently change the semantics. */
class ChunkingSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  test("t15 windows: count formula, full-window lengths, overlap") {
    val rows = SparkEntry.queries("t15_chunk_windows")(spark, sf)
      .select("doc_id", "chunk_idx", "chunk_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byDoc = rows.groupBy(_._1)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), TextOps.cleanTokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    byDoc.foreach { case (doc, chunks) =>
      val n = toks(doc)
      assert(chunks.length == (n - 1) / TextOps.ChunkStride + 1,
        s"doc $doc: wrong chunk count for n=$n")
      // every chunk's length is exactly the end-clamped window
      chunks.foreach { case (_, ci, len) =>
        val start = ci.toInt * TextOps.ChunkStride
        assert(len == math.min(TextOps.ChunkSize, n - start),
          s"doc $doc chunk $ci: len $len for n=$n start=$start")
      }
    }
    // consecutive full windows overlap by exactly size - stride tokens
    assert(TextOps.ChunkSize - TextOps.ChunkStride == 8)
  }

  test("t16 packing: greedy bound — no sequence exceeds 128 + one chunk") {
    val rows = SparkEntry.queries("t16_chunk_pack")(spark, sf)
      .select("bucket", "seq_id", "chunk_len").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    val bySeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    bySeq.foreach { case (seq, total) =>
      // greedy cumulative assignment: a sequence closes when cum
      // crosses 128, so its total is < 128 + its last chunk's length
      assert(total < 128 + TextOps.ChunkSize, s"sequence $seq holds $total tokens")
    }
    // sequences within a bucket are dense from 0
    rows.groupBy(_._1._1).foreach { case (bucket, rs) =>
      val ids = rs.map(_._1._2).distinct.sorted
      assert(ids.zipWithIndex.forall { case (v, i) => v == i.toLong },
        s"bucket $bucket sequence ids not dense: ${ids.mkString(",")}")
    }
  }

  test("d15 census: every reported fp is genuinely shared by 2+ docs") {
    val census = SparkEntry.queries("d15_chunk_dups")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val windows = SparkEntry.queries("t15_chunk_windows")(spark, sf)
      .select("chunk_fp", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byFp = windows.groupBy(_._1)
    census.foreach { case (fp, nOcc, nDocs, keeper) =>
      val occ = byFp(fp)
      assert(occ.length.toLong == nOcc)
      assert(occ.map(_._2).distinct.length.toLong == nDocs && nDocs >= 2)
      assert(occ.map(_._2).min == keeper)
    }
    // completeness: no shared fp missing from the census
    val shared = byFp.filter(_._2.map(_._2).distinct.length >= 2).keySet
    assert(shared == census.map(_._1).toSet)
  }

  test("s10 SQ8: codes bounded by 127, per-dim error within half a step") {
    val out = SparkEntry.queries("s10_sq8_quantize")(spark, sf)
      .select("vec_id", "vmax_mu", "n_dims", "mean_err_nano").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, vmaxMu, nDims, meanErr) =>
      assert(nDims == 64)
      // floor(x + 0.5) rounding puts every element within half a
      // quantization step: err <= vmax/254 (+1 nano for the floor)
      val bound = (vmaxMu * 1000L) / 254L + 1L // vmax_mu*1e3 = vmax*1e9
      assert(meanErr <= bound,
        s"mean err $meanErr exceeds half-step bound $bound")
    }
  }
}
