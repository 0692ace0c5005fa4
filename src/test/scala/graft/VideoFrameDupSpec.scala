package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.{MjpegAvi, MultimodalOps}

/** MJPEG-in-AVI frame decode + video near-dup
  * ([[MjpegAvi.mjpegFrames]], [[MultimodalOps.videoFramePHash]],
  * [[MultimodalOps.videoFrameNearDupPairs]]) — the r12 verdict's
  * "real video-frame decode" item. Pins:
  *  - the walker returns JPEG `00dc` payloads in file order, skips
  *    non-JPEG video chunks, recurses into `rec ` lists, honours the
  *    odd-size word pad, and errors (never throws) on non-AVI input
  *    (totality is the fuzz battery's job; the ERROR ROUTING per
  *    payload class is pinned here);
  *  - sampleIndices is deterministic, strictly increasing, first
  *    frame always included;
  *  - the committed fixture decodes to the committed hash table
  *    (video_frame_phash.parquet) — decode determinism;
  *  - the near-dup pair set equals a locally computed all-pairs
  *    slot-aligned rederivation with the same integer fraction gate
  *    (banding completeness + gate semantics), including the planted
  *    REJECT cases (4/8 partial overlap) and the 7/8 re-encode twin.
  */
class VideoFrameDupSpec extends AnyFunSuite with SparkSessionFixture {

  private def fixture = spark.read
    .parquet(s"${SparkEntry.FixtureDir}/media_mjpeg.parquet")

  test("mjpegFrames: frame order, rec nesting, junk-chunk skip, error routing") {
    import spark.implicits._
    val rows = fixture.select("media_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    // 200 (flat) and 240 (rec-wrapped + 2 junk chunks) carry the same
    // 8 JPEG frames — same count, same bytes, same order
    val f200 = MjpegAvi.mjpegFrames(rows(200L)).toOption.get
    val f240 = MjpegAvi.mjpegFrames(rows(240L)).toOption.get
    assert(f200.size === 8)
    assert(f240.size === 8)
    assert(f200.zip(f240).forall { case (a, b) => a.sameElements(b) })
    // every frame is a complete JPEG (SOI..EOI)
    f200.foreach { f =>
      assert((f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8)
      assert((f(f.length - 2) & 0xFF) == 0xFF && (f.last & 0xFF) == 0xD9)
    }
    // 230 carries 24 frames (sampling happens downstream, not here)
    assert(MjpegAvi.mjpegFrames(rows(230L)).toOption.get.size === 24)
    // error routing: junk-frame AVI vs non-AVI container
    assert(MjpegAvi.mjpegFrames(rows(290L)) ===
      Left("no mjpeg frames: no JPEG video chunks in movi"))
    assert(MjpegAvi.mjpegFrames(rows(291L)).swap.toOption.get
      .startsWith("malformed"))
  }

  test("sampleIndices: deterministic even coverage, first frame kept") {
    assert(MjpegAvi.sampleIndices(24, 8) === Vector(0, 3, 6, 9, 12, 15, 18, 21))
    assert(MjpegAvi.sampleIndices(5, 8) === Vector(0, 1, 2, 3, 4))
    assert(MjpegAvi.sampleIndices(8, 8) === Vector(0, 1, 2, 3, 4, 5, 6, 7))
    assert(MjpegAvi.sampleIndices(0, 8) === Vector.empty)
    for (n <- Seq(9, 100, 1000); k <- Seq(1, 3, 8)) {
      val s = MjpegAvi.sampleIndices(n, k)
      assert(s.size === k, s"n=$n k=$k")
      assert(s.head === 0)
      assert(s === s.distinct.sorted, s"n=$n k=$k not strictly increasing")
      assert(s.last < n)
    }
  }

  test("fixture decodes to the committed frame-hash table") {
    import spark.implicits._
    val got = MultimodalOps.videoFramePHash(
        fixture.as[MultimodalOps.MediaRow], maxFrames = 8, dim = 32)
      .filter(_.ok)
      .collect().map(f => (f.media_id, f.frame_idx, f.phash)).toSet
    val committed = spark.read
      .parquet(s"${SparkEntry.FixtureDir}/video_frame_phash.parquet")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === committed)
    // error rows: both planted bad payloads route, neither hashes
    val errs = MultimodalOps.videoFramePHash(
        fixture.as[MultimodalOps.MediaRow], maxFrames = 8, dim = 32)
      .filter(!_.ok).collect()
    assert(errs.map(_.media_id).toSet === Set(290L, 291L))
  }

  test("near-dup pairs equal the all-pairs slot-aligned rederivation") {
    import spark.implicits._
    val hashes = spark.read
      .parquet(s"${SparkEntry.FixtureDir}/video_frame_phash.parquet")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nf = hashes.groupBy(_._1).map { case (id, fs) => id -> fs.length }
    val byKey = hashes.map(h => (h._1, h._2) -> h._3).toMap
    val ids = nf.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      matched = (0 until math.min(nf(a), nf(b))).count { s =>
        (byKey.get(a -> s), byKey.get(b -> s)) match {
          case (Some(ha), Some(hb)) =>
            java.lang.Long.bitCount(ha ^ hb) <= 6
          case _ => false
        }
      }
      if matched * 4 >= 3 * math.min(nf(a), nf(b))
    } yield (a, b, matched.toLong, nf(a).toLong, nf(b).toLong)).toSet

    val got = MultimodalOps.videoFrameNearDupPairs(
        MultimodalOps.videoFramePHash(
          fixture.as[MultimodalOps.MediaRow], maxFrames = 8, dim = 32).toDF(),
        maxDist = 6, minMatchNum = 3, minMatchDen = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)

    // the planted structure materialized as intended: the re-encode
    // twin passes at 7/8 (a slot at distance 8 is allowed to miss),
    // the 4/8 partial overlap is rejected, sampling invariance holds
    val pairSet = got.map(t => (t._1, t._2))
    assert(pairSet.contains((200L, 201L)))
    assert(got.find(t => t._1 == 200L && t._2 == 201L).get._3 === 7L)
    assert(pairSet.contains((200L, 240L)))
    assert(pairSet.contains((230L, 231L)))
    assert(!pairSet.contains((200L, 202L)), "4/8 overlap must be rejected")
    assert(!pairSet.contains((201L, 202L)))
    assert(!pairSet.exists(p => p._1 >= 220L && p._1 <= 223L),
      "unrelated singletons must not pair")
  }
}
