package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MultimodalOps, VideoMeta}
import graft.multimodal.MultimodalOps.MediaRow

/** Container-metadata parsing ([[VideoMeta]]) against byte structures
  * assembled INLINE here, offset-by-offset from the public specs —
  * deliberately NOT via the DumpVideoFixture builders, so the parser
  * and the fixture assembler cannot agree on a shared wrong layout:
  *
  *   1. ISO-BMFF: v0 mvhd/tkhd offsets, v1 64-bit times, 16.16
  *      fixed-point dims, largesize (size==1) skip, unknown-box skip;
  *   2. AVI: avih dword layout, little-endian sizes, odd-chunk pad;
  *   3. Matroska: EBML varint widths, ID-with-marker vs size-without,
  *      float4/float8 Duration × TimestampScale, track census;
  *   4. error routing: truncation, overrun, misfiled non-video bytes
  *      → `err` column, never an exception;
  *   5. the operator is one narrow mapPartitions (no Exchange in the
  *      plan — payload bytes never shuffle);
  *   6. committed-fixture freshness: re-parsing the committed
  *      media_videos.parquet reproduces video_meta.parquet exactly
  *      (the oracle's ground truth cannot go stale silently).
  */
class VideoMetaSpec extends AnyFunSuite with SparkSessionFixture {

  // -- inline byte assembly (big-endian unless noted) -----------------
  private def b32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def b64(v: Long): Array[Byte] = b32(v >>> 32) ++ b32(v)
  private def l32(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def s(x: String): Array[Byte] = x.getBytes("US-ASCII")
  private def z(n: Int): Array[Byte] = new Array[Byte](n)
  private def boxOf(t: String, body: Array[Byte]): Array[Byte] =
    b32(body.length + 8L) ++ s(t) ++ body

  // spec-complete v0 mvhd body: ver/flags, 2 times, timescale,
  // duration, rate, volume, 10 reserved, 36 matrix, 24 predefined,
  // next-track
  private def mvhd0(ts: Long, dur: Long): Array[Byte] =
    boxOf("mvhd", b32(0) ++ b32(0) ++ b32(0) ++ b32(ts) ++ b32(dur) ++
      b32(0x10000) ++ Array[Byte](1, 0) ++ z(10) ++ z(36) ++ z(24) ++ b32(2))
  private def tkhd0(w: Int, h: Int): Array[Byte] =
    boxOf("tkhd", b32(7) ++ b32(0) ++ b32(0) ++ b32(1) ++ b32(0) ++ b32(0) ++
      z(8) ++ z(8) ++ z(36) ++ b32(w.toLong << 16) ++ b32(h.toLong << 16))

  test("mp4: v0 offsets, brand, fixed-point dims, track census") {
    val ftyp = boxOf("ftyp", s("isom") ++ b32(512) ++ s("mp41"))
    val moov = boxOf("moov",
      mvhd0(1000, 42000) ++
        boxOf("trak", tkhd0(640, 360)) ++
        boxOf("trak", tkhd0(0, 0))) // audio track: 0x0 dims
    val mdat = boxOf("mdat", z(64))
    val p = VideoMeta.parse(ftyp ++ moov ++ mdat)
    assert(p === Right(VideoMeta.Parsed("mp4", "isom", 42000L, 640, 360, 2)))
  }

  test("mp4: v1 64-bit mvhd/tkhd, largesize mdat, unknown boxes skipped") {
    val ftyp = boxOf("ftyp", s("avc1") ++ b32(0) ++ s("isom"))
    // v1 mvhd: ver 1, 8-byte times, 4-byte timescale, 8-byte duration
    val mvhd1 = boxOf("mvhd", b32(0x01000000L) ++ b64(0) ++ b64(0) ++
      b32(90000) ++ b64(900000L) ++ b32(0x10000) ++ Array[Byte](1, 0) ++
      z(10) ++ z(36) ++ z(24) ++ b32(2))
    val tkhd1 = boxOf("tkhd", b32(0x01000007L) ++ b64(0) ++ b64(0) ++
      b32(1) ++ b32(0) ++ b64(0) ++ z(8) ++ z(8) ++ z(36) ++
      b32(1280L << 16) ++ b32(720L << 16))
    val moov = boxOf("moov", mvhd1 ++ boxOf("trak", tkhd1))
    // largesize: size field 1, 64-bit size after the type
    val big = b32(1) ++ s("mdat") ++ b64(16 + 32L) ++ z(32)
    val free = boxOf("free", z(12))
    val p = VideoMeta.parse(ftyp ++ free ++ big ++ moov)
    assert(p === Right(VideoMeta.Parsed("mp4", "avc1", 10000L, 1280, 720, 1)))
  }

  test("mp4: truncated moov and overrunning box sizes are malformed, not thrown") {
    val ftyp = boxOf("ftyp", s("isom") ++ b32(0) ++ s("mp41"))
    val moov = boxOf("moov", mvhd0(1000, 1000))
    val whole = ftyp ++ moov
    val cut = VideoMeta.parse(whole.take(whole.length - 10))
    assert(cut.isLeft && cut.swap.exists(_.startsWith("malformed")))
    val lying = boxOf("ftyp", s("isom") ++ b32(0) ++ s("mp41")) ++
      b32(9999) ++ s("moov") // declared size overruns the payload
    val over = VideoMeta.parse(lying)
    assert(over.isLeft && over.swap.exists(_.contains("overruns")))
  }

  test("avi: avih dword layout, µs/frame math, odd-chunk padding") {
    val avih = s("avih") ++ l32(56) ++
      l32(33333) ++ l32(0) ++ l32(0) ++ l32(0) ++ // usPerFrame..flags
      l32(300) ++ l32(0) ++ l32(2) ++ l32(0) ++ // totalFrames..sugBuf
      l32(720) ++ l32(480) ++ z(16)
    // an odd-sized vendor chunk BEFORE avih exercises even-padding
    val odd = s("JUNK") ++ l32(3) ++ Array[Byte](1, 2, 3, 0)
    val hdrl = s("LIST") ++ l32(4 + odd.length + avih.length) ++
      s("hdrl") ++ odd ++ avih
    val inner = s("AVI ") ++ hdrl
    val p = VideoMeta.parse(s("RIFF") ++ l32(inner.length.toLong) ++ inner)
    assert(p === Right(VideoMeta.Parsed("avi", "AVI ", 9999L, 720, 480, 2)))
  }

  // -- EBML assembly: IDs verbatim, sizes marker-prefixed -------------
  private def vsize(n: Long): Array[Byte] =
    if (n < 127) Array((n | 0x80L).toByte)
    else Array((0x40L | (n >>> 8)).toByte, n.toByte) // 2-byte size
  private def elem(id: Array[Byte], body: Array[Byte]): Array[Byte] =
    id ++ vsize(body.length.toLong) ++ body

  test("mkv: EBML varints, float8 duration x custom TimestampScale") {
    val header = elem(Array(0x1A, 0x45, 0xDF.toByte, 0xA3.toByte),
      elem(Array(0x42, 0x82.toByte), s("webm")))
    val info = elem(Array(0x15, 0x49, 0xA9.toByte, 0x66),
      elem(Array(0x2A, 0xD7.toByte, 0xB1.toByte),
        Array(0x1E, 0x84.toByte, 0x80.toByte)) ++ // 2_000_000 ns
        elem(Array(0x44, 0x89.toByte),
          b64(java.lang.Double.doubleToLongBits(15000.0))))
    val video = elem(Array(0xE0.toByte),
      elem(Array(0xB0.toByte), Array(0x03, 0x20)) ++ // 800
        elem(Array(0xBA.toByte), Array(0x02, 0x58))) // 600
    val tracks = elem(Array(0x16, 0x54, 0xAE.toByte, 0x6B),
      elem(Array(0xAE.toByte), video) ++
        elem(Array(0xAE.toByte), z(0))) // trackless audio entry
    val seg = elem(Array(0x18, 0x53, 0x80.toByte, 0x67), info ++ tracks)
    val p = VideoMeta.parse(header ++ seg)
    // 15000 ticks x 2ms = 30000 ms
    assert(p === Right(VideoMeta.Parsed("mkv", "webm", 30000L, 800, 600, 2)))
  }

  test("mkv: float4 duration, default scale, default doctype; missing duration errs") {
    val header = elem(Array(0x1A, 0x45, 0xDF.toByte, 0xA3.toByte), z(0))
    val mk = (dur: Array[Byte]) => header ++
      elem(Array(0x18, 0x53, 0x80.toByte, 0x67),
        elem(Array(0x15, 0x49, 0xA9.toByte, 0x66), dur) ++
          elem(Array(0x16, 0x54, 0xAE.toByte, 0x6B),
            elem(Array(0xAE.toByte),
              elem(Array(0xE0.toByte),
                elem(Array(0xB0.toByte), Array(0x64)) ++
                  elem(Array(0xBA.toByte), Array(0x32))))))
    val withDur = mk(elem(Array(0x44, 0x89.toByte),
      b32(java.lang.Float.floatToIntBits(2500f).toLong & 0xFFFFFFFFL)))
    assert(VideoMeta.parse(withDur) ===
      Right(VideoMeta.Parsed("mkv", "matroska", 2500L, 100, 50, 1)))
    val noDur = VideoMeta.parse(mk(z(0)))
    assert(noDur.isLeft && noDur.swap.exists(_.contains("Duration")))
  }

  test("misfiled and garbage payloads route to err, and the operator is narrow") {
    val sp = spark
    import sp.implicits._
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, 0x0A) ++ z(32)
    val rows = Seq(
      MediaRow(1L, "video", "video/mp4", None, None, None, png),
      MediaRow(2L, "video", "video/mp4", None, None, None, z(4)),
      MediaRow(3L, "video", "video/mp4", None, None, None,
        Array.tabulate[Byte](64)(i => (i * 31).toByte)))
    val out = VideoMeta.videoMeta(rows.toDS())
    val byId = out.collect().map(r => r.media_id -> r).toMap
    assert(!byId(1L).ok && byId(1L).err.startsWith("unsupported"))
    assert(!byId(2L).ok && byId(2L).err.startsWith("malformed"))
    assert(!byId(3L).ok)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "metadata parse must not shuffle payload bytes")
  }

  test("committed fixture is fresh: re-parse equals video_meta.parquet") {
    val sp = spark
    import sp.implicits._
    val media = sp.read.parquet(s"${SparkEntry.FixtureDir}/media_videos.parquet")
      .as[MediaRow]
    val reparsed = VideoMeta.videoMeta(media).collect().sortBy(_.media_id)
    val committed = sp.read
      .parquet(s"${SparkEntry.FixtureDir}/video_meta.parquet")
      .as[VideoMeta.VideoMetaRow].collect().sortBy(_.media_id)
    assert(reparsed.toSeq === committed.toSeq)
    // the planted exact-dup ids parse identically to their originals
    val byId = committed.map(r => r.media_id -> r).toMap
    assert(byId(110L).copy(media_id = 10L) === byId(10L))
    assert(byId(111L).copy(media_id = 10L) === byId(10L))
  }
}
