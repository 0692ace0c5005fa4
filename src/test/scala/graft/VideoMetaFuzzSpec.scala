package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.VideoMeta

/** Robustness fuzz for [[VideoMeta.parse]] — an intake parser's
  * contract is TOTAL: any byte garbage routes to Left(reason), never
  * an exception (truncation mid-box, length fields pointing past the
  * buffer, varints running off the end, negative/huge sizes). Seeds
  * are the committed container fixture's real payloads, so every
  * mutation walks the code paths a hostile crawl actually reaches:
  *  - every strict prefix of every fixture payload (truncation at
  *    each possible box/varint boundary);
  *  - seeded random single-byte corruptions (length fields, magic,
  *    fixed-point dims, EBML ids all get hit across 20k trials);
  *  - seeded random tails appended (trailing garbage must not
  *    re-open parsing);
  *  - pure random buffers with valid magics spliced at offset 0.
  * The dual pin: parse NEVER throws, and parses that still succeed
  * after mutation return bounded values (the fixture's invariants),
  * so a corrupted length can't smuggle a negative dimension out. */
class VideoMetaFuzzSpec extends AnyFunSuite {

  // JVM-only (no SparkSession): seeds come straight from the
  // deterministic fixture generator, the same code path that produced
  // the committed parquet
  private def payloads: Seq[Array[Byte]] =
    graft.tools.DumpVideoFixture.payloads.map(_._2)

  private def assertTotal(p: Array[Byte], what: String): Unit =
    VideoMeta.parse(p) match {
      case Right(parsed) =>
        // the `sane` gate's own contract (a corrupted byte once
        // smuggled n_tracks = 184,549,377 through a byte-valid AVI
        // header — the finding that added the gate)
        assert(parsed.durationMs >= 0L, what)
        assert(parsed.width >= 0 && parsed.width <= 65535, what)
        assert(parsed.height >= 0 && parsed.height <= 65535, what)
        assert(parsed.nTracks >= 0 && parsed.nTracks <= 1024, what)
      case Left(reason) => assert(reason.nonEmpty, what)
    }

  test("every strict prefix of every fixture payload parses totally") {
    payloads.foreach { p =>
      (0 until p.length).foreach(n => assertTotal(p.take(n), s"prefix $n"))
    }
  }

  test("20k seeded single-byte corruptions parse totally") {
    val rnd = new scala.util.Random(991)
    val ps = payloads.filter(_.length >= 12)
    (0 until 20000).foreach { i =>
      val src = ps(rnd.nextInt(ps.length))
      val p = src.clone()
      p(rnd.nextInt(p.length)) = rnd.nextInt().toByte
      assertTotal(p, s"corruption $i")
    }
  }

  test("empty tkhd box whose body ends exactly at buffer end parses totally") {
    // Hand-built layout the seeded fuzz can't reach: the fixture seeds
    // always carry bytes after tkhd, so an empty tkhd (size 8, body ==
    // 0 bytes) terminating the buffer never arises from mutation. The
    // version-byte read must be bounds-guarded, not reached-and-thrown.
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0))
    val mvhd = box("mvhd", Array.fill[Byte](4)(0) ++ be32(1000) ++
      be32(1000) ++ Array.fill[Byte](80)(0))
    // trak whose only child is a ZERO-body tkhd; moov ends the buffer
    val trak = box("trak", box("tkhd", Array.emptyByteArray))
    val moov = box("moov", mvhd ++ trak)
    assertTotal(ftyp ++ moov, "empty tkhd at EOF")
    assert(VideoMeta.parse(ftyp ++ moov).isLeft, "empty tkhd must reject")
    // and the same with the mvhd after the trak (tkhd truly last bytes)
    val moov2 = box("moov", trak ++ mvhd)
    assertTotal(ftyp ++ moov2, "empty tkhd mid-moov")
  }

  test("random tails and spliced magics parse totally") {
    val rnd = new scala.util.Random(992)
    val magics = Seq(
      Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p'),
      "RIFF....AVI ".getBytes("ISO-8859-1"),
      Array[Byte](0x1A, 0x45.toByte, 0xDF.toByte, 0xA3.toByte))
    (0 until 5000).foreach { i =>
      val tail = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      assertTotal(magics(i % magics.size) ++ tail, s"spliced $i")
      val src = payloads(rnd.nextInt(payloads.size))
      assertTotal(src ++ tail, s"tail $i")
    }
  }

  // ---- MjpegAvi.mjpegFrames: same totality contract, seeded from the
  // MJPEG fixture payloads (real multi-KB AVIs with JPEG 00dc chunks)

  private def mjpegPayloads: Seq[Array[Byte]] =
    graft.tools.DumpVideoFixture.mjpegPayloads.map(_._2)

  private def assertFramesTotal(p: Array[Byte], what: String): Unit =
    graft.multimodal.MjpegAvi.mjpegFrames(p) match {
      case Right(frames) =>
        assert(frames.nonEmpty, what)
        // a parse that survives mutation must still return honest
        // JPEG chunk payloads (SOI leading) of bounded count
        assert(frames.size <= 65536, what)
        frames.foreach(f => assert((f(0) & 0xFF) == 0xFF &&
          (f(1) & 0xFF) == 0xD8, what))
      case Left(reason) => assert(reason.nonEmpty, what)
    }

  test("every strict prefix of every MJPEG payload extracts totally") {
    mjpegPayloads.foreach { p =>
      (0 until p.length).foreach(n =>
        assertFramesTotal(p.take(n), s"mjpeg prefix $n"))
    }
  }

  test("20k seeded corruptions of MJPEG payloads extract totally") {
    val rnd = new scala.util.Random(993)
    val ps = mjpegPayloads
    (0 until 20000).foreach { i =>
      val p = ps(rnd.nextInt(ps.length)).clone()
      p(rnd.nextInt(p.length)) = rnd.nextInt().toByte
      assertFramesTotal(p, s"mjpeg corruption $i")
      // the metadata parser must also stay total on the MJPEG family
      assertTotal(p, s"mjpeg meta corruption $i")
    }
  }
}
