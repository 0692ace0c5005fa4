package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

import graft.multimodal.MultimodalOps.MediaRow

/** Container-level VIDEO METADATA extraction — the one video operation
  * this environment can do for real. Frame DECODE stays honestly
  * `unsupported:` (no ffmpeg-class codec in the container;
  * [[MediaCodec.decodeImage]] routes recognized video bytes to the
  * error column), but the container STRUCTURE is plain bytes, and a
  * crawl-intake pipeline needs duration/dimensions/track-count long
  * before any decode: length filtering, aspect-ratio gates, per-source
  * duration budgets, and stratified sampling all run off exactly this
  * metadata. Reference scope: the reference pipeline has no media path
  * at all (`consumer_local.py` is text-only); this family is part of
  * the training-data-pipeline extension surface, the video sibling of
  * the image pHash / audio fingerprint intake (MultimodalOps).
  *
  * Three container families parsed natively, all pure byte walking:
  *  - **ISO-BMFF / MP4** (`....ftyp`): top-level box walk → `ftyp`
  *    major brand; `moov/mvhd` (version 0 and 1) → timescale +
  *    duration; one `trak` count plus per-`trak/tkhd` 16.16
  *    fixed-point width/height (max across tracks — audio tracks
  *    carry 0×0).
  *  - **AVI / RIFF** (`RIFF....AVI `): chunk walk to `LIST hdrl` →
  *    `avih` main header (µs/frame × total frames → duration; width,
  *    height, stream count). All RIFF sizes little-endian, chunks
  *    even-padded.
  *  - **Matroska / WebM** (EBML `1A45DFA3`): EBML varint walk —
  *    header skipped, `Segment → Info` → TimestampScale (ns/tick,
  *    default 1e6) + float Duration (ticks); `Segment → Tracks` →
  *    TrackEntry count and per-entry `Video → PixelWidth/PixelHeight`.
  *
  * Scale shape: a single narrow `mapPartitions` — payload bytes never
  * shuffle, never hit the driver; malformed/truncated/unknown payloads
  * land in the `err` column (one corrupt blob cannot kill a
  * 1000-executor stage). Each parser touches only header regions; a
  * 100 GB `mdat` box is skipped by its size field, so cost is
  * per-FILE, not per-byte.
  */
object VideoMeta {

  /** Parse result row — flat (no Option) so the d22-style fixture
    * oracle can hash it relationally. Failed parses: ok=false, err
    * carries the reason, numeric fields 0, container = best sniff. */
  final case class VideoMetaRow(
      media_id: Long, ok: Boolean, container: String, brand: String,
      duration_ms: Long, width: Int, height: Int, n_tracks: Int,
      err: String)

  final case class Parsed(
      container: String, brand: String, durationMs: Long,
      width: Int, height: Int, nTracks: Int)

  /** Narrow per-partition metadata extraction over a media table. */
  def videoMeta(media: Dataset[MediaRow]): Dataset[VideoMetaRow] = {
    implicit val enc = Encoders.product[VideoMetaRow]
    media.mapPartitions { it =>
      it.map { row =>
        parse(row.payload) match {
          case Right(p) =>
            VideoMetaRow(row.media_id, ok = true, p.container, p.brand,
              p.durationMs, p.width, p.height, p.nTracks, "")
          case Left(e) =>
            VideoMetaRow(row.media_id, ok = false, sniff(row.payload), "",
              0L, 0, 0, 0, e)
        }
      }
    }
  }

  /** Container sniff for the error row — mirrors
    * [[MultimodalOps.sniffFormat]]'s video rules plus AVI. */
  private def sniff(p: Array[Byte]): String =
    if (p == null || p.length < 12) "unknown"
    else if (p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p') "mp4"
    else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' ') "avi"
    else if (p(0) == 0x1A.toByte && p(1) == 0x45.toByte &&
      p(2) == 0xDF.toByte && p(3) == 0xA3.toByte) "mkv"
    else "unknown"

  /** Parse one payload; Left(reason) on anything not a structurally
    * valid video container. Pure function of the bytes. */
  def parse(p: Array[Byte]): Either[String, Parsed] = {
    if (p == null || p.length < 12) Left("malformed: payload shorter than any container header")
    else sniff(p) match {
      case "mp4" => parseMp4(p).flatMap(sane)
      case "avi" => parseAvi(p).flatMap(sane)
      case "mkv" => parseMkv(p).flatMap(sane)
      case _ => Left("unsupported: not a recognized video container")
    }
  }

  /** Declared-field sanity gate (VideoMetaFuzzSpec finding): AVI's
    * dwStreams/dwWidth/dwHeight and MKV's PixelWidth/PixelHeight are
    * DECLARED values, not structural ones — a single corrupted byte
    * yielded n_tracks = 184,549,377 through a byte-valid header. An
    * intake parser must not launder implausible claims into ok rows:
    * dims cap at 65535 (MP4's 16.16 ceiling, generous for the rest),
    * tracks at 1024, durations must be non-negative. */
  private def sane(r: Parsed): Either[String, Parsed] =
    if (r.durationMs < 0L) Left("malformed: negative duration")
    else if (r.width < 0 || r.width > 65535 ||
      r.height < 0 || r.height > 65535)
      Left("malformed: implausible declared dimensions")
    else if (r.nTracks < 0 || r.nTracks > 1024)
      Left("malformed: implausible declared track count")
    else Right(r)

  // ---- big/little-endian readers (bounds-checked by callers) --------
  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xFFL) << 24) | ((p(o + 1) & 0xFFL) << 16) |
      ((p(o + 2) & 0xFFL) << 8) | (p(o + 3) & 0xFFL)
  private def be64(p: Array[Byte], o: Int): Long =
    (be32(p, o) << 32) | be32(p, o + 4)
  private def le32(p: Array[Byte], o: Int): Long =
    ((p(o + 3) & 0xFFL) << 24) | ((p(o + 2) & 0xFFL) << 16) |
      ((p(o + 1) & 0xFFL) << 8) | (p(o) & 0xFFL)
  private def fourcc(p: Array[Byte], o: Int): String =
    new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ---- ISO-BMFF / MP4 -----------------------------------------------

  /** Walk one box level in [start, end); call f(type, bodyStart,
    * bodyEnd) per box. Handles size==1 (64-bit largesize) and size==0
    * (box runs to end). Returns Left on structural corruption. */
  private def walkBoxes(p: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Either[String, Unit]): Either[String, Unit] = {
    var off = start
    while (off < end) {
      if (off + 8 > end) return Left("malformed: truncated box header")
      val size32 = be32(p, off)
      val typ = fourcc(p, off + 4)
      var bodyStart = off + 8
      val boxEnd: Long =
        if (size32 == 1L) {
          if (off + 16 > end) return Left("malformed: truncated largesize box")
          bodyStart = off + 16
          off + be64(p, off + 8)
        } else if (size32 == 0L) end.toLong
        else off + size32
      if (boxEnd < bodyStart || boxEnd > end)
        return Left(s"malformed: box '$typ' overruns container")
      f(typ, bodyStart, boxEnd.toInt) match {
        case l @ Left(_) => return l
        case _ =>
      }
      off = boxEnd.toInt
    }
    Right(())
  }

  private def parseMp4(p: Array[Byte]): Either[String, Parsed] = {
    var brand = ""
    var timescale = 0L
    var duration = -1L
    var nTracks = 0
    var w = 0
    var h = 0
    val walked = walkBoxes(p, 0, p.length) { (typ, bs, be) =>
      typ match {
        case "ftyp" =>
          if (be - bs < 4) Left("malformed: ftyp too short")
          else { brand = fourcc(p, bs).trim; Right(()) }
        case "moov" =>
          walkBoxes(p, bs, be) { (t2, b2, e2) =>
            t2 match {
              case "mvhd" =>
                if (e2 - b2 < 20) Left("malformed: mvhd too short")
                else {
                  val version = p(b2) & 0xFF
                  if (version == 1) {
                    if (e2 - b2 < 32) Left("malformed: mvhd v1 too short")
                    else {
                      timescale = be32(p, b2 + 20) // 4 flags + 8 + 8
                      duration = be64(p, b2 + 24)
                      Right(())
                    }
                  } else {
                    timescale = be32(p, b2 + 12) // 4 flags + 4 + 4
                    duration = be32(p, b2 + 16)
                    Right(())
                  }
                }
              case "trak" =>
                nTracks += 1
                walkBoxes(p, b2, e2) { (t3, b3, e3) =>
                  if (t3 == "tkhd") {
                    // An empty tkhd (body ends at b3, possibly at buffer end)
                    // must fail *before* the version-byte read — totality
                    // contract: parse never throws on adversarial bytes.
                    if (b3 >= e3) Left("malformed: tkhd too short")
                    else {
                    val version = p(b3) & 0xFF
                    // v0: 4 flags + 4+4 times + 4 id + 4 res + 4 dur
                    //     + 8 res + 2+2+2+2 + 36 matrix = 76 to width
                    // v1: 64-bit times/duration = +12
                    val dimOff = b3 + (if (version == 1) 88 else 76)
                    if (dimOff + 8 > e3) Left("malformed: tkhd too short")
                    else {
                      // 16.16 fixed point; audio tracks carry 0x0
                      val tw = (be32(p, dimOff) >> 16).toInt
                      val th = (be32(p, dimOff + 4) >> 16).toInt
                      if (tw > w) w = tw
                      if (th > h) h = th
                      Right(())
                    }
                    }
                  } else Right(())
                }
              case _ => Right(())
            }
          }
        case _ => Right(()) // free / mdat / skip — size-skipped, never read
      }
    }
    walked.flatMap { _ =>
      if (brand.isEmpty) Left("malformed: no ftyp box")
      else if (timescale <= 0L || duration < 0L) Left("malformed: no mvhd box")
      else Right(Parsed("mp4", brand,
        duration * 1000L / timescale, w, h, nTracks))
    }
  }

  // ---- AVI / RIFF ---------------------------------------------------

  private def parseAvi(p: Array[Byte]): Either[String, Parsed] = {
    val riffEnd = math.min(p.length.toLong, 8L + le32(p, 4)).toInt
    if (riffEnd < 12) return Left("malformed: RIFF size too small")
    // locate LIST/hdrl at top level, then avih inside it
    var off = 12
    var result: Option[Parsed] = None
    while (off + 8 <= riffEnd && result.isEmpty) {
      val ck = fourcc(p, off)
      val sz = le32(p, off + 4)
      val bodyStart = off + 8
      val bodyEnd = bodyStart + sz
      if (bodyEnd > riffEnd) return Left(s"malformed: chunk '$ck' overruns RIFF")
      if (ck == "LIST" && bodyEnd - bodyStart >= 4 &&
        fourcc(p, bodyStart) == "hdrl") {
        var o2 = bodyStart + 4
        while (o2 + 8 <= bodyEnd && result.isEmpty) {
          val ck2 = fourcc(p, o2)
          val sz2 = le32(p, o2 + 4)
          val b2 = o2 + 8
          if (b2 + sz2 > bodyEnd) return Left("malformed: hdrl chunk overrun")
          if (ck2 == "avih") {
            if (sz2 < 40) return Left("malformed: avih too short")
            val usPerFrame = le32(p, b2)
            val totalFrames = le32(p, b2 + 16)
            val streams = le32(p, b2 + 24).toInt
            val w = le32(p, b2 + 32).toInt
            val h = le32(p, b2 + 36).toInt
            result = Some(Parsed("avi", "AVI ",
              usPerFrame * totalFrames / 1000L, w, h, streams))
          }
          o2 = b2 + sz2.toInt + (sz2.toInt & 1) // chunks even-padded
        }
      }
      off = bodyEnd.toInt + (sz.toInt & 1)
    }
    result.toRight("malformed: no avih header")
  }

  // ---- Matroska / WebM (EBML) ---------------------------------------

  /** EBML element ID: length from leading zero bits of the FIRST byte,
    * value INCLUDES the marker bit (IDs are compared with it). */
  private def ebmlId(p: Array[Byte], off: Int, end: Int): Either[String, (Long, Int)] = {
    if (off >= end) return Left("malformed: EBML id at end")
    val b0 = p(off) & 0xFF
    val len = Integer.numberOfLeadingZeros(b0) - 24 + 1
    if (len < 1 || len > 4 || off + len > end) Left("malformed: bad EBML id")
    else {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (p(off + i) & 0xFFL); i += 1 }
      Right((v, len))
    }
  }

  /** EBML size varint: marker bit STRIPPED. All-ones = unknown size
    * (treated as to-end, legal for Segment in streamed files). */
  private def ebmlSize(p: Array[Byte], off: Int, end: Int): Either[String, (Long, Int)] = {
    if (off >= end) return Left("malformed: EBML size at end")
    val b0 = p(off) & 0xFF
    if (b0 == 0) return Left("malformed: EBML size >8 bytes")
    val len = Integer.numberOfLeadingZeros(b0) - 24 + 1
    if (off + len > end) return Left("malformed: truncated EBML size")
    var v = (b0 & (0xFF >>> len)).toLong
    var allOnes = (b0 | (~(0xFF >>> len) & 0xFF)) == 0xFF
    var i = 1
    while (i < len) {
      val b = p(off + i) & 0xFF
      if (b != 0xFF) allOnes = false
      v = (v << 8) | b
      i += 1
    }
    Right((if (allOnes) -1L else v, len))
  }

  private def ebmlUint(p: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (p(off + i) & 0xFFL); i += 1 }
    v
  }

  private def ebmlFloat(p: Array[Byte], off: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(be32(p, off).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(be64(p, off))
    else 0.0

  /** Walk children of [start, end); f(id, bodyStart, bodyEnd). */
  private def walkEbml(p: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Either[String, Unit]): Either[String, Unit] = {
    var off = start
    while (off < end) {
      val step = for {
        idLen <- ebmlId(p, off, end)
        szLen <- ebmlSize(p, off + idLen._2, end)
      } yield {
        val bodyStart = off + idLen._2 + szLen._2
        val bodyEnd =
          if (szLen._1 < 0) end.toLong else bodyStart + szLen._1
        (idLen._1, bodyStart, bodyEnd)
      }
      step match {
        case Left(e) => return Left(e)
        case Right((id, bs, beL)) =>
          if (beL > end) return Left(f"malformed: EBML element 0x$id%X overruns")
          val be = beL.toInt
          f(id, bs, be) match {
            case l @ Left(_) => return l
            case _ =>
          }
          off = be
      }
    }
    Right(())
  }

  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdDocType = 0x4282L

  private def parseMkv(p: Array[Byte]): Either[String, Parsed] = {
    var docType = "matroska" // spec default when the header omits it
    var tsScaleNs = 1000000L // spec default: 1 ms ticks
    var durationTicks = -1.0
    var nTracks = 0
    var w = 0
    var h = 0
    var sawSegment = false
    val walked = walkEbml(p, 0, p.length) { (id, bs, be) =>
      id match {
        case 0x1A45DFA3L => // EBML header: read DocType, skip rest
          walkEbml(p, bs, be) { (hid, hb, he) =>
            if (hid == IdDocType)
              docType = new String(p, hb, he - hb,
                java.nio.charset.StandardCharsets.US_ASCII)
            Right(())
          }
        case IdSegment =>
          sawSegment = true
          walkEbml(p, bs, be) { (sid, sb, se) =>
            sid match {
              case IdInfo =>
                walkEbml(p, sb, se) { (iid, ib, ie) =>
                  if (iid == IdTimestampScale) tsScaleNs = ebmlUint(p, ib, ie - ib)
                  else if (iid == IdDuration) durationTicks = ebmlFloat(p, ib, ie - ib)
                  Right(())
                }
              case IdTracks =>
                walkEbml(p, sb, se) { (tid, tb, te) =>
                  if (tid == IdTrackEntry) {
                    nTracks += 1
                    walkEbml(p, tb, te) { (vid, vb, ve) =>
                      if (vid == IdVideo)
                        walkEbml(p, vb, ve) { (pid, pb, pe) =>
                          if (pid == IdPixelWidth)
                            w = math.max(w, ebmlUint(p, pb, pe - pb).toInt)
                          else if (pid == IdPixelHeight)
                            h = math.max(h, ebmlUint(p, pb, pe - pb).toInt)
                          Right(())
                        }
                      else Right(())
                    }
                  } else Right(())
                }
              case _ => Right(()) // Cluster etc: size-skipped, never read
            }
          }
        case _ => Right(())
      }
    }
    walked.flatMap { _ =>
      if (!sawSegment) Left("malformed: no Segment element")
      else if (durationTicks < 0) Left("malformed: no Info Duration")
      else Right(Parsed("mkv", docType,
        math.round(durationTicks * tsScaleNs / 1e6), w, h, nTracks))
    }
  }
}
