package graft.multimodal

/** MJPEG-in-AVI frame extraction — the one video family whose
  * frame-level PIXEL decode needs zero dependencies beyond the JDK:
  * each compressed video chunk (`NNdc`) in the RIFF `movi` list is a
  * complete baseline JPEG (SOI..EOI), decodable by the same ImageIO
  * path [[MediaCodec.decodeImage]] already uses for still images.
  * That closes part of the round-12 "deterministic-fake seam": sampled
  * frames get REAL pixel decode + DCT pHash, feeding video near-dup
  * through the existing hamming machinery
  * ([[MultimodalOps.videoFrameNearDupPairs]]).
  *
  * Reference anchor: the reference pipeline (pyspark-etl-twitter)
  * carries no video path at all — this is north-star training-data
  * territory; the container grammar is the public AVI RIFF layout
  * (msdn AVI RIFF File Reference): `RIFF('AVI ' LIST('hdrl' …)
  * LIST('movi' {'NNdc' chunks, optionally nested in 'rec ' LISTs})
  * ['idx1'])`, chunks word-aligned (odd sizes padded one byte).
  *
  * Same totality contract as [[VideoMeta.parse]]: any byte garbage
  * routes to `Left(reason)`, never an exception — guarded by the
  * shared fuzz battery (VideoMetaFuzzSpec seeds the MJPEG fixture
  * payloads too). */
object MjpegAvi {

  private def le32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xFFL)) | ((p(o + 1) & 0xFFL) << 8) |
      ((p(o + 2) & 0xFFL) << 16) | ((p(o + 3) & 0xFFL) << 24)

  private def fourcc(p: Array[Byte], o: Int): String =
    new String(Array(p(o), p(o + 1), p(o + 2), p(o + 3)), "ISO-8859-1")

  private def isJpeg(p: Array[Byte], bs: Int, be: Int): Boolean =
    be - bs >= 4 && (p(bs) & 0xFF) == 0xFF && (p(bs + 1) & 0xFF) == 0xD8 &&
      (p(bs + 2) & 0xFF) == 0xFF

  /** `NNdc` / `NNdb` — a numbered video-stream chunk id. */
  private def isVideoChunkId(ck: String): Boolean =
    ck.length == 4 && ck(0).isDigit && ck(1).isDigit &&
      (ck.substring(2) == "dc" || ck.substring(2) == "db")

  private val MaxFramesHard = 65536 // bound memory against a hostile index

  /** All JPEG video-chunk payloads of an AVI in file order.
    * `Left(reason)` on anything that is not a well-formed AVI carrying
    * at least one JPEG video chunk; never throws. Each returned array
    * is a copy (safe to hand to ImageIO). */
  def mjpegFrames(p: Array[Byte]): Either[String, Vector[Array[Byte]]] = {
    if (p.length < 12) return Left("malformed: too short for RIFF")
    if (fourcc(p, 0) != "RIFF") return Left("malformed: no RIFF magic")
    if (fourcc(p, 8) != "AVI ") return Left("not AVI: RIFF form " + fourcc(p, 8).trim)
    val riffEnd = math.min(p.length.toLong, 8L + le32(p, 4)).toInt
    if (riffEnd < 12) return Left("malformed: RIFF size too small")

    val out = Vector.newBuilder[Array[Byte]]
    var n = 0
    // walk a chunk run [off, lim); recurse only into movi / rec lists
    // (depth ≤ 2 by grammar; cap anyway so a self-referencing size
    // field can't stack-overflow)
    def walk(start: Int, lim: Int, inMovi: Boolean,
             depth: Int): Either[String, Unit] = {
      if (depth > 4) return Left("malformed: LIST nesting too deep")
      var off = start
      while (off + 8 <= lim) {
        val ck = fourcc(p, off)
        val sz = le32(p, off + 4)
        val bodyStart = off + 8
        val bodyEnd = bodyStart + sz
        if (bodyEnd > lim || sz < 0)
          return Left(s"malformed: chunk '$ck' overruns enclosing list")
        if (ck == "LIST" && bodyEnd - bodyStart >= 4) {
          val lt = fourcc(p, bodyStart.toInt)
          if (lt == "movi" || (inMovi && lt == "rec ")) {
            walk(bodyStart.toInt + 4, bodyEnd.toInt, inMovi = true,
              depth + 1) match {
              case l @ Left(_) => return l
              case _ =>
            }
          } // hdrl/odml etc: size-skipped, never read
        } else if (inMovi && isVideoChunkId(ck) &&
            isJpeg(p, bodyStart.toInt, bodyEnd.toInt)) {
          if (n >= MaxFramesHard)
            return Left("malformed: more than 65536 video chunks")
          out += java.util.Arrays.copyOfRange(p, bodyStart.toInt, bodyEnd.toInt)
          n += 1
        }
        off = (bodyEnd + (sz & 1L)).toInt // word alignment pad
      }
      Right(())
    }
    walk(12, riffEnd, inMovi = false, 0).flatMap { _ =>
      val frames = out.result()
      if (frames.isEmpty) Left("no mjpeg frames: no JPEG video chunks in movi")
      else Right(frames)
    }
  }

  /** Evenly sample up to `k` of `n` frame indices, deterministic,
    * always including the first frame; the full range when n ≤ k.
    * (Slot j of k maps to index ⌊j·n/k⌋ — strictly increasing when
    * n ≥ k, so no frame is sampled twice.) */
  def sampleIndices(n: Int, k: Int): Vector[Int] =
    if (n <= k) (0 until n).toVector
    else (0 until k).map(j => (j.toLong * n / k).toInt).toVector
}
