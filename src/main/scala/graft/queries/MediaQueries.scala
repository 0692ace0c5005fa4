package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.multimodal.{MultimodalOps, VideoMeta}

/** Media-intake query family (`v*`): the container-metadata and
  * binary-identity operations a multimodal crawl runs before any
  * decode. All three run over the committed media fixture parquets
  * (the d22 device — media payloads are repo fixtures, not testdata
  * tables, so the oracle can hold committed values against the
  * engine's own parse path).
  *
  * Scale notes: metadata parse is one narrow mapPartitions (payload
  * bytes never shuffle); the digest dedup groups by sha256 STRING,
  * never by payload — at 100 TB the 64-byte digests shuffle, the
  * payloads stay put. The oracle side groups by payload directly
  * (DuckDB 1.0 has no BLOB hashing) — equivalent partition of rows
  * absent a SHA-256 collision.
  */
object MediaQueries {

  private def media(s: SparkSession, file: String) =
    s.read.parquet(s"${SparkEntry.FixtureDir}/$file")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full container-metadata parse of the committed video fixture:
    // MP4 (v0/v1 mvhd, largesize boxes, fixed-point tkhd dims), AVI
    // (avih µs-per-frame math), MKV (EBML varints, float durations,
    // TimestampScale) and the error routing for truncated/misfiled/
    // garbage payloads. Oracle = the committed parse fixture
    // (video_meta.parquet, dumped through this same path) — parse
    // DETERMINISM against committed values, the m5/d22 pattern.
    "v1_video_meta" -> ((s, _) => {
      import s.implicits._
      VideoMeta.videoMeta(media(s, "media_videos.parquet")
        .as[MultimodalOps.MediaRow]).toDF()
    }),

    // Downstream census off the parse — the intake aggregate a video
    // crawl gates on (per-container volumes, duration budget, max
    // frame area, track counts). Engine recomputes the parse from the
    // raw container bytes; the oracle re-derives the census in SQL
    // from the COMMITTED parse table — an independent relational
    // derivation, not a replay of the engine plan.
    "v2_video_census" -> ((s, _) => {
      import s.implicits._
      VideoMeta.videoMeta(media(s, "media_videos.parquet")
        .as[MultimodalOps.MediaRow]).toDF()
        .filter(col("ok"))
        .groupBy(col("container"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("brand")).as("n_brands"),
          sum(col("duration_ms")).as("duration_ms_total"),
          max((col("width") * col("height")).cast("long")).as("max_pixels"),
          sum(col("n_tracks").cast("long")).as("n_tracks_total"))
    }),

    // EXACT binary dedup across ALL media fixtures (image + audio +
    // video): group by sha256 digest — the payloads themselves never
    // shuffle, which is the whole design at 100 TB — keep the min-id
    // row per identical payload. The video fixture plants exact
    // payload twins (ids 110/111 = id 10's bytes, etc.); the image
    // fixture's PNG-vs-BMP "exact twins" are the negative control
    // (same pixels, different container bytes → different digests).
    // Oracle groups by the payload BLOB itself — same row partition
    // absent a SHA-256 collision, and fully independent of the
    // engine's hash.
    // MAGIC-BYTE SNIFF CENSUS across every media fixture — the intake
    // triage a multimodal crawl runs FIRST, before routing payloads to
    // any decoder: which container families arrived, how many, and how
    // much byte mass each carries. sniffFormat is a pure built-in
    // prefix compare (substring+hex+when), so the census is one
    // whole-stage-codegen scan + one tiny keyed agg; payload bytes
    // never shuffle — only the (fmt, len) pairs do. The oracle
    // re-derives the same triage INDEPENDENTLY in SQL: DuckDB hexes
    // the whole payload and string-compares prefixes of the hex, so a
    // wrong magic constant, a wrong offset, or a false positive on a
    // truncated prefix breaks the hash.
    "v4_media_sniff" -> ((s, _) => {
      val all = media(s, "media_images.parquet")
        .select(lit("image").as("src"), col("payload"))
        .unionByName(media(s, "media_audio.parquet")
          .select(lit("audio").as("src"), col("payload")))
        .unionByName(media(s, "media_videos.parquet")
          .select(lit("video").as("src"), col("payload")))
      all
        .select(MultimodalOps.sniffFormat(col("payload")).as("fmt"),
          col("src"), length(col("payload")).cast("long").as("len"))
        .groupBy(col("fmt"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("src")).as("n_src"),
          sum(col("len")).as("n_bytes"))
    }),

    // VIDEO near-dup by sampled-frame pHash over the committed MJPEG
    // fixture — the r12 "real frame decode" item: MjpegAvi walks the
    // RIFF movi list, each 00dc chunk is a complete JPEG decoded by
    // the SAME ImageIO path still images use, DCT-pHashed, 8 slots
    // sampled evenly; near-dup iff ≥ 3/4 of the shorter side's slots
    // land within hamming 6 (slot-ALIGNED banded join — frame 3 meets
    // only frame 3s — then an exact integer fraction gate). Oracle
    // recomputes the pair set ALL-PAIRS in DuckDB from the committed
    // frame-hash table (video_frame_phash.parquet, dumped through
    // this same decode path), so banding completeness AND
    // decode+pHash determinism are both value-checked; the planted
    // structure includes a quality-0.5 re-encode twin (7/8 slots, one
    // slot at distance 8 — the gate must pass it), a 4/8 partial
    // overlap (must REJECT), and a 24-frame long cut whose sampled
    // slots equal its 8-frame excerpt (sampling invariance).
    "v5_video_framedup" -> ((s, _) => {
      import s.implicits._
      MultimodalOps.videoFrameNearDupPairs(
        MultimodalOps.videoFramePHash(
          media(s, "media_mjpeg.parquet").as[MultimodalOps.MediaRow],
          maxFrames = 8, dim = 32).toDF(),
        maxDist = 6, minMatchNum = 3, minMatchDen = 4)
    }),

    "v3_media_digest_dedup" -> ((s, _) => {
      val all = media(s, "media_images.parquet")
        .select(lit("image").as("src"), col("media_id"), col("payload"))
        .unionByName(media(s, "media_audio.parquet")
          .select(lit("audio").as("src"), col("media_id"), col("payload")))
        .unionByName(media(s, "media_videos.parquet")
          .select(lit("video").as("src"), col("media_id"), col("payload")))
      all
        .select(col("src"), col("media_id"),
          sha2(col("payload"), 256).as("digest"),
          length(col("payload")).cast("long").as("len"))
        .groupBy(col("digest"))
        .agg(
          min(col("src")).as("src"),
          min(col("media_id")).as("keep_id"),
          count(lit(1)).as("n"),
          countDistinct(col("src")).as("n_src"),
          max(col("len")).as("n_bytes"))
        .drop("digest")
    }))
}
