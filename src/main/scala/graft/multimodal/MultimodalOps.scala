package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample run as partition-
  * local batch operators.
  *
  * Spark-side design (the part that must be right at 100 TB):
  *  - media bytes NEVER pass through a shuffle: every media operator
  *    is a narrow `mapPartitions` over the scan, and anything that
  *    aggregates does so on extracted features (small), not payloads;
  *  - rows are processed in bounded batches (`DecodeBatchSize`) so
  *    peak memory = batch x frame-size regardless of partition size;
  *  - operators carry explicit output schemas (no inference) so the
  *    plan is stable for Catalyst;
  *  - oversized payloads are routed to an error column, not thrown,
  *    so one corrupt blob can't kill a 1000-executor stage.
  *
  * Codec status: IMAGE decode is REAL for PNG/JPEG/GIF/BMP via the
  * JDK's own `javax.imageio` (no external libs needed);
  * [[MediaCodec.decodeImage]] falls back to a deterministic
  * payload-seeded fake for synthetic payloads, and audio/video stay
  * faked (ffmpeg-class bindings are genuinely absent from this
  * container) with the plug-in seams marked.
  */
object MultimodalOps {

  /** Typed metadata accompanying every media payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** A media table: metadata + opaque payload. */
  val MediaSchema: StructType =
    StructType(MediaMetaSchema.fields :+
      StructField("payload", BinaryType))

  /** Rows per decode batch — bounds peak decoder memory per task. */
  val DecodeBatchSize = 32

  /** Container-format sniffing from magic bytes — the intake triage
    * every media crawl runs BEFORE any decode, and the one media
    * operator that needs no codec at all: an 8-byte prefix compare,
    * spelled entirely in built-ins (substring + hex + when), so it
    * runs inside whole-stage codegen on the scan with payloads never
    * leaving their partition. Truncated/empty payloads classify as
    * "unknown", never throw — intake data is exactly where garbage
    * lives. MP4 is recognized by `ftyp` at byte offset 5 (the
    * preceding 4 bytes are the box length, which varies). */
  def sniffFormat(payload: Column): Column = {
    val hex8 = upper(hex(substring(payload, 1, 8)))
    when(hex8.startsWith("FFD8FF"), "jpeg")
      .when(hex8.startsWith("89504E47"), "png")
      .when(hex8.startsWith("47494638"), "gif")
      .when(hex8.startsWith("52494646"), "riff") // wav/avi/webp container
      .when(substring(hex8, 9, 8) === "66747970", "mp4")
      .when(hex8.startsWith("494433"), "mp3")
      .when(hex8.startsWith("25504446"), "pdf")
      .when(hex8.startsWith("504B"), "zip")
      .otherwise("unknown")
  }

  final case class MediaRow(
      media_id: Long, kind: String, mime: String,
      width: Option[Int], height: Option[Int], duration_ms: Option[Long],
      payload: Array[Byte])

  final case class ImageFeature(
      media_id: Long, ok: Boolean, error: String,
      out_width: Int, out_height: Int, feature: Array[Float])

  /** Deterministic synthetic media table (the container has no real
    * media files); payload bytes are a seeded function of media_id so
    * every stage is reproducible and testable. */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, partitions).map { id =>
      val rnd = new scala.util.Random(id * 7919 + 17)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = Array.fill[Byte](64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      MediaRow(id, kind, s"$kind/x-synthetic",
        Some(32 + rnd.nextInt(96)), Some(32 + rnd.nextInt(96)),
        if (kind == "image") None else Some(1000L + rnd.nextInt(9000)),
        payload)
    }
  }

  /** Image decode + resize + feature-extract as a partition-local
    * batched operator. Narrow (no shuffle); bounded batches; errors
    * captured per row. The codec call is the stub seam. */
  def imageFeatures(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ImageFeature] = {
    implicit val enc = Encoders.product[ImageFeature]
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        // real impl: hand `batch.map(_.payload)` to a vectorized codec
        batch.map { r =>
          MediaCodec.decodeImage(r.payload, outW, outH) match {
            case Right(px) =>
              ImageFeature(r.media_id, ok = true, error = null,
                outW, outH, MediaCodec.pooledFeature(px, 8))
            case Left(err) =>
              ImageFeature(r.media_id, ok = false, error = err,
                0, 0, Array.empty)
          }
        }
      }
    }
  }

  /** Frame sampling for video rows: every `stepMs` timestamp becomes a
    * (media_id, frame_ts_ms) row; the decode of each frame is again
    * the stub seam. Narrow: one input row → few output rows, no
    * payload duplication (frames reference the parent id). */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        val dur = r.duration_ms.getOrElse(0L)
        (0L until dur by stepMs).map(ts => (r.media_id, ts))
      }
      .toDF("media_id", "frame_ts_ms")
  }

  /** DataFrame-level wrapper matching [[MediaSchema]] for SQL users. */
  def imageFeaturesDF(spark: SparkSession, media: DataFrame, outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    imageFeatures(media.as[MediaRow], outW, outH).toDF()
  }
}

/** The codec seam. IMAGE decode is REAL: PNG/JPEG/GIF/BMP decoders
  * ship with the JDK (`javax.imageio.ImageIO`), so those containers
  * decode, resize, and feature-extract with zero external deps.
  * AUDIO/VIDEO remain clearly-marked deterministic FAKES (ffmpeg-class
  * bindings are genuinely absent from this container); their
  * signatures and batch shapes are the real contract, and synthetic
  * non-container payloads take the same fake path so the pipeline
  * stays testable end-to-end without media files. */
object MediaCodec {

  /** Magic-byte check for the containers the JDK decodes natively —
    * the JVM-side twin of [[MultimodalOps.sniffFormat]]'s image rows. */
  private def isJdkImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 && {
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // jpeg
      (p(0) == 0x89.toByte && p(1) == 0x50.toByte && p(2) == 0x4E.toByte &&
        p(3) == 0x47.toByte) || // png
      (p(0) == 0x47.toByte && p(1) == 0x49.toByte && p(2) == 0x46.toByte &&
        p(3) == 0x38.toByte) || // gif
      (p(0) == 0x42.toByte && p(1) == 0x4D.toByte) // bmp
    }

  /** True (width, height) of a JDK-decodable image payload. */
  def imageInfo(payload: Array[Byte]): Either[String, (Int, Int)] =
    if (!isJdkImage(payload))
      Left("unsupported: not a JDK-decodable image container")
    else
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) Left("corrupt: ImageIO could not parse container")
        else Right((img.getWidth, img.getHeight))
      } catch {
        case e: Exception => Left(s"corrupt: ${e.getMessage}")
      }

  /** Decode + resize an image payload to outW x outH grayscale pixels
    * in [0, 1]. PNG/JPEG/GIF/BMP payloads take the REAL path
    * (ImageIO decode, grayscale raster resample — headless-safe, no
    * external libs); anything else falls back to the deterministic
    * payload-seeded fake (the synthetic-pipeline stand-in; payloads
    * shorter than 64 bytes are "corrupt" there, mimicking truncation
    * handling). */
  def decodeImage(payload: Array[Byte], outW: Int, outH: Int): Either[String, Array[Float]] = {
    if (payload != null && isJdkImage(payload)) {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) Left("corrupt: ImageIO could not parse container")
        else {
          val gray = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val g = gray.createGraphics()
          try g.drawImage(img, 0, 0, outW, outH, null)
          finally g.dispose()
          val raster = gray.getRaster
          Right(Array.tabulate(outW * outH)(i =>
            raster.getSample(i % outW, i / outW, 0) / 255.0f))
        }
      } catch {
        case e: Exception => Left(s"corrupt: ${e.getMessage}")
      }
    } else if (payload == null || payload.length < 64) {
      Left("corrupt: payload too short")
    } else {
      val seed = java.util.Arrays.hashCode(payload).toLong
      val rnd = new scala.util.Random(seed)
      Right(Array.fill(outW * outH)(rnd.nextFloat()))
    }
  }

  /** Average-pool a pixel grid down to an 8x8-ish feature vector. */
  def pooledFeature(px: Array[Float], gridDim: Int): Array[Float] = {
    val n = px.length
    val cell = math.max(1, n / (gridDim * gridDim))
    Array.tabulate(math.min(gridDim * gridDim, n)) { i =>
      val from = i * cell
      val until = math.min(from + cell, n)
      var s = 0.0f
      var j = from
      while (j < until) { s += px(j); j += 1 }
      s / (until - from)
    }
  }
}
