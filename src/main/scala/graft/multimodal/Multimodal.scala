package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * Two decode tiers:
  * - REAL decoders for the formats the JDK itself can read — images
  *   (PNG/JPEG/BMP/GIF via ImageIO: [[decodeImages]]/[[resizeImages]]) and
  *   audio (WAV/AIFF via javax.sound: [[decodeAudio]]) — spec-verified
  *   against synthesized media;
  * - deterministic STUBS ([[decodeStub]]/[[resizeStub]]/[[sampleFrames]])
  *   for formats with no in-JVM codec (video) and for the text fixtures,
  *   which are not media — these keep the oracle queries reproducible.
  *
  * Common to both tiers is the Spark-side contract a 100 TB media pipeline
  * needs:
  * - schema: (id, media binary, media_type string, meta struct)
  * - partition-local batch processing via `mapPartitions` over a typed
  *   Dataset (the Scala analogue of `mapInPandas` batches: the decode
  *   library is initialized once per partition, rows stream through it)
  * - repartitioning by size so each task's batch of blobs fits executor
  *   memory, not driver memory.
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte], media_type: String)
  case class MediaFeatures(
      id: Long,
      media_type: String,
      n_bytes: Long,
      // fake "decoded" metadata — deterministic functions of the bytes so
      // tests are stable; a real deployment swaps decodeStub for a codec.
      width: Int,
      height: Int,
      checksum: Long)

  /** Deterministic stand-in decoder for non-media blobs (the text fixtures)
    * and formats without an in-JVM codec — [[decodeImages]] is the real
    * path for images. The call sites, batching, and schema are identical.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(checksum) % 1024).toInt
    val h = 64 + (math.abs(checksum / 1024) % 1024).toInt
    (w, h, checksum)
  }

  /** Wrap any table into the canonical media schema by treating a string
    * column's UTF-8 bytes as the opaque blob — the fixture path for tests
    * (testdata has no binary columns).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit(mediaType).as("media_type"))

  /** Partition-parallel feature extraction. `batchPartitions` controls blob
    * batch sizing: at scale, pick it so (partition bytes ≈ a few hundred MB)
    * — the blobs never pass through the driver and never shuffle (narrow
    * repartition only when asked).
    */
  def extractFeatures(media: DataFrame, batchPartitions: Option[Int] = None): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized = batchPartitions.map(media.repartition).getOrElse(media)
    sized.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens here (decoder handles, model weights, ...)
      rows.map { r =>
        val (w, h, c) = decodeStub(r.media)
        MediaFeatures(r.id, r.media_type, r.media.length.toLong, w, h, c)
      }
    }
  }

  // ------------------------------------------------------------ real codecs
  //
  // The JDK ships actual decoders: javax.imageio reads PNG/JPEG/BMP/GIF and
  // javax.sound.sampled reads WAV/AIFF — no external libraries. The
  // operators below are REAL decode paths under the same partition-batched
  // contract as the stubs (stubs remain for the text fixtures, which are
  // not media). Undecodable blobs are flagged, never thrown: at 100 TB a
  // corrupt blob must not kill a 10-hour job.

  case class ImageMeta(
      id: Long, width: Int, height: Int, n_pixels: Long,
      mean_luma: Double, format_ok: Boolean)

  case class AudioMeta(
      id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      duration_sec: Double, format_ok: Boolean)

  /** Real image decode (JDK ImageIO): dimensions + mean luminance sampled
    * on a bounded grid (≤ 64×64 probes per blob, so per-row cost is capped
    * regardless of image size). Partition-batched: codec setup happens once
    * per partition, blobs never visit the driver.
    */
  def decodeImages(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec init: no disk-backed stream cache for in-memory
      // blobs, headless rendering pipeline
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          if (img == null) ImageMeta(r.id, 0, 0, 0L, 0.0, format_ok = false)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val sx = math.max(1, w / 64)
            val sy = math.max(1, h / 64)
            var sum = 0.0
            var n = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                n += 1
                x += sx
              }
              y += sy
            }
            ImageMeta(r.id, w, h, w.toLong * h, if (n == 0) 0.0 else sum / n, format_ok = true)
          }
        } catch { case scala.util.control.NonFatal(_) =>
          ImageMeta(r.id, 0, 0, 0L, 0.0, format_ok = false)
        }
      }
    }
  }

  /** Synthesize solid-gray PNGs from an (id, width, height, gray) spec —
    * real encoded images whose decoded properties are pure arithmetic of
    * the spec, which makes the REAL codec roundtrip (encode → PNG bytes →
    * [[decodeImages]]) oracle-checkable in plain SQL.
    */
  def synthesizeImages(spec: DataFrame): DataFrame = {
    val spark = spec.sparkSession
    import spark.implicits._
    spec
      .select(col("id").cast("long"), col("width").cast("int"),
        col("height").cast("int"), col("gray").cast("int"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, w, h, c) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          g.setColor(new java.awt.Color(c, c, c))
          g.fillRect(0, 0, w, h)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRow(id, bos.toByteArray, "image/png")
        }
      }.toDF()
  }

  /** Real image resize (JDK Graphics2D, headless): scale to `targetWidth`
    * preserving aspect ratio, re-encode as `format`. Blobs that don't
    * decode pass through unchanged (flag-don't-throw, as above).
    */
  def resizeImages(media: DataFrame, targetWidth: Int = 64, format: String = "png"): DataFrame = {
    require(targetWidth >= 1, s"targetWidth must be >= 1, got $targetWidth")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          if (img == null) r
          else {
            val h = math.max(1, (img.getHeight.toLong * targetWidth / math.max(1, img.getWidth)).toInt)
            val dst = new java.awt.image.BufferedImage(
              targetWidth, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.drawImage(img, 0, 0, targetWidth, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            // write() returns false (no exception) when no writer exists
            // for `format` — pass the row through rather than emitting a
            // silent zero-byte blob
            if (javax.imageio.ImageIO.write(dst, format, bos))
              MediaRow(r.id, bos.toByteArray, s"image/$format")
            else r
          }
        } catch { case scala.util.control.NonFatal(_) => r }
      }
    }.toDF()
  }

  /** Synthesize real PCM-16 silence WAVs from an (id, sample_rate, channels,
    * n_frames) spec — the audio analogue of [[synthesizeImages]]: the JDK's
    * WAV writer produces real RIFF bytes whose decoded header fields are
    * pure arithmetic of the spec, so the REAL codec roundtrip (encode → WAV
    * bytes → [[decodeAudio]]) is oracle-checkable in plain SQL.
    */
  def synthesizeAudio(spec: DataFrame): DataFrame = {
    val spark = spec.sparkSession
    import spark.implicits._
    spec
      .select(col("id").cast("long"), col("sample_rate").cast("int"),
        col("channels").cast("int"), col("n_frames").cast("int"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, rate, ch, frames) =>
          val fmt = new javax.sound.sampled.AudioFormat(
            rate.toFloat, 16, ch, true, false) // PCM signed 16-bit little-endian
          val pcm = new Array[Byte](frames * fmt.getFrameSize) // silence
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          ais.close()
          MediaRow(id, bos.toByteArray, "audio/wav")
        }
      }.toDF()
  }

  /** Real audio header decode (JDK javax.sound.sampled — WAV/AIFF): sample
    * rate, channels, frame count, duration. Header-only — the PCM payload
    * is not pulled through memory.
    */
  def decodeAudio(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.media))
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val out = AudioMeta(r.id, fmt.getSampleRate.toInt, fmt.getChannels, frames,
            if (fmt.getSampleRate > 0) frames / fmt.getSampleRate.toDouble else 0.0,
            format_ok = true)
          ais.close()
          out
        } catch { case scala.util.control.NonFatal(_) =>
          AudioMeta(r.id, 0, 0, 0L, 0.0, format_ok = false)
        }
      }
    }
  }

  /** Deterministic "resize" stub: byte-domain downsample keeping every
    * `factor`-th byte — stands in for an image resize the way decodeStub
    * stands in for a decoder (no codecs in-container). The Spark-side
    * contract (binary in → smaller binary out, map-only, partition-batched)
    * is the real artifact.
    */
  def resizeStub(media: DataFrame, factor: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val out = Array.ofDim[Byte]((r.media.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.media(i * factor); i += 1 }
        MediaRow(r.id, out, r.media_type)
      }
    }.toDF()
  }

  /** Deterministic frame-sampling stub for "video": pick every `stride`-th
    * byte offset as a fake frame index list — exercises the
    * array-of-offsets schema a real frame sampler produces.
    */
  def sampleFrames(media: DataFrame, stride: Int = 100): DataFrame =
    media.select(
      col("id"),
      col("media_type"),
      when(octet_length(col("media")) === 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), octet_length(col("media")) - 1, lit(stride)))
        .as("frame_offsets"))
}
