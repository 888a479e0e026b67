package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container has no image/audio codecs) — what is real and tested here is
  * the Spark-side contract a 100 TB media pipeline needs:
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

  /** Deterministic stand-in for a real decoder (no codecs in-container).
    * Swap this body for e.g. javax.imageio / ffmpeg bindings in production —
    * the call sites, batching, and schema do not change.
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
