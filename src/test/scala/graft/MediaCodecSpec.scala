package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** The real JDK-codec media paths, verified against media synthesized
  * in-test: solid-color PNGs (lossless — exact luma), a JPEG (lossy —
  * toleranced), a WAV with a known frame count, and garbage bytes (must be
  * flagged, not thrown).
  */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def wav(sampleRate: Float, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeImages: real PNG/JPEG decode — dimensions exact, luma exact for lossless") {
    val red = 0xff0000
    val gray = 0x808080
    val rows = Seq(
      (1L, png(10, 20, red), "image/png"),
      (2L, png(33, 7, gray), "image/png"),
      (3L, jpeg(16, 16, gray), "image/jpeg"),
      (4L, Array[Byte](1, 2, 3, 4, 5), "image/png")) // garbage
      .toDF("id", "media", "media_type")
    val metas = Multimodal.decodeImages(rows).collect().map(m => m.id -> m).toMap
    assert(metas(1L).format_ok && metas(1L).width == 10 && metas(1L).height == 20
      && metas(1L).n_pixels == 200L)
    assert(math.abs(metas(1L).mean_luma - 0.299 * 255) < 1e-9) // solid red, lossless
    assert(metas(2L).format_ok && metas(2L).width == 33 && metas(2L).height == 7)
    assert(math.abs(metas(2L).mean_luma - 128.0) < 1e-9) // solid 0x808080
    assert(metas(3L).format_ok && metas(3L).width == 16 && metas(3L).height == 16)
    assert(math.abs(metas(3L).mean_luma - 128.0) < 8.0) // JPEG is lossy
    assert(!metas(4L).format_ok, "garbage must be flagged, not decoded or thrown")
  }

  test("resizeImages: real downscale preserves aspect and re-decodes at the new size") {
    val rows = Seq((1L, png(100, 50, 0x4080c0), "image/png")).toDF("id", "media", "media_type")
    val resized = Multimodal.resizeImages(rows, targetWidth = 20)
    val meta = Multimodal.decodeImages(resized).collect().head
    assert(meta.format_ok && meta.width == 20 && meta.height == 10)
    // solid color survives the rescale (lossless format)
    val expected = 0.299 * 0x40 + 0.587 * 0x80 + 0.114 * 0xc0
    assert(math.abs(meta.mean_luma - expected) < 1.0)
    // garbage passes through unchanged
    val junk = Seq((2L, Array[Byte](9, 9, 9), "image/png")).toDF("id", "media", "media_type")
    val out = Multimodal.resizeImages(junk, targetWidth = 20).collect().head
    assert(out.getAs[Array[Byte]]("media").toSeq == Seq[Byte](9, 9, 9))
  }

  test("decodeAudio: real WAV header decode — rate, channels, frames, duration") {
    val rows = Seq(
      (1L, wav(8000f, 1600), "audio/wav"),
      (2L, Array[Byte](0, 1, 2), "audio/wav"))
      .toDF("id", "media", "media_type")
    val metas = Multimodal.decodeAudio(rows).collect().map(m => m.id -> m).toMap
    assert(metas(1L).format_ok && metas(1L).sample_rate == 8000 && metas(1L).channels == 1
      && metas(1L).n_frames == 1600L && math.abs(metas(1L).duration_sec - 0.2) < 1e-9)
    assert(!metas(2L).format_ok)
  }

  test("video: AVI/MPNG roundtrip — frame count, dims, per-frame luma exact; garbage flagged") {
    import spark.implicits._
    val spec = Seq((1L, 32, 16, 4, 100), (2L, 16, 8, 2, 240)) // 240+37 wraps mod 256
      .toDF("id", "width", "height", "n_frames", "gray0")
    val media = graft.multimodal.Multimodal.synthesizeVideos(spec)
    val metas = graft.multimodal.Multimodal.decodeVideos(media)
      .collect().map(m => m.id -> m).toMap
    val m1 = metas(1L)
    assert(m1.format_ok && m1.width == 32 && m1.height == 16 && m1.n_frames == 4L)
    assert(math.abs(m1.first_luma - 100.0) < 1e-9, m1.toString)
    assert(math.abs(m1.last_luma - (100 + 37 * 3)) < 1e-9, m1.toString)
    val m2 = metas(2L)
    assert(m2.format_ok && m2.n_frames == 2L)
    assert(math.abs(m2.last_luma - ((240 + 37) % 256)) < 1e-9, m2.toString)
    // non-AVI and truncated blobs are flagged, never thrown
    val bad = Seq(
      graft.multimodal.Multimodal.MediaRow(9L, "not a riff file at all".getBytes, "video/x-msvideo"),
      graft.multimodal.Multimodal.MediaRow(10L, Array[Byte](1, 2, 3), "video/x-msvideo"))
      .toDF()
    val badMetas = graft.multimodal.Multimodal.decodeVideos(bad).collect()
    assert(badMetas.forall(!_.format_ok))
  }

  test("video: valid RIFF/AVI header with lying chunk sizes is flagged, no hang or throw") {
    import spark.implicits._
    // start from a REAL synthesized AVI so every header chunk is valid,
    // then overwrite the first frame chunk's u32 size with values its
    // container cannot hold — including one that wraps negative as an Int
    val spec = Seq((1L, 8, 8, 2, 50)).toDF("id", "width", "height", "n_frames", "gray0")
    val good = graft.multimodal.Multimodal.synthesizeVideos(spec)
      .collect().head.getAs[Array[Byte]]("media")
    def corruptFirstFrame(sizeBytes: Array[Byte]): Array[Byte] = {
      val b = good.clone()
      val idx = b.indices.indexWhere(i => i + 4 <= b.length &&
        new String(b, i, 4, "US-ASCII") == "00dc")
      assert(idx > 0, "synthesized AVI must contain a 00dc frame chunk")
      System.arraycopy(sizeBytes, 0, b, idx + 4, 4)
      b
    }
    val oversize = corruptFirstFrame(Array(0xff, 0xff, 0xff, 0x00).map(_.toByte)) // ~16 MB > container
    val wrapping = corruptFirstFrame(Array(0xf0, 0xff, 0xff, 0xff).map(_.toByte)) // u32 > Int.MaxValue
    val rows = Seq(
      graft.multimodal.Multimodal.MediaRow(20L, oversize, "video/x-msvideo"),
      graft.multimodal.Multimodal.MediaRow(21L, wrapping, "video/x-msvideo")).toDF()
    val fut = scala.concurrent.Future {
      graft.multimodal.Multimodal.decodeVideos(rows).collect()
    }(scala.concurrent.ExecutionContext.global)
    val metas = scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration(60, "s"))
    assert(metas.length == 2 && metas.forall(!_.format_ok),
      s"lying chunk sizes must flag the blob: ${metas.mkString(" | ")}")
  }
}
