package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Seeded fuzz for the three real media codec roundtrips: random specs —
  * dimensions down to 1×1, frame/sample counts down to 0, gray values at
  * both ends — through synthesize → real JDK codec → decode, checked
  * against pure arithmetic of the spec (solid gray g has mean luma exactly
  * g; frame f of a video is gray (gray0 + 37f) mod 256; WAV duration is
  * frames/rate).
  */
class MediaFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: image synthesize→decode roundtrip matches spec arithmetic (incl. 1×1)") {
    val rnd = new Random(41L)
    val specs = (0 until 100).map { i =>
      (i.toLong, 1 + rnd.nextInt(40), 1 + rnd.nextInt(40), rnd.nextInt(256))
    } ++ Seq((100L, 1, 1, 0), (101L, 1, 1, 255), (102L, 1, 37, 128), (103L, 64, 1, 7))
    val media = Multimodal.synthesizeImages(
      specs.toDF("id", "width", "height", "gray"))
    val metas = Multimodal.decodeImages(media).collect().map(m => m.id -> m).toMap
    specs.foreach { case (id, w, h, g) =>
      val m = metas(id)
      assert(m.format_ok && m.width == w && m.height == h && m.n_pixels == w.toLong * h,
        s"spec ($id,$w,$h,$g) → $m")
      assert(math.abs(m.mean_luma - g) < 1e-6, s"spec ($id,$w,$h,$g) luma → ${m.mean_luma}")
    }
  }

  test("fuzz: audio synthesize→decode roundtrip matches spec arithmetic (incl. 0/1 frames)") {
    val rnd = new Random(43L)
    val rates = Vector(1, 8000, 11025, 16000, 22050, 44100, 48000)
    val specs = (0 until 100).map { i =>
      (i.toLong, rates(rnd.nextInt(rates.length)), 1 + rnd.nextInt(2), rnd.nextInt(4000))
    } ++ Seq((100L, 8000, 1, 0), (101L, 8000, 2, 1), (102L, 1, 1, 1))
    val media = Multimodal.synthesizeAudio(
      specs.toDF("id", "sample_rate", "channels", "n_frames"))
    val metas = Multimodal.decodeAudio(media).collect().map(m => m.id -> m).toMap
    specs.foreach { case (id, rate, ch, frames) =>
      val m = metas(id)
      assert(m.format_ok && m.sample_rate == rate && m.channels == ch
        && m.n_frames == frames.toLong, s"spec ($id,$rate,$ch,$frames) → $m")
      assert(math.abs(m.duration_sec - frames.toDouble / rate) < 1e-9,
        s"spec ($id,$rate,$ch,$frames) duration → ${m.duration_sec}")
    }
  }

  test("fuzz: video synthesize→decode roundtrip matches spec arithmetic (incl. 0/1 frames, 1×1)") {
    val rnd = new Random(47L)
    val specs = (0 until 60).map { i =>
      (i.toLong, 1 + rnd.nextInt(24), 1 + rnd.nextInt(24), rnd.nextInt(7), rnd.nextInt(256))
    } ++ Seq((60L, 1, 1, 1, 0), (61L, 1, 1, 1, 255), (62L, 2, 2, 0, 100), (63L, 1, 16, 6, 250))
    val media = Multimodal.synthesizeVideos(
      specs.toDF("id", "width", "height", "n_frames", "gray0"))
    val metas = Multimodal.decodeVideos(media).collect().map(m => m.id -> m).toMap
    specs.foreach { case (id, w, h, n, g0) =>
      val m = metas(id)
      if (n == 0) {
        // a frameless container decodes to the flagged row (documented
        // contract: no first frame → not a usable video)
        assert(!m.format_ok && m.n_frames == 0L, s"spec ($id,$w,$h,$n,$g0) → $m")
      } else {
        assert(m.format_ok && m.width == w && m.height == h && m.n_frames == n.toLong,
          s"spec ($id,$w,$h,$n,$g0) → $m")
        assert(math.abs(m.first_luma - g0) < 1e-6, s"spec ($id,$w,$h,$n,$g0) first → ${m.first_luma}")
        assert(math.abs(m.last_luma - ((g0 + 37 * (n - 1)) % 256)) < 1e-6,
          s"spec ($id,$w,$h,$n,$g0) last → ${m.last_luma}")
      }
    }
  }
}
