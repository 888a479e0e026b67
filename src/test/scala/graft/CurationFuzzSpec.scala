package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.text.TextPipelines

/** Seeded fuzz for the curation operators: each distributed implementation
  * must match an independent driver-side replay on arbitrary random inputs
  * — not just the fixtures its oracle query happens to cover. Values that
  * feed sums are integer-valued so Scala-vs-Spark accumulation order can
  * never drift a comparison.
  */
class CurationFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: densifyDaily equals a driver-side forward-fill replay on random sparse series") {
    val rnd = new scala.util.Random(31L)
    for (round <- 0 until 5) {
      val keys = Seq("k0", "k1", "k2").take(1 + rnd.nextInt(3))
      val base = java.time.LocalDate.of(2024, 1, 1)
      val rows = (0 until 40 + rnd.nextInt(60)).map { _ =>
        (keys(rnd.nextInt(keys.length)),
          java.sql.Date.valueOf(base.plusDays(rnd.nextInt(30))),
          rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("k", "d", "v")
      val got = Analytics.densifyDaily(df, "k", "d", sum(col("v")), "f")
        .select(col("k"), col("day").cast("string"), col("f"))
        .as[(String, String, Option[Long])].collect().toSet

      // independent replay: daily sums, global span, carry-forward per key
      val daily = rows.groupBy(r => (r._1, r._2.toString)).view.mapValues(_.map(_._3).sum).toMap
      val days = rows.map(_._2.toLocalDate)
      val span = Iterator.iterate(days.min)(_.plusDays(1)).takeWhile(!_.isAfter(days.max)).toSeq
      val expect = (for (k <- rows.map(_._1).distinct) yield {
        var lastSeen: Option[Long] = None
        span.map { d =>
          lastSeen = daily.get((k, d.toString)).orElse(lastSeen)
          (k, d.toString, lastSeen)
        }
      }).flatten.toSet
      assert(got == expect, s"round $round: ${(got diff expect).take(3)} vs ${(expect diff got).take(3)}")
    }
  }

  test("fuzz: deterministicSplit equals direct MessageDigest thresholding on random ids") {
    val rnd = new scala.util.Random(37L)
    val ids = (0 until 500).map(_ => rnd.nextLong() % 1000000L)
    val splits = Seq("test" -> 0.07, "val" -> 0.13, "train" -> 0.8)
    val got = TextPipelines.deterministicSplit(ids.toDF("id"), col("id"), splits)
      .as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex4(s: String): String =
      md.digest(s.getBytes("UTF-8")).take(2).map(b => f"${b & 0xff}%02x").mkString
    val t1 = f"${math.floor(0.07 * 65536).toLong}%04x"
    val t2 = f"${math.floor(0.20 * 65536).toLong}%04x"
    ids.foreach { id =>
      val h = hex4(id.toString)
      val expect = if (h < t1) "test" else if (h < t2) "val" else "train"
      assert(got(id) == expect, s"id $id: md5=$h got ${got(id)} want $expect")
    }
  }

  test("fuzz: trainBpeMerges equals a reference greedy trainer on random corpora") {
    val rnd = new scala.util.Random(41L)
    for (round <- 0 until 8) {
      val words = (0 until 5 + rnd.nextInt(8)).map { _ =>
        (0 until 1 + rnd.nextInt(5)).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
      }.distinct
      val freqs = words.map(w => w -> (1 + rnd.nextInt(15))).toMap
      val text = freqs.toSeq.flatMap { case (w, f) => Seq.fill(f)(w) }.mkString(" ")
      val got = TextPipelines.trainBpeMerges(Seq((1L, text)).toDF("doc_id", "text"), nMerges = 4)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq

      // reference trainer: same greedy most-frequent-pair algorithm, same
      // (count desc, left, right) tie-break, same left-to-right merge fold
      var dict: Map[Seq[String], Long] = freqs.map { case (w, f) => (w.map(_.toString), f.toLong) }
      val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var done = false
      for (rank <- 0 until 4 if !done) {
        val pairCounts = dict.toSeq.flatMap { case (syms, f) =>
          syms.zip(syms.drop(1)).map(p => (p, f))
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (pairCounts.isEmpty) done = true
        else {
          val ((a, b), c) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
          expect += ((rank, a, b, c))
          dict = dict.map { case (syms, f) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
              else out += x
            }
            (out.toSeq, f)
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap // merged words can collide
        }
      }
      assert(got == expect.toSeq, s"round $round (words=$freqs): $got vs $expect")
    }
  }

  test("fuzz: pmiCollocations equals a driver-side PMI replay on random corpora") {
    val rnd = new scala.util.Random(43L)
    for (round <- 0 until 5) {
      val vocabArr = Vector("aa", "bb", "cc", "dd")
      val docs = (0 until 10 + rnd.nextInt(10)).map { i =>
        (i.toLong, (0 until 2 + rnd.nextInt(10))
          .map(_ => vocabArr(rnd.nextInt(vocabArr.length))).mkString(" "))
      }
      val got = TextPipelines.pmiCollocations(docs.toDF("doc_id", "text"), minCount = 2, topN = 50)
        .as[(String, Long, Double)].collect().toSeq

      val toks = docs.map(_._2.split(" ").toSeq).filter(_.length >= 2)
      val grams = toks.flatMap(t => t.zip(t.drop(1)).map { case (a, b) => s"$a $b" })
      val unis = toks.flatten
      val cbg = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cuni = unis.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nbg = grams.size.toLong
      val ntok = unis.size.toLong
      val expect = cbg.toSeq.filter(_._2 >= 2).map { case (bg, c) =>
        val Array(w1, w2) = bg.split(" ")
        val pmi = BigDecimal(math.log((c.toDouble * ntok * ntok) / (nbg.toDouble * cuni(w1) * cuni(w2))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (bg, c, pmi)
      }.sortBy { case (bg, _, pmi) => (-pmi, bg) }.take(50)
      assert(got == expect, s"round $round: $got vs $expect")
    }
  }

  test("fuzz: exciseContaminated equals a brute-force window-coverage replay on random corpora") {
    // guards the r16 interval-merge rewrite: the merged-interval coverage
    // must equal the naive positions x hit-windows union on ANY input —
    // adjacent windows, nested overlaps, all-contaminated docs, short docs
    val r = new scala.util.Random(20260815L)
    (0 until 6).foreach { round =>
      val n = 2 + r.nextInt(4) // window length 2..5
      val vocab = (0 until 8).map(i => s"w$i")
      def text(len: Int): String = Seq.fill(len)(vocab(r.nextInt(vocab.size))).mkString(" ")
      val docs = (0L until 25L).map(id => (id, text(r.nextInt(20))))
      val bench = (0 until 5).map(_ => text(3 + r.nextInt(10)))
      val benchGrams: Set[Seq[String]] = bench.flatMap { t =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.length < n) Seq.empty else toks.sliding(n).map(_.toSeq).toSeq
      }.toSet
      val expect = docs.map { case (id, t) =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val covered = (0 to toks.length - n)
          .filter(p => benchGrams.contains(toks.slice(p, p + n)))
          .flatMap(p => p until p + n).toSet
        val kept = toks.zipWithIndex.collect { case (w, i) if !covered.contains(i) => w }
        (id, kept.mkString(" "), toks.length.toLong, covered.size.toLong)
      }
      val got = graft.dedup.Decontaminate.exciseContaminated(
          docs.toDF("doc_id", "text"), bench.toDF("text"), n = n)
        .orderBy($"doc_id").as[(Long, String, Long, Long)].collect().toSeq
      assert(got == expect, s"round $round (n=$n)")
    }
  }
}
