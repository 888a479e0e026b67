package graft

import org.apache.spark.sql.functions._
import graft.text.TextPipelines

class TextPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: prefix-sum binning invariants on fixtures") {
    val docs = Tables.documents(spark, sfDir)
    val packed = TextPipelines.packSequences(docs, capacity = 100).cache()
    // offsets stay inside the bin
    assert(packed.filter(col("bin_offset") < 0 || col("bin_offset") >= 100).count() == 0)
    // bin ids are contiguous from 0
    val bins = packed.select("bin_id").distinct().as[Long].collect().sorted
    assert(bins.head == 0L && bins.sameElements(bins.head to bins.last))
    // reconstruction: bin_id * capacity + bin_offset == running prefix sum
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expect = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
    val bad = packed.join(expect, "doc_id")
      .filter(col("bin_id") * 100 + col("bin_offset") =!= col("before"))
    assert(bad.count() == 0)
  }

  test("packSequencesSharded: per-shard binning invariants, disjoint namespaced bin ids") {
    val docs = Tables.documents(spark, sfDir)
    val shards = 4
    val cap = 100
    val packed = TextPipelines.packSequencesSharded(docs, capacity = cap, shards = shards).cache()
    // every doc lands in its id-derived shard, offsets stay inside the bin
    assert(packed.filter(col("shard") =!= pmod(col("doc_id"), lit(shards))).count() == 0)
    assert(packed.filter(col("bin_offset") < 0 || col("bin_offset") >= cap).count() == 0)
    // bin ids live in their shard's namespace stripe — disjoint across shards
    assert(packed.filter(
      expr(s"bin_id DIV ${TextPipelines.ShardBinStride}") =!= col("shard")).count() == 0)
    // per-shard reconstruction: local bin * capacity + offset == tokens
    // before this doc WITHIN the shard
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expect = docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(shards)).cast("long").as("shard"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("doc_id"), col("before"))
    val bad = packed.join(expect, "doc_id")
      .filter(pmod(col("bin_id"), lit(TextPipelines.ShardBinStride)) * cap + col("bin_offset") =!= col("before"))
    assert(bad.count() == 0)
    // same docs, same token totals as the global variant (only the layout differs)
    val global = TextPipelines.packSequences(docs, capacity = cap)
    assert(packed.count() == global.count())
    packed.unpersist()
  }

  test("stratifiedSample: k=1 selects every row (regression: rnk % 1 is never 1)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
    val all = TextPipelines.stratifiedSample(docs, "source", k = 1)
    assert(all.count() == docs.count())
    assertThrows[IllegalArgumentException](TextPipelines.stratifiedSample(docs, "source", k = 0))
  }

  test("stratifiedSample: every k-th per stratum, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = TextPipelines.stratifiedSample(docs, "source", k = 10)
    val s2 = TextPipelines.stratifiedSample(docs, "source", k = 10)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // per-stratum sample size = ceil(stratum size / 10)
    val sizes = docs.groupBy("source").count()
      .join(s1.groupBy("source").agg(count(lit(1)).as("sampled")), "source")
    val wrong = sizes.filter(col("sampled") =!= ceil(col("count") / 10.0).cast("long"))
    assert(wrong.count() == 0)
    // lowest doc_id of each stratum is always selected (rank 1)
    val firsts = docs.groupBy("source").agg(min("doc_id").as("doc_id"))
    assert(firsts.join(s1, Seq("source", "doc_id"), "left_anti").count() == 0)
  }

  test("weightedMix: weight-1 keeps all, weight-0 keeps none, unknown sources dropped, deterministic") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = TextPipelines.weightedMix(docs,
      Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5))
    val kept = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.get("src0").contains(bySource("src0"))) // full weight: everything
    assert(!kept.contains("src1")) // zero weight
    assert(!kept.contains("src3")) // absent from the weight map
    // fractional weight lands near its rate (modular selection, not exact)
    val frac = kept.getOrElse("src2", 0L).toDouble / bySource("src2")
    assert(frac > 0.2 && frac < 0.8, s"src2 kept fraction $frac")
    // reproducible: no RNG anywhere
    val again = TextPipelines.weightedMix(docs, Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5))
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
  }

  test("qualityGate: every kept row clears all three gates") {
    val kept = TextPipelines.qualityGate(Tables.documents(spark, sfDir),
      minQuality = 0.5, minTokens = 20, maxTokens = 100000, langs = Seq("en", "de")).cache()
    assert(kept.count() > 0)
    assert(kept.filter(col("quality") < 0.5 || col("n_tokens") < 20 ||
      !col("lang_pred").isin("en", "de")).count() == 0)
    kept.unpersist()
  }

  test("tfIdfTopTerms: k rows per doc with >= k distinct terms, rank order matches score order") {
    val top = TextPipelines.tfIdfTopTerms(Tables.documents(spark, sfDir), k = 3).cache()
    val counts = top.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(counts.filter(col("n") > 3).count() == 0)
    // within a doc, scores are non-increasing with rank
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("rank"))
    val bad = top.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() == 0)
  }

  test("bigramSurprisal: hand-computed add-k NLL on a tiny corpus; <2-token docs excluded") {
    // corpus: "a b", "a b", "a c", "z"  →  c2("a b")=2, c2("a c")=1,
    // c1("a")=3, V={a,b,c}=3 (the 1-token doc contributes no bigrams and no
    // vocabulary — it is outside the trained model entirely)
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = TextPipelines.bigramSurprisal(d, addK = 0.5)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    def nll(c2: Double, c1: Double, v: Double) = -math.log((c2 + 0.5) / (c1 + 0.5 * v))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1L, 1L, r6(nll(2, 3, 3))),
      (2L, 1L, r6(nll(2, 3, 3))),
      (3L, 1L, r6(nll(1, 3, 3)))))
  }

  test("dsirScores: hand-computed likelihood ratios; short docs score 0 with 0 features") {
    val raw = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "x y"), (4L, "z")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" <= 2)
    val out = TextPipelines.dsirScores(raw, target).orderBy($"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // c_r(ab)=2 c_r(xy)=1, N_r=3; c_t(ab)=2, N_t=2; V=2, k=0.5
    val s1 = math.log((2 + 0.5) / (2 + 0.5 * 2)) - math.log((2 + 0.5) / (3 + 0.5 * 2))
    val s3 = math.log((0 + 0.5) / (2 + 0.5 * 2)) - math.log((1 + 0.5) / (3 + 0.5 * 2))
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 0L)))
    assert(math.abs(out(0)._3 - s1) < 1e-6 && math.abs(out(2)._3 - s3) < 1e-6)
    assert(out(3)._3 == 0.0)
    // target-like beats off-target
    assert(out(0)._3 > out(2)._3)
  }

  test("dsirScoresHashed: equals a MessageDigest bucket replay with the FIXED vocabulary") {
    val raw = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "x y q r"), (4L, "z")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" <= 2)
    val hexChars = 2
    val buckets = 256L
    def bucket(bg: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(
        bg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.map("%02x".format(_)).mkString.take(hexChars)
    }
    def bigrams(t: String): Seq[String] = {
      val w = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (w.length < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val rawOcc = Seq(1L -> "a b c", 2L -> "a b", 3L -> "x y q r", 4L -> "z")
      .flatMap { case (id, t) => bigrams(t).map(bg => (id, bucket(bg))) }
    val tgtOcc = rawOcc.filter(_._1 <= 2).map(_._2)
    val cR = rawOcc.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val cT = tgtOcc.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val (nR, nT, k) = (rawOcc.size.toDouble, tgtOcc.size.toDouble, 0.5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (1L to 4L).map { id =>
      val fs = rawOcc.filter(_._1 == id).map(_._2)
      if (fs.isEmpty) (id, 0L, 0.0)
      else (id, fs.size.toLong, r6(fs.map(f =>
        math.log((cT.getOrElse(f, 0.0) + k) / (nT + buckets * k)) -
          math.log((cR(f) + k) / (nR + buckets * k))).sum / fs.size))
    }
    val got = TextPipelines.dsirScoresHashed(raw, target, hexChars = hexChars)
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("dsirSelect: deterministic top-n by (score desc, id), all columns kept") {
    val raw = Seq(
      (1L, "a b", "m1"), (2L, "a b", "m2"), (3L, "x y", "m3"), (4L, "a b", "m4")
    ).toDF("doc_id", "text", "meta")
    val target = raw.filter($"doc_id" === 1).select($"doc_id", $"text")
    val picked = TextPipelines.dsirSelect(raw, target, n = 2)
    assert(picked.columns.toSeq == Seq("doc_id", "text", "meta"))
    // docs 1/2/4 tie on score; id tie-break keeps 1 and 2
    assert(picked.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("chunkTokens: sliding windows with stride overlap, redundant tail dropped") {
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = TextPipelines.chunkTokens(d, maxLen = 4, stride = 3)
      .orderBy($"chunk_id").as[(Long, Int, Int, Long, String)].collect().toSeq
    // starts 0, 3, 6; start 9's window [t9] adds nothing over [t6..t9]
    assert(out == Seq(
      (1L, 0, 0, 4L, "t0 t1 t2 t3"),
      (1L, 1, 3, 4L, "t3 t4 t5 t6"),
      (1L, 2, 6, 4L, "t6 t7 t8 t9")))
  }

  test("chunkTokens: doc at or under maxLen is one chunk; empty doc none; case preserved") {
    val d = Seq((1L, "A B c D"), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val out = TextPipelines.chunkTokens(d, maxLen = 4, stride = 3)
      .orderBy($"doc_id").as[(Long, Int, Int, Long, String)].collect().toSeq
    assert(out == Seq((1L, 0, 0, 4L, "A B c D"), (3L, 0, 0, 1L, "x")))
  }

  test("chunkTokens: stride == maxLen gives disjoint full-coverage blocks with a short tail") {
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = TextPipelines.chunkTokens(d, maxLen = 3, stride = 3)
      .orderBy($"chunk_id").as[(Long, Int, Int, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 0, 3L, "a b c"),
      (1L, 1, 3, 3L, "d e f"),
      (1L, 2, 6, 1L, "g")))
  }

  test("chunkTokens covers every token at least once on fixture docs") {
    val docs = Tables.documents(spark, sfDir)
    val chunks = TextPipelines.chunkTokens(docs, maxLen = 32, stride = 24)
    val covered = chunks.groupBy($"doc_id")
      .agg(max($"start_tok" + $"n_chunk_tokens").as("covered"))
    val totals = docs.select($"doc_id",
      graft.extensions.GraftExtensions.ws_tokens($"text").as("t"))
      .select($"doc_id", size($"t").cast("long").as("n")).filter($"n" > 0)
    assert(totals.join(covered, "doc_id").filter($"covered" =!= $"n").count() == 0)
  }

  test("chunkTokens fuzz: coverage, contiguous ids, ordered starts, disjoint-mode reassembly") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val maxLen = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(maxLen)
      val words = (0 until n).map(i => s"w$i")
      val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val out = TextPipelines.chunkTokens(d, maxLen, stride)
        .orderBy($"chunk_id").as[(Long, Int, Int, Long, String)].collect().toSeq
      val label = s"n=$n maxLen=$maxLen stride=$stride"
      // ids contiguous from 0, starts at stride spacing, windows in-bounds
      assert(out.map(_._2) == out.indices.toSeq, label)
      assert(out.forall(c => c._3 == c._2 * stride), label)
      assert(out.forall(c => c._3 + c._4 <= n && c._4 >= 1 && c._4 <= maxLen), label)
      // every token covered
      val covered = out.flatMap(c => c._3 until (c._3 + c._4.toInt)).toSet
      assert(covered == (0 until n).toSet, label)
      // each chunk is the exact token window
      out.foreach { c =>
        assert(c._5 == words.slice(c._3, c._3 + c._4.toInt).mkString(" "), label)
      }
      // disjoint mode: chunks reassemble the doc verbatim
      if (stride == maxLen)
        assert(out.map(_._5).mkString(" ") == words.mkString(" "), label)
    }
  }

  test("dsirScores covers EVERY raw doc exactly once") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextPipelines.dsirScores(docs, docs.filter($"lang" === "en"))
    assert(out.count() == docs.count())
    assert(out.select($"doc_id").distinct().count() == docs.count())
  }
}
