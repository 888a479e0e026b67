package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.similarity.Similarity
import graft.text.TextPipelines

/** The round-6 curation operators: densification, profiling, deterministic
  * splits, collocations, and k-means clustering. Each oracle-gated query
  * (q109–q113) has its engine-parity checked by the DuckDB gate; these
  * specs pin the SEMANTICS on hand-computable fixtures — including the
  * planted-cluster recovery that gates the iterative k-means FIT (q114 hash-gates the assignment half).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("densifyDaily: dense grid, forward fill carries last observation, NULL before first") {
    val obs = Seq(
      ("a", "2024-01-02", 10.0), ("a", "2024-01-02", 5.0), ("a", "2024-01-05", 7.0),
      ("b", "2024-01-03", 1.0))
      .toDF("k", "d", "v").withColumn("d", to_date(col("d")))
    val got = Analytics.densifyDaily(obs, "k", "d", sum(col("v")), "f")
      .orderBy("k", "day")
      .select(col("k"), col("day").cast("string"), col("f"))
      .as[(String, String, Option[Double])].collect().toSeq
    // span is the TABLE's min..max (01-02 .. 01-05), for every key
    assert(got.map(_._1).count(_ == "a") == 4 && got.map(_._1).count(_ == "b") == 4)
    assert(got.filter(_._1 == "a").map(_._3) ==
      Seq(Some(15.0), Some(15.0), Some(15.0), Some(7.0)), s"ffill wrong: $got")
    assert(got.filter(_._1 == "b").map(_._3) ==
      Seq(None, Some(1.0), Some(1.0), Some(1.0)),
      "days before a key's first observation must stay NULL")
  }

  test("profileColumns: null/distinct counts and decimal-canonical bounds") {
    val df = Seq(
      (Some(1), Some("x"), Some(2.5)), (Some(3), None, Some(-0.5)),
      (None, Some("x"), Some(2.5)))
      .toDF("i", "s", "d")
    val got = Analytics.profileColumns(df, Seq("i", "s", "d"))
      .as[(String, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("d", 0L, 2L, "-0.500000", "2.500000"),
      ("i", 1L, 2L, "1.000000", "3.000000"),
      ("s", 1L, 1L, "x", "x")), s"profile mismatch: $got")
  }

  test("deterministicSplit: pure function of id, remainder split, fractions roughly honored") {
    val docs = Tables.documents(spark, sfDir)
    val splits = Seq("test" -> 0.05, "val" -> 0.05, "train" -> 0.9)
    val a = TextPipelines.deterministicSplit(docs, col("doc_id"), splits)
      .select("doc_id", "split")
    // re-running and subsetting never reassigns: split is id-pure
    val b = TextPipelines.deterministicSplit(docs.limit(50), col("doc_id"), splits)
      .select("doc_id", "split")
    assert(b.join(a, "doc_id").filter(a("split") =!= b("split")).count() == 0)
    val n = docs.count().toDouble
    val byName = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("test", "val", "train"))
    // 5% ± generous tolerance at fixture scale (binomial noise)
    assert(byName("test") / n > 0.01 && byName("test") / n < 0.12, byName.toString)
    assert(byName("train") / n > 0.8, byName.toString)
    assertThrows[IllegalArgumentException] {
      TextPipelines.deterministicSplit(docs, col("doc_id"), Seq("a" -> 0.6, "b" -> 0.6, "c" -> 0.1))
    }
  }

  test("pmiCollocations: hand-computed PMI on a tiny corpus; minCount gates") {
    // corpus: "a b" ×3, "a c" ×1  → bigrams: (a b)×3, (a c)×1; tokens: a×4 b×3 c×1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val got = TextPipelines.pmiCollocations(docs, minCount = 2, topN = 10)
      .as[(String, Long, Double)].collect().toSeq
    // only "a b" survives minCount=2; pmi = ln((3/4) / ((4/8)*(3/8)))
    val expect = BigDecimal(math.log((3.0 * 8 * 8) / (4.0 * 4 * 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("a b", 3L, expect)), s"got $got, want pmi=$expect")
  }

  test("clusterEmbeddings recovers planted well-separated clusters exactly") {
    // 4 clusters along distinct axes, tiny within-cluster jitter on a
    // DIFFERENT axis — cosine separation is huge, so Lloyd must converge to
    // the planted partition whatever the seeding
    val dim = 8
    val rows = for {
      c <- 0 until 4
      j <- 0 until 25
    } yield {
      val v = Array.fill(dim)(0.0f)
      v(c) = 1.0f
      v(c + 4) = 0.01f * (j % 5)
      (c * 25L + j, v.toSeq)
    }
    val corpus = rows.toDF("id", "vec")
    val got = Similarity.clusterEmbeddings(corpus, dim, k = 4, iters = 5)
      .withColumn("planted", (col("id") / 25).cast("int"))
    // every planted cluster maps to exactly one k-means cluster and the
    // sizes are exact — i.e. the partition is recovered up to relabeling
    val purity = got.groupBy("planted").agg(count_distinct(col("cluster")).as("nc"))
      .filter(col("nc") =!= 1).count()
    assert(purity == 0, "a planted cluster was split")
    val sizes = got.groupBy("cluster").count().select("count").as[Long].collect().toSeq
    assert(sizes.sorted == Seq(25L, 25L, 25L, 25L), s"sizes: $sizes")
  }

  test("trainBpeMerges: textbook corpus learns the textbook merges in order") {
    // the classic BPE walkthrough dict: hug×10 pug×5 pun×12 bun×4 hugs×5
    // pair counts → (u,g)=20 first, then (u,n)=16, then (h,ug)=15
    val text = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
      Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val got = TextPipelines.trainBpeMerges(docs, nMerges = 3)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((0, "u", "g", 20L), (1, "u", "n", 16L), (2, "h", "ug", 15L)),
      s"merge sequence wrong: $got")
    // merge exhaustion: a corpus of single-char words has no pairs to learn
    val tiny = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(TextPipelines.trainBpeMerges(tiny, nMerges = 5).count() == 0)
  }

  test("bpeTokenCounts: learned merges segment seen AND unseen words correctly") {
    // merges learned from the textbook corpus: (u g), (u n), (h ug) →
    // hug=[hug]=1, pug=[p ug]=2, pun=[p un]=2, bun=[b un]=2, hugs=[hug s]=2,
    // and the UNSEEN word dug=[d ug]=2 (merges apply to any char sequence)
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"))
    val docs = Seq(
      (1L, "hug pug pun"), // 1+2+2 = 5 pieces over 3 words
      (2L, "bun hugs dug")) // 2+2+2 = 6 pieces over 3 words
      .toDF("doc_id", "text")
    val got = TextPipelines.bpeTokenCounts(docs, merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 5L), (2L, 3L, 6L)), s"BPE counts wrong: $got")
  }

  test("clusterBalancedSample: at most perCluster ids per cluster, deterministic") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val s1 = Similarity.clusterBalancedSample(e, dim = 64, k = 4, perCluster = 10, iters = 2)
    val over = s1.groupBy("cluster").count().filter(col("count") > 10).count()
    assert(over == 0, "a cluster exceeded its quota")
    val s2 = Similarity.clusterBalancedSample(e, dim = 64, k = 4, perCluster = 10, iters = 2)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0,
      "balanced sample must be deterministic")
  }
}
