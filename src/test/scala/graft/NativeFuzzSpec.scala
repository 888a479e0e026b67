package graft

import org.apache.spark.sql.functions._
import graft.extensions.GraftExtensions
import graft.functions.TextFunctions
import graft.similarity.Similarity

/** Seeded fuzz: the native expressions must match their column-expression
  * reference formulations on arbitrary text — multi-byte UTF-8, surrogate
  * pairs, every Java-regex `\s` whitespace char, empty/blank strings —
  * not just the (ASCII, single-spaced) fixture corpus.
  */
class NativeFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val alphabet: Vector[String] =
    Vector("a", "b", "z", "Q", "0", "9", ".", ",", "'",
      "é", "ü", "ñ", "ح", "中", "文", "и", "𝄞", "🙂", // 2-4 byte UTF-8 incl. surrogate pairs
      " ", " ", " ", "\t", "\n", "\r", "\f", "", "  ")

  private def fuzzStrings(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(80)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    } :+ "" :+ " " :+ "\t\n" :+ "ció que sch the"
  }

  test("fuzz: shingle_strings/shingle_hashes match the HOF chain on arbitrary unicode text") {
    GraftExtensions.register(spark)
    val df = fuzzStrings(400, seed = 7L).toDF("text")
    for (k <- Seq(1, 2, 3, 5)) {
      val diff = df.select(
        TextFunctions.shinglesHof(col("text"), k).as("hof_s"),
        GraftExtensions.shingle_strings(col("text"), lit(k)).as("nat_s"),
        TextFunctions.shingleHashesHof(col("text"), k).as("hof_h"),
        GraftExtensions.shingle_hashes(col("text"), lit(k)).as("nat_h"))
        .filter(col("hof_s") =!= col("nat_s") || col("hof_h") =!= col("nat_h"))
      assert(diff.count() == 0, s"k=$k: ${diff.collect().take(3).mkString("; ")}")
    }
  }

  test("fuzz: lang_id_ngram matches the regex formulation on arbitrary unicode text") {
    GraftExtensions.register(spark)
    val df = fuzzStrings(400, seed = 11L).toDF("text")
    val diff = df.select(col("text"),
      TextFunctions.langIdNgramRegex(col("text")).as("rx"),
      GraftExtensions.lang_id_ngram(col("text")).as("nat"))
      .filter(col("rx") =!= col("nat"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("fuzz: hyperplane_sig matches the HOF on random vectors; degenerate inputs give 0") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(13L)
    val vecs = (0 until 200).map(_ => Seq.fill(16)(rnd.nextGaussian() * 10))
    val df = vecs.toDF("v")
    val diff = df.select(
      Similarity.hofHyperplaneSignature(col("v"), 16, 12, 99L).as("hof"),
      GraftExtensions.hyperplane_sig(col("v"), lit(16), lit(12), lit(99L)).as("nat"))
      .filter(col("hof") =!= col("nat"))
    assert(diff.count() == 0)
    // wrong length and null elements → 0, matching the HOF's null-propagated bits
    val deg = spark.sql(
      """SELECT hyperplane_sig(array(1.0D, 2.0D), 16, 12, 99) AS short,
        |       hyperplane_sig(CAST(array(1.0, NULL, 3.0) AS ARRAY<DOUBLE>), 3, 12, 99) AS withnull
        |""".stripMargin).collect().head
    assert(deg.getLong(0) == 0L && deg.getLong(1) == 0L)
  }

  test("fuzz: ws_tokens/token_count match the HOF chain on arbitrary unicode text") {
    GraftExtensions.register(spark)
    val df = fuzzStrings(400, seed = 19L).toDF("text")
    val diff = df.select(col("text"),
      TextFunctions.tokens(col("text")).as("hof_t"),
      GraftExtensions.ws_tokens(col("text")).as("nat_t"),
      TextFunctions.tokenCount(col("text")).as("hof_n"),
      GraftExtensions.token_count(col("text")).as("nat_n"),
      // qualityGate relies on this: case folding never moves a token
      // boundary, so counting lowercased tokens equals counting originals
      size(GraftExtensions.ws_tokens(lower(col("text")))).as("lower_n"))
      .filter(col("hof_t") =!= col("nat_t") || col("hof_n") =!= col("nat_n") ||
        col("hof_n") =!= col("lower_n"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("fuzz: lang_stats matches the HOF signal formulations on arbitrary unicode text") {
    GraftExtensions.register(spark)
    val df = fuzzStrings(400, seed = 29L).toDF("text")
      .select(col("text"), GraftExtensions.lang_stats(col("text")).as("st"))
    def hofHits(set: Seq[String]) =
      size(filter(TextFunctions.tokens(lower(col("text"))), t =>
        t.isin(set.map(_.asInstanceOf[Any]): _*)))
    val diff = df.select(col("text"), col("st"),
      TextFunctions.tokenCount(col("text")).as("hof_n"),
      TextFunctions.avgTokenLen(col("text")).as("hof_avg"),
      TextFunctions.statsAvgTokenLen(col("st")).as("nat_avg"),
      TextFunctions.stopwordRatio(col("text")).as("hof_ratio"),
      TextFunctions.statsStopwordRatio(col("st")).as("nat_ratio"),
      TextFunctions.langId(col("text")).as("hof_lang"),
      TextFunctions.statsLangId(col("st")).as("nat_lang"),
      TextFunctions.qualityScore(col("text")).as("hof_q"),
      TextFunctions.statsQualityScore(col("st"), col("text")).as("nat_q"),
      hofHits(TextFunctions.StopEn).as("hof_en"), hofHits(TextFunctions.StopDe).as("hof_de"),
      hofHits(TextFunctions.StopEs).as("hof_es"), hofHits(TextFunctions.StopFr).as("hof_fr"))
      .filter(col("st.n_tokens") =!= col("hof_n") ||
        col("nat_avg") =!= col("hof_avg") || col("nat_ratio") =!= col("hof_ratio") ||
        col("nat_lang") =!= col("hof_lang") || col("nat_q") =!= col("hof_q") ||
        col("st.en") =!= col("hof_en") || col("st.de") =!= col("hof_de") ||
        col("st.es") =!= col("hof_es") || col("st.fr") =!= col("hof_fr"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("fuzz: simhash64 over term vectors equals the 64-sum relational formulation") {
    GraftExtensions.register(spark)
    val texts = fuzzStrings(120, seed = 23L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val tf = df
      .select(col("id"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
    // reference: the relational vote sums over xxhash64(tok), weighted by c
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(xxhash64(col("tok")), b).bitwiseAND(lit(1L)) === 1, col("c"))
        .otherwise(-col("c"))).as(s"v$b"))
    val packed = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val rel = tf.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as("rel_sig"))
    val nat = tf.groupBy("id")
      .agg(sort_array(collect_list(struct(col("tok"), col("c")))).as("vec"))
      .select(col("id"), GraftExtensions.simhash64(col("vec")).as("nat_sig"))
    val diff = rel.join(nat, "id").filter(col("rel_sig") =!= col("nat_sig"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
    // the hashed-key path (bigint term keys = xxhash64(tok)) must agree too
    val natH = tf.groupBy("id")
      .agg(sort_array(collect_list(struct(xxhash64(col("tok")).as("th"), col("c")))).as("vec"))
      .select(col("id"), GraftExtensions.simhash64(col("vec")).as("h_sig"))
    val diffH = rel.join(natH, "id").filter(col("rel_sig") =!= col("h_sig"))
    assert(diffH.count() == 0, diffH.collect().take(3).mkString("; "))
  }

  test("fuzz: sparse_dot matches a scala-side merge on random term vectors") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(17L)
    val terms = Vector("a", "b", "ció", "中文", "zz", "q1", "x", "yy")
    val cases = (0 until 200).map { _ =>
      def vec() = rnd.shuffle(terms).take(rnd.nextInt(terms.size + 1))
        .map(t => (t, rnd.nextInt(20).toLong + 1)).sortBy(_._1).toSeq
      (vec(), vec())
    }
    val expected = cases.map { case (a, b) =>
      val bm = b.toMap
      a.map { case (t, c) => c * bm.getOrElse(t, 0L) }.sum
    }
    val df = cases.toDF("a", "b")
    val got = df.select(GraftExtensions.sparse_dot(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == expected, "sparse_dot mismatch vs scala merge")
    // hashed-key variant: re-key each vector by xxhash64(term), re-sort by
    // the hash — dot products must be identical (distinct terms <-> distinct
    // hashes)
    val hashed = df.select(
      sort_array(transform(col("a"), e => struct(xxhash64(e("_1")).as("th"), e("_2").as("c")))).as("ah"),
      sort_array(transform(col("b"), e => struct(xxhash64(e("_1")).as("th"), e("_2").as("c")))).as("bh"))
    val gotH = hashed.select(GraftExtensions.sparse_dot(col("ah"), col("bh"))).as[Long].collect()
    assert(gotH.toSeq == expected, "sparse_dot(long keys) mismatch vs scala merge")
  }
}
