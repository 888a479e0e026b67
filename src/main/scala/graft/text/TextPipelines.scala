package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Relational text-corpus operators (DataFrame-in, DataFrame-out) on top of
  * the per-row primitives in [[graft.functions.TextFunctions]].
  */
object TextPipelines {

  /** Top-k terms per document by smoothed TF-IDF
    * (`tf · ln((N+1)/(df+1))`): term frequencies and document frequencies
    * are two hash aggregations; the per-doc top-k is a window over the
    * scored terms. Ties break lexicographically by term, so ranks are
    * deterministic. At corpus scale every stage is a shuffle on (doc|term)
    * keys with map-side partial aggregation — no driver state except the
    * single corpus-count scalar (the same legitimate model state as any IDF
    * fit).
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokensNative(docs.sparkSession, lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .select(col("doc_id"), col("term"),
        (col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0))).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("score"), 6).as("score"))
  }

  /** Sequence packing for pretraining batches, concat-then-chop strategy:
    * documents are laid out in id order as one logical token stream and cut
    * into fixed-capacity bins — bin = prefix-sum of preceding token counts
    * div capacity. One window cumsum, no sequential state; deterministic.
    * (Greedy whole-doc packing is a sequential state machine — this is the
    * strategy that actually scales, and what packed-pretraining pipelines
    * use.) Output: (doc_id, n_tokens, bin_id, bin_offset).
    *
    * The global id-ordered window is a deliberate bounded choice here; at
    * 100 TB, run it per shard/partition key (bin ids then namespace by
    * shard), which is how packed datasets are laid out anyway.
    */
  def packSequences(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      capacity: Int = 2048): DataFrame = {
    // fail fast like packSequencesSharded: capacity 0 would reach the
    // `div` as an ANSI divide-by-zero mid-job; negative would emit
    // negative bin ids silently
    require(capacity >= 1, s"bin capacity must be >= 1, got $capacity")
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        // integer division (not double divide + cast) — exact at any corpus size
        expr(s"tok_before div $capacity").as("bin_id"),
        pmod(col("tok_before"), lit(capacity)).as("bin_offset"))
  }

  /** Shard-id namespace stride for [[packSequencesSharded]] bin ids: shard s
    * owns bin ids [s·stride, (s+1)·stride) — disjoint as long as no shard
    * packs more than stride bins (10⁹ bins × 2048 tokens = 2×10¹² tokens per
    * shard before collision; raise the stride before that).
    */
  val ShardBinStride = 1000000000L

  /** The scale path of [[packSequences]]: documents are sharded by
    * `doc_id mod shards`, each shard packs independently under a PARTITIONED
    * window (vs the global single-task sort above — fine for bounded inputs,
    * a scale-killer at 100 TB), and bin ids are namespaced per shard so they
    * stay globally unique. This is how packed pretraining datasets are laid
    * out anyway: one packed stream per output shard.
    *
    * Output: (doc_id, shard, n_tokens, bin_id, bin_offset); bin_id =
    * shard · [[ShardBinStride]] + (tokens-before-within-shard div capacity).
    */
  def packSequencesSharded(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      capacity: Int = 2048,
      shards: Int = 8): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs
      .select(col(idCol).as("doc_id"),
        pmod(col(idCol), lit(shards)).cast("long").as("shard"),
        TextFunctions.tokenCountNative(docs.sparkSession, col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("shard") * ShardBinStride + expr(s"tok_before div $capacity")).as("bin_id"),
        pmod(col("tok_before"), lit(capacity)).as("bin_offset"))
  }

  /** Deterministic stratified systematic sample: every k-th doc per stratum
    * in id order (rank % k == 1). Unlike seeded `sample()`, the selection is
    * reproducible across engines, so it is differentially testable — and at
    * scale it is one window per stratum, no driver state.
    */
  def stratifiedSample(
      docs: DataFrame,
      stratumCol: String,
      idCol: String = "doc_id",
      k: Int = 10): DataFrame = {
    require(k >= 1, s"sampling interval k must be >= 1, got $k")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
    docs
      .withColumn("rnk", row_number().over(w))
      // (rnk-1) % k == 0 selects ranks 1, k+1, 2k+1, ... — and unlike
      // `rnk % k == 1`, k=1 correctly selects EVERY row (rnk % 1 is never 1)
      .filter(pmod(col("rnk") - 1, lit(k)) === 0)
      .drop("rnk")
  }

  /** Exactly-k deterministic pseudo-uniform sample per group: rows rank by
    * a multiplicative hash of the id (the [[weightedMix]] key — engine- and
    * run-reproducible, no RNG) and the top k per group survive, through the
    * bounded-heap TopKPerKey operator so the shuffle carries ≤ k rows per
    * (partition, group) — never the group's population. Complements
    * [[stratifiedSample]] (rate-based) with count-based quotas: "k docs per
    * source", the training-data subsampling shape.
    *
    * OUTPUT CONTRACT: the ranking column `hkey` is RETURNED with the rows
    * (deliberately — callers audit/sort on the selection rank; q84's oracle
    * reproduces it), and any pre-existing input column named `hkey` is
    * OVERWRITTEN. Drop it downstream if unwanted.
    */
  def hashSamplePerGroup(
      docs: DataFrame,
      groupCol: String,
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1, got $k")
    val ranked = docs.withColumn("hkey",
      pmod(pmod(col(idCol), lit(MixM)) * lit(MixA % MixM), lit(MixM)))
    graft.ops.TopK.topKPerKey(ranked, Seq(groupCol), Seq(("hkey", true), (idCol, true)), k)
  }

  /** Deterministic weighted source mixing — the pretraining data-mixture
    * knob: each source keeps a fraction proportional to its weight,
    * selected by pure modular arithmetic on the doc id (`(id·A) mod M <
    * rate·M`, A coprime to M), so the sample is reproducible across
    * engines and runs — no seeded RNG, no driver state beyond the weight
    * map. Sources absent from `weights` are dropped.
    *
    * @param weights   source → keep fraction in [0, 1]
    * @return input rows of the kept docs
    */
  val MixA = 2654435761L // Knuth's multiplicative-hash constant
  val MixM = 1000000007L
  def weightedMix(
      docs: DataFrame,
      weights: Map[String, Double],
      sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be fractions in [0,1]: $weights")
    val rate = weights.foldLeft(lit(null).cast("double")) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    docs
      .withColumn("__rate", rate)
      // reduce mod M BEFORE multiplying: id·A overflows Long for ids above
      // ~3.5e9 (ANSI-mode throw, or silent divergence with ANSI off);
      // (id mod M)·(A mod M) mod M is mathematically identical and stays
      // below 2^60 for any Long id
      .filter(col("__rate").isNotNull &&
        pmod(pmod(col(idCol), lit(MixM)) * lit(MixA % MixM), lit(MixM)).cast("double")
          < col("__rate") * MixM)
      .drop("__rate")
  }

  /** C4-style quality gate: keep docs that clear a composite-quality
    * threshold, a token-count band, and a language allowlist — map-only,
    * every signal from [[TextFunctions]]. OUTPUT CONTRACT: one row per
    * kept doc carrying (doc_id, n_tokens, quality, lang_pred) — the
    * gating signals ONLY, not the input's payload columns; join back on
    * doc_id to recover text (keeps the gate's shuffle-free output slim —
    * a fat text column would ride every downstream exchange of the
    * audit frame).
    */
  def qualityGate(
      docs: DataFrame,
      minQuality: Double = 0.5,
      minTokens: Int = 20,
      maxTokens: Int = 100000,
      langs: Seq[String] = Seq("en"),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // ONE native single-pass lang_stats struct feeds every signal — token
    // count, per-language stopword hits, and (via the struct-derivation
    // helpers) the composite quality score and language argmax. No
    // interpreted higher-order functions anywhere in the gate: the whole
    // thing is a map-only whole-stage-codegen projection + filter.
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        TextFunctions.langStats(docs.sparkSession, col(textCol)).as("__st"))
      .select(col("doc_id"),
        col("__st.n_tokens").as("n_tokens"),
        TextFunctions.statsQualityScore(col("__st"), col("__text")).as("quality"),
        TextFunctions.statsLangId(col("__st")).as("lang_pred"))
      .filter(col("quality") >= minQuality &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("lang_pred").isin(langs.map(_.asInstanceOf[Any]): _*))
  }

  /** Per-doc repetition score: 1 − distinct/total k-token shingles — the
    * standard boilerplate/repetition quality signal. Map-only over the
    * native shingle expressions; docs with no shingles (< k tokens) are
    * excluded.
    */
  def repetitionScores(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3): DataFrame = {
    val sh = TextFunctions.shingles(docs.sparkSession, col(textCol), shingleK)
    docs
      .select(col(idCol).as("doc_id"), size(sh).as("n_shingles"),
        size(array_distinct(sh)).as("n_unique"))
      .filter(col("n_shingles") > 0)
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        (lit(1.0) - col("n_unique").cast("double") / col("n_shingles")).as("rep_score"))
  }

  /** Corpus-trained bigram language-model scoring — the CCNet/KenLM-style
    * quality signal: train add-k-smoothed bigram probabilities on the corpus
    * itself, then score every document by the average negative
    * log-likelihood of its bigrams (low surprisal ≈ fluent/typical text,
    * high ≈ gibberish or boilerplate-shredded text).
    *
    * p(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), where c(w1 ·) is the
    * bigram-context count and V the corpus vocabulary size. Documents with
    * fewer than two tokens have no bigrams and are excluded.
    *
    * Scale shape: ONE native tokenization pass; per-doc bigrams come from a
    * codegen'd zip_with over the token array (array-local, no positional
    * self-join); training is two hash aggregations with map-side combine;
    * scoring joins each doc's bigrams against the count tables on
    * (bigram|context) keys — the exchanges carry short strings and counts,
    * never documents. V is one scalar broadcast through a 1-row cross join,
    * not driver state.
    */
  def bigramSurprisal(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"addK must be > 0 for smoothing, got $addK")
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol))).as("toks"))
      // NOTE: the vocab-from-grams derivation below is only exact BECAUSE of
      // this >=2-token filter — tokens unique to 1-token docs never reach a
      // bigram, so relaxing the filter would require a separate vocab pass.
      .filter(size(col("toks")) >= 2)
    val grams = toks
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .persist()
    // vocabulary from the PERSISTED grams frame, not a second tokenization
    // pass over the corpus (`toks` is not cached — only `grams` is): every
    // token of a >=2-token doc appears in at least one bigram (t1 as the
    // first bigram's w1, tn as the last's w2, middle tokens in both), so
    // distinct(w1 ∪ w2) over grams IS the token vocabulary — identical
    // count, one cached scan instead of a full re-tokenize (r21)
    val vocab = grams
      .select(explode(array(col("w1"), substring_index(col("bg"), " ", -1))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val c2 = grams.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = grams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val out = grams
      .join(c2, "bg")
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("c2") + addK) / (col("c1") + col("v") * addK))), 6)
          .as("surprisal"))
    graft.util.Caching.materialize(out, grams)
  }

  /** Corpus-wide token frequency through the LATERAL-FLATTEN surface
    * (Snowflake's `LATERAL FLATTEN`, Spark's `explode`): one row per token
    * occurrence, hash-aggregated to counts, top-N by (count desc, token) —
    * a fully deterministic tie-break, so the cut is stable across engines.
    *
    * Tokenization is the same native single-pass `ws_tokens` every text
    * pipeline shares; the explode and the row-level empty filter both stay
    * inside whole-stage codegen, and the aggregation map-side combines, so
    * the shuffle carries (token, partial count) — never documents.
    */
  def tokenFrequency(docs: DataFrame, textCol: String = "text", topN: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    docs
      .select(explode(graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(topN)
  }

  /** Deterministic train/val/test assignment: a row's split is a pure
    * function of its id — `md5(id)`'s first four hex chars against
    * cumulative thresholds over the 16-bit bucket space. Re-runs, engines,
    * and shards all agree (the same property [[hashSamplePerGroup]] builds
    * on); no RNG, no state, map-only, and adding data never reassigns an
    * existing id. The LAST split takes the remainder, so fractions of the
    * others must sum below 1.
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: Column,
      splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.length >= 2, "need at least two named splits")
    require(splits.init.forall(_._2 > 0) && splits.init.map(_._2).sum < 1.0,
      s"non-final split fractions must be positive and sum below 1: $splits")
    val bucket = substring(md5(idCol.cast("string")), 1, 4)
    val cums = splits.init.scanLeft(0.0)(_ + _._2).tail
    val thresholds = cums.map(f => f"${math.floor(f * 65536).toLong}%04x")
    // a fraction below the 16-bit bucket resolution would floor onto the
    // previous threshold and silently leave its split EMPTY — refuse loudly
    require(("0000" +: thresholds) == ("0000" +: thresholds).distinct,
      s"split fractions below 1/65536 resolution collapse: $splits -> $thresholds")
    val assigned = splits.init.zip(thresholds).foldRight(lit(splits.last._1)) {
      case (((name, _), hexHi), rest) => when(bucket < lit(hexHi), name).otherwise(rest)
    }
    df.withColumn(outCol, assigned)
  }

  /** Collocation extraction: top-N bigrams by pointwise mutual information,
    * `pmi = ln( (c_bg / N_bg) / ((c_w1 / N_tok) · (c_w2 / N_tok)) )`, over
    * bigrams seen at least `minCount` times. The classic signal for
    * multiword expressions ("new york") in corpus curation.
    *
    * Scale shape: ONE native tokenization feeding both the bigram and
    * unigram counts ([[bigramSurprisal]]'s machinery); unigram counts join
    * against the DISTINCT bigram keys (post-aggregation, so the exchanges
    * carry short strings and counts); the two corpus totals ride a 1-row
    * broadcast. Output is rounded to 6dp with a (pmi, bigram) tie-break —
    * deterministic under any plan.
    */
  def pmiCollocations(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minCount: Int = 5,
      topN: Int = 30): DataFrame = {
    require(minCount >= 1 && topN >= 1, s"minCount/topN must be positive: $minCount/$topN")
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .persist()
    val grams = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    // both count frames PERSIST (vocab-bounded) and the corpus totals derive
    // from them as sums of the group counts, so the explode→aggregate passes
    // over the cached tokens run ONCE each — r21: nbg re-exploded every
    // token array a second time and ntok a fourth (grams ×2, uniRows ×2).
    // coalesce(sum, 0) ≡ count(1) on an empty corpus (out is empty either
    // way — cbg has no rows to join).
    val cbgAll = grams.groupBy(col("bg")).agg(count(lit(1)).as("cnt")).persist()
    val cbg = cbgAll
      .filter(col("cnt") >= minCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val nbg = cbgAll.agg(coalesce(sum(col("cnt")), lit(0L)).as("nbg"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c")).persist()
    val ntok = uni.agg(coalesce(sum(col("c")), lit(0L)).as("ntok"))
    val u1 = uni.select(col("w").as("w1"), col("c").as("c1"))
    val u2 = uni.select(col("w").as("w2"), col("c").as("c2"))
    val out = cbg
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(nbg)).crossJoin(broadcast(ntok))
      .select(col("bg"), col("cnt"),
        round(log((col("cnt").cast("double") * col("ntok") * col("ntok"))
          / (col("nbg").cast("double") * col("c1") * col("c2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bg"))
      .limit(topN)
    graft.util.Caching.materialize(out, toks, cbgAll, uni)
  }

  /** Train `nMerges` BPE merges on the corpus — real tokenizer-vocabulary
    * training, the step [[graft.functions.TextFunctions]]' BPE-ish token
    * counter presupposes. Classic algorithm (Sennrich et al. 2016): words
    * become character-symbol sequences; each round merges the globally most
    * frequent adjacent symbol pair (greedy, non-overlapping, left-to-right).
    *
    * Scale shape: training runs on the WORD-FREQUENCY DICT, not the corpus
    * — one corpus-scale tokenize+aggregate up front, then every round
    * touches only (distinct word, freq) rows, which is vocab-bounded no
    * matter how many TB the corpus is. The pair count per round is a
    * map-side-combined aggregate; the merge rewrite is array-local per
    * word (an `aggregate` fold — interpreted, acceptable off the corpus
    * hot path); tracked `localCheckpoint`s after each round keep the plan
    * flat instead of nesting one fold per merge, and each superseded
    * round's pinned blocks are released (plain `Dataset.unpersist` cannot
    * see them — the [[graft.ops.Graph.connectedComponents]] lesson,
    * shared via `Caching.checkpointTracked`). Ties break by
    * (count desc, left, right) — fully deterministic.
    *
    * @return one row per learned merge: (rank, left, right, pair_count)
    */
  def trainBpeMerges(
      docs: DataFrame,
      textCol: String = "text",
      nMerges: Int = 20): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.util.Caching.{checkpointTracked, releaseTracked}
    graft.extensions.GraftExtensions.register(spark)
    var (vocab, vocabIds) = checkpointTracked(docs
      .select(explode(graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // split("") yields the word's characters (no empty edge tokens in
      // Spark 3+); single-char words simply never produce pairs
      .select(split(col("w"), "").as("syms"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    // try/finally: a failing round collect must still release the current
    // round's tracked checkpoint blocks (superseded rounds are already
    // released inside the loop) — truncated-lineage pins are invisible to
    // the caller and would leak until session end
    try {
      for (rank <- 0 until nMerges if !exhausted) {
        val best = vocab
          .filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
          .groupBy(col("p")).agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("p.a"), col("p.b"))
          .limit(1)
          .select(col("p.a"), col("p.b"), col("c"))
          .as[(String, String, Long)].collect()
        best.headOption match {
          case None => exhausted = true // every word is a single symbol
          case Some((a, b, c)) =>
            merges += ((rank, a, b, c))
            val (next, nextIds) = checkpointTracked(vocab.withColumn("syms",
              aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
                when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                  .otherwise(concat(acc, array(x))))))
            releaseTracked(vocab, vocabIds)
            vocab = next
            vocabIds = nextIds
        }
      }
    } finally releaseTracked(vocab, vocabIds)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Apply learned BPE merges ([[trainBpeMerges]]' output, rank order —
    * Sennrich's apply discipline) and return each document's BPE token
    * count — the real sequence-length signal packing and pricing need,
    * where the whitespace-token count is only a proxy.
    *
    * Scale shape: segmentation runs on the DISTINCT-WORD dict (the same
    * vocab-bounded frame training used — each merge is one array-local
    * fold over dict rows, never the corpus); the corpus then joins its
    * exploded words against the dict's per-word piece counts — exchanges
    * carry (word, count), and unseen-at-training words still segment
    * correctly because merges apply to any character sequence.
    */
  def bpeTokenCounts(
      docs: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val words = docs
      .select(col(idCol).as("doc_id"),
        explode(graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol)))).as("w"))
    // FLATTEN the dict plan every 24 merges: project-collapse would
    // otherwise inline one interpreted aggregate-fold per merge into a
    // single expression tree of depth O(nMerges) — fine for q115's fixed
    // 10-merge table, StackOverflow/janino blowup at a real tokenizer's
    // hundreds-to-30k merges (the trainBpeMerges lesson: its per-round
    // checkpoints keep training flat; the apply path needs the same,
    // tracked so superseded rounds' pinned blocks release immediately)
    import graft.util.Caching.{checkpointTracked, materialize, releaseTracked}
    var cur = words.select(col("w")).distinct().withColumn("syms", split(col("w"), ""))
    var pinned: Set[Int] = Set.empty
    // try/finally over the merge fold AND the final materialize: an
    // exception mid-loop (or in the dict materialize) must not leak the
    // currently pinned checkpoint blocks into the caller's session — the
    // same exception-path discipline as trainBpeMerges/dsirPrepare. The
    // normal path clears `pinned` before returning, so the finally is a
    // no-op there.
    val dict = try {
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        cur = cur.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))))
        if ((i + 1) % 24 == 0) {
          val (ck, ids) = checkpointTracked(cur)
          if (pinned.nonEmpty) releaseTracked(ck, pinned)
          cur = ck
          pinned = ids
        }
      }
      val segmented = cur.select(col("w"), size(col("syms")).as("pieces"))
      // a long merge table leaves interim checkpoint pins behind: eagerly
      // materialize the (vocab-bounded) dict and release them — the short
      // path (< 24 merges, q115's shape) stays plan-identical
      if (pinned.isEmpty) segmented
      else {
        val out = materialize(segmented)
        releaseTracked(out, pinned)
        pinned = Set.empty
        out
      }
    } finally if (pinned.nonEmpty) releaseTracked(cur, pinned)
    words.join(dict, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_bpe_tokens"))
  }

  /** DSIR importance score (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): rank raw-corpus documents by how
    * much more likely their text is under a TARGET-domain n-gram model than
    * under the raw-corpus model — the published recipe for carving a
    * domain-matched training subset out of a web crawl (resample
    * proportionally to the importance weight; deterministic selection =
    * top-N by score). Features are bigrams kept as exact equality classes
    * (the paper hashes them into a fixed bucket count — a memory bound,
    * not a semantic choice; bucket-free counts are exact and
    * oracle-checkable); each model is an add-k-smoothed multinomial over
    * the two corpora's UNION bigram vocabulary.
    *
    * score(doc) = mean over the doc's bigram occurrences of
    * `ln p_target(f) − ln p_raw(f)` — positive means target-like. Docs
    * under 2 tokens have no features: n_bigrams 0, score 0.
    *
    * Scale shape: the two model fits are hash aggregations with map-side
    * partial counts; scoring joins each raw bigram occurrence to the two
    * count frames on the bigram key (shuffles bounded by corpus token
    * count, never all-pairs); ONE broadcast 1-row frame carries all three
    * scalars (N_raw, N_target, |V|), so nothing corpus-sized touches the
    * driver.
    */
  /** One row per bigram OCCURRENCE: (doc_id, bg) — the shared feature
    * extraction of [[dsirScores]] and [[dsirScoresHashed]].
    */
  private def bigramOccurrences(df: DataFrame, id: Column, textCol: String): DataFrame = {
    val toks = df
      .select(id.as("doc_id"),
        graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) >= 2)
    toks.select(col("doc_id"),
      explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
  }

  def dsirScores(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"addK must be > 0 for smoothing, got $addK")
    val spark = raw.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val rawG = bigramOccurrences(raw, col(idCol), textCol).persist()
    val tgtG = bigramOccurrences(target, lit(0L), textCol)
    // both count frames PERSIST (vocab-bounded, tiny next to the corpora)
    // and every model scalar derives from them in ONE pass: n_r/n_t are the
    // sums of the group counts (= occurrence totals) and |V| is the
    // countDistinct of their key union. r21: previously nT and v each
    // recomputed tgtG, so the TARGET corpus was tokenized three times (cT,
    // nT, v) and three separate 1-row frames broadcast; now the target
    // tokenizes exactly once and one broadcast carries all three scalars.
    // coalesce(sum, 0) ≡ the old count(1) on an empty side (count is 0,
    // sum is NULL) — same smoothing-floor arithmetic on degenerate corpora.
    val cR = rawG.groupBy(col("bg")).agg(count(lit(1)).as("c_r")).persist()
    val cT = tgtG.groupBy(col("bg")).agg(count(lit(1)).as("c_t")).persist()
    val scal = cR.select(col("bg"), col("c_r").as("c"), lit(true).as("is_r"))
      .unionByName(cT.select(col("bg"), col("c_t").as("c"), lit(false).as("is_r")))
      .agg(coalesce(sum(when(col("is_r"), col("c"))), lit(0L)).as("n_r"),
        coalesce(sum(when(!col("is_r"), col("c"))), lit(0L)).as("n_t"),
        countDistinct(col("bg")).as("v"))
    val scored = rawG
      .join(cR, "bg") // every raw bigram is in the raw model by construction
      .join(cT, Seq("bg"), "left") // absent from target → count 0, smoothing floors it
      .crossJoin(broadcast(scal))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(
          log((coalesce(col("c_t"), lit(0L)) + addK) / (col("n_t") + col("v") * addK)) -
            log((col("c_r") + addK) / (col("n_r") + col("v") * addK))), 6)
          .as("dsir_score"))
    val out = raw.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
    graft.util.Caching.materialize(out, rawG, cR, cT)
  }

  /** [[dsirScores]] over the paper's actual FIXED feature space: bigrams
    * hash into `16^hexChars` buckets (Xie et al. 2023 hash features into
    * 10k buckets precisely so the model state is memory-bounded), so both
    * multinomials are at most `16^hexChars` rows REGARDLESS of corpus
    * vocabulary — the option a 100 TB raw side wants, where exact bigram
    * equality classes make the model frames O(union vocabulary). The
    * smoothing vocabulary is the full bucket space (a fixed literal — one
    * less corpus-wide aggregate than the exact path's countDistinct).
    *
    * The bucket function is the stack's engine-portable hash discipline
    * ([[deterministicSplit]]): the first `hexChars` hex chars of
    * `md5(bigram)` — any engine computes the identical bucket, so the
    * scores stay oracle-checkable end to end.
    */
  def dsirScoresHashed(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      addK: Double = 0.5,
      hexChars: Int = 2): DataFrame = {
    require(addK > 0, s"addK must be > 0 for smoothing, got $addK")
    require(hexChars >= 1 && hexChars <= 12,
      s"hexChars must be in [1, 12] (16^12 buckets already overshoots any corpus), got $hexChars")
    val spark = raw.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val buckets = math.pow(16.0, hexChars.toDouble).toLong
    // ONE bucket-expression definition ([[dsirFeat]]) serves this one-shot
    // path and the prepared E124 path — they can never silently diverge
    val rawG = dsirFeat(bigramOccurrences(raw, col(idCol), textCol), Some(hexChars)).persist()
    val tgtG = dsirFeat(bigramOccurrences(target, lit(0L), textCol), Some(hexChars))
    // the count frames PERSIST (≤ 16^hexChars rows each) and both occurrence
    // totals derive from them in one pass — the [[dsirScores]] r21 rewrite;
    // here |V| is already the fixed bucket literal so the scalar frame
    // carries just n_r/n_t. The target corpus tokenizes once, not twice.
    val cR = rawG.groupBy(col("f")).agg(count(lit(1)).as("c_r")).persist()
    val cT = tgtG.groupBy(col("f")).agg(count(lit(1)).as("c_t")).persist()
    val scal = cR.select(col("c_r").as("c"), lit(true).as("is_r"))
      .unionByName(cT.select(col("c_t").as("c"), lit(false).as("is_r")))
      .agg(coalesce(sum(when(col("is_r"), col("c"))), lit(0L)).as("n_r"),
        coalesce(sum(when(!col("is_r"), col("c"))), lit(0L)).as("n_t"))
    val scored = rawG
      .join(cR, "f") // every raw bucket is in the raw model by construction
      .join(cT, Seq("f"), "left") // absent from target → count 0, smoothing floors it
      .crossJoin(broadcast(scal))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(
          log((coalesce(col("c_t"), lit(0L)) + addK) / (col("n_t") + lit(buckets) * addK)) -
            log((col("c_r") + addK) / (col("n_r") + lit(buckets) * addK))), 6)
          .as("dsir_score"))
    val out = raw.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
    graft.util.Caching.materialize(out, rawG, cR, cT)
  }

  /** DSIR models PREPARED for repeated scoring sweeps — the select-on-
    * ingest sibling of [[graft.dedup.Decontaminate.PreparedBenchmark]]: an
    * ingest pipeline scores every arriving batch against FROZEN reference
    * models (re-fitting per micro-batch would make scores drift with
    * arrival order), so the two count frames persist once and the three
    * scalars collect once. `feat` is the feature extractor (identity
    * bigram or md5-prefix bucket), shared so prepared and one-shot paths
    * can never diverge.
    */
  final case class DsirModel(
      cR: DataFrame, cT: DataFrame, nR: Long, nT: Long, v: Long,
      addK: Double, hexChars: Option[Int]) {
    def release(): Unit = { cR.unpersist(blocking = false); cT.unpersist(blocking = false); () }
  }

  private def dsirFeat(g: DataFrame, hexChars: Option[Int]): DataFrame = hexChars match {
    case Some(h) => g.withColumn("f", substring(md5(col("bg")), 1, h)).drop("bg")
    case None => g.withColumnRenamed("bg", "f")
  }

  /** Fit both DSIR models ONCE over reference corpora: persisted per-
    * feature count frames plus the scalars (N_raw, N_target, |V| — three
    * longs, legitimate driver-side model state like k-means centroids).
    * `hexChars = Some(h)` fits the fixed `16^h`-bucket hashed space
    * ([[dsirScoresHashed]]); None fits exact bigram classes
    * ([[dsirScores]]).
    */
  def dsirPrepare(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      addK: Double = 0.5,
      hexChars: Option[Int] = None): DsirModel = {
    require(addK > 0, s"addK must be > 0 for smoothing, got $addK")
    hexChars.foreach(h => require(h >= 1 && h <= 12, s"hexChars must be in [1, 12], got $h"))
    val spark = raw.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val rawG = dsirFeat(bigramOccurrences(raw, lit(0L), textCol), hexChars)
    val tgtG = dsirFeat(bigramOccurrences(target, lit(0L), textCol), hexChars)
    val cR = rawG.groupBy(col("f")).agg(count(lit(1)).as("c_r")).persist()
    val cT = tgtG.groupBy(col("f")).agg(count(lit(1)).as("c_t")).persist()
    // a failing scalar collect must unpersist both count frames before
    // rethrowing: no DsirModel is constructed on that path, so its
    // release() would be unreachable and the pins would leak into the
    // caller's session (the crossPrepare exception-path discipline)
    try {
      // ONE collect for every scalar (r22): the union aggregate triggers —
      // and caches — BOTH count frames and derives n_r/n_t/|V| in the same
      // job; previously n_r, n_t, and |V| each ran their own job (three
      // scheduler round-trips to answer three longs). coalesce(sum, 0) ≡
      // count on an empty side; countDistinct over the tagged union is the
      // old union-of-keys countDistinct verbatim. The hashed space skips
      // the |V| aggregate entirely — its vocabulary is the bucket literal.
      val scal = cR.select(col("f"), col("c_r").as("c"), lit(true).as("is_r"))
        .unionByName(cT.select(col("f"), col("c_t").as("c"), lit(false).as("is_r")))
      val aggs = Seq(
        coalesce(sum(when(col("is_r"), col("c"))), lit(0L)).as("n_r"),
        coalesce(sum(when(!col("is_r"), col("c"))), lit(0L)).as("n_t")) ++
        (if (hexChars.isEmpty) Seq(countDistinct(col("f")).as("v")) else Nil)
      val row = scal.agg(aggs.head, aggs.tail: _*).collect()(0)
      val v = hexChars match {
        case Some(h) => math.pow(16.0, h.toDouble).toLong
        case None => row.getLong(2)
      }
      DsirModel(cR, cT, row.getLong(0), row.getLong(1), v, addK, hexChars)
    } catch {
      case t: Throwable =>
        cR.unpersist(blocking = false)
        cT.unpersist(blocking = false)
        throw t
    }
  }

  /** Score any frame against a [[DsirModel]] — identical formula to
    * [[dsirScores]], with one ingest-specific generalization: a feature the
    * frozen RAW model never saw scores with c_r = 0 (the smoothing floor),
    * because an arriving document is not part of the reference fit. On the
    * fit corpus itself every feature is in the raw model, so prepared
    * scores EQUAL the one-shot path (spec'd).
    */
  def dsirScorePrepared(
      docs: DataFrame,
      model: DsirModel,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val g = dsirFeat(bigramOccurrences(docs, col(idCol), textCol), model.hexChars)
    val k = model.addK
    val scored = g
      .join(model.cR, Seq("f"), "left")
      .join(model.cT, Seq("f"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(
          log((coalesce(col("c_t"), lit(0L)) + k) / (model.nT + model.v * k)) -
            log((coalesce(col("c_r"), lit(0L)) + k) / (model.nR + model.v * k))), 6)
          .as("dsir_score"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
  }

  /** Select-on-ingest (`foreachBatch` sink): every micro-batch scores
    * against the frozen models and only docs at or above `minScore` append
    * to the snapshot table at `outDir` — the data-selection member of the
    * ingest tier (dedup-on-ingest, decontaminate-on-ingest, select-on-
    * ingest). Stateless across batches by design (a doc is judged against
    * the FIXED models alone); an all-rejected or empty batch publishes NO
    * version. With `appId` set the append is EXACTLY-ONCE
    * ([[graft.catalog.SnapshotTable.appendExactlyOnce]]'s manifest-recorded
    * (appId → batchId) marker — a crash-replayed micro-batch is a
    * structural no-op; use a stable id per pipeline, e.g. derived from the
    * checkpoint path, and a FRESH one if the checkpoint is ever reset,
    * since batch ids restart from 0). Without it, at-least-once on
    * replay — compose with exact dedup or MERGE where that matters.
    */
  def dsirSink(
      model: DsirModel,
      outDir: String,
      minScore: Double,
      textCol: String = "text",
      idCol: String = "doc_id",
      appId: Option[String] = None): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    // a crash-replayed batch no-ops on the MARKER alone — before the
    // scoring sweep (the sink's dominant cost), not after it inside
    // appendExactlyOnce
    val replayed = appId.exists(app => graft.catalog.SnapshotTable
      .lastTxn(spark, outDir, app).exists(_ >= batchId))
    if (!replayed) {
      val keep = dsirScorePrepared(batch, model, textCol, idCol)
        .filter(col("dsir_score") >= minScore).select(col("doc_id").as(idCol))
      // persisted: the emptiness probe and the append would otherwise each
      // re-run the scoring sweep
      val selected = batch.join(keep, Seq(idCol), "left_semi").persist()
      try {
        if (!selected.isEmpty) appId match {
          case Some(app) =>
            graft.catalog.SnapshotTable.appendExactlyOnce(spark, selected, outDir, app, batchId)
            ()
          case None =>
            // atomic: creation is decided inside the OCC commit loop, so
            // two sinks racing the same outDir's first batch both land
            graft.catalog.SnapshotTable.createOrAppend(spark, selected, outDir)
            ()
        }
      } finally selected.unpersist(blocking = false)
    }
    ()
  }

  /** Fixed-length token CHUNKING with stride — the context-window
    * preprocessing step between curation and training: long documents
    * split into `maxLen`-token windows whose starts advance by `stride`
    * (stride < maxLen gives the BERT-style overlap that keeps boundary
    * context; stride == maxLen gives disjoint GPT-style blocks). Start
    * offsets are 0, stride, 2·stride, … but a window adding NO new tokens
    * over its predecessor (a tail fully inside the previous window) is not
    * emitted — so every token lands in at least one chunk, the final chunk
    * may run short, chunk ids stay contiguous, and a doc at or under
    * `maxLen` yields exactly one chunk (itself). Empty docs yield no
    * chunks.
    *
    * Scale shape: one `sequence` + `explode` per doc — output-linear, no
    * shuffles at all until the caller aggregates (the chunk columns derive
    * from the doc row by `slice`, inside whole-stage codegen). Chunk ids
    * are per-doc ordinals, deterministic by construction.
    *
    * @return (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text) —
    *         start_tok 0-based, chunk_text the space-joined token window
    */
  def chunkTokens(
      docs: DataFrame,
      maxLen: Int,
      stride: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    require(stride >= 1 && stride <= maxLen,
      s"stride must be in [1, maxLen], got $stride (maxLen $maxLen)")
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val toks = docs.select(col(idCol).as("doc_id"),
      graft.extensions.GraftExtensions.ws_tokens(col(textCol)).as("toks"))
    toks
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start_tok"))
      // drop windows adding no new tokens: for s > 0 the predecessor
      // already covers [0, s - stride + maxLen), so the window only earns
      // its keep when the doc extends past that
      .filter(col("start_tok") === 0 ||
        col("start_tok") < size(col("toks")) - (maxLen - stride))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("int").as("chunk_id"),
        col("start_tok"),
        slice(col("toks"), col("start_tok") + 1, lit(maxLen)).as("__c"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** The deterministic selection form of [[dsirScores]]: the `n` most
    * target-like raw docs by (score DESC, doc_id) — the rank tie-break
    * makes the cut stable across engines and runs.
    */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      n: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      addK: Double = 0.5): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val picked = dsirScores(raw, target, textCol, idCol, addK)
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id").as(idCol))
    raw.join(picked, Seq(idCol), "left_semi")
  }
}
