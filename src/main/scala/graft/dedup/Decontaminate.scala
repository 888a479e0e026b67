package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark DECONTAMINATION — the train/test-overlap sweep every serious
  * pretraining pipeline runs before shipping a corpus (the 13-gram overlap
  * rule popularized by GPT-3's appendix and kept by The Pile /
  * open-reproduction pipelines): a training document sharing long verbatim
  * n-grams with an evaluation benchmark leaks the benchmark into training
  * and inflates downstream scores.
  *
  * Scale shape: the corpus side explodes to one row per distinct n-gram
  * hash — O(corpus tokens) rows — but [[graft.ops.BloomJoin]]'s
  * bloom-pre-filtered semi join discards the non-overlapping bulk IN THE
  * SCAN STAGE (one `might_contain` against a broadcast bloom of the
  * benchmark's n-gram hashes), so only true hits plus the false-positive
  * sliver ever shuffle; the exact join then removes the sliver, making the
  * flags exactly what a plain join would produce. The benchmark side is
  * the small side by construction (benchmarks are thousands of documents,
  * corpora are billions) — it is aggregated once into the bloom plus a
  * distinct hash frame, never re-scanned per corpus partition.
  *
  * Same shingle semantics end to end as the dedup stack (lowercased
  * whitespace tokens → k-token shingles → distinct xxhash64 via the native
  * [[TextFunctions.shingleHashes]] expression), so the DuckDB oracle can
  * state the truth over n-gram STRINGS while Spark matches hashes —
  * identical counts modulo xxhash64 collisions, which the exhaustive
  * string-side oracle would expose.
  */
object Decontaminate {

  /** A benchmark prepared for REPEATED overlap sweeps: the distinct n-gram
    * hash frame (persisted — it is re-joined by every sweep) plus the bloom
    * bytes built over it once. Benchmarks are fixed between eval refreshes,
    * so an ingest pipeline sweeping every micro-batch should not re-explode
    * and re-aggregate the benchmark per batch. `bloomBytes` is null only
    * for an EMPTY benchmark (nothing can be contaminated).
    */
  final case class PreparedBenchmark(
      grams: DataFrame, bloomBytes: Array[Byte], n: Int) {
    def release(): Unit = grams.unpersist(blocking = false)
  }

  /** Build a [[PreparedBenchmark]]: one explode+distinct over the benchmark
    * text, persisted, and one `bloom_filter_agg` pass over it.
    */
  def prepare(
      benchmark: DataFrame,
      n: Int = 8,
      benchTextCol: String = "text",
      expectedBenchGrams: Option[Long] = None,
      fpp: Double = 0.01): PreparedBenchmark = {
    require(n >= 1, s"n must be positive, got $n")
    val spark = benchmark.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val grams = benchmark
      .select(explode(TextFunctions.shingleHashes(spark, col(benchTextCol), n)).as("h"))
      .distinct()
      .persist()
    // bloom sized from the DATA by default (r22): the count job doubles as
    // the cache-forcing job the bloom agg would have paid anyway, and the
    // filter can no longer be silently neutered (under-sized constant →
    // FPR → 1) or bloated (over-sized constant → megabytes of literal in
    // every task) when the benchmark population moves
    val nGrams = expectedBenchGrams.getOrElse(grams.count())
    if (nGrams == 0L) return PreparedBenchmark(grams, null, n) // empty benchmark
    val numBits = graft.ops.BloomJoin.bloomBits(nGrams, fpp)
    val bloomBytes = grams
      .agg(call_function("bloom_filter_agg",
        xxhash64(col("h")), lit(nGrams), lit(numBits)).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    PreparedBenchmark(grams, bloomBytes, n)
  }

  /** [[ngramOverlap]] against a [[PreparedBenchmark]] — the repeated-sweep
    * form (identical flags; the benchmark side just isn't recomputed).
    */
  def ngramOverlapPrepared(
      docs: DataFrame,
      prep: PreparedBenchmark,
      minHits: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(minHits >= 1, s"minHits must be positive, got $minHits")
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val corpusGrams = docs
      .select(col(idCol), explode(TextFunctions.shingleHashes(spark, col(textCol), prep.n)).as("h"))
    val hits =
      if (prep.bloomBytes == null) corpusGrams.filter(lit(false)) // empty benchmark
      else corpusGrams
        .filter(call_function("might_contain",
          lit(prep.bloomBytes), xxhash64(col("h"))))
        .join(prep.grams, Seq("h"), "left_semi")
    val counts = hits.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit")) // hashes are per-doc distinct already
    docs.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contaminated", col("n_hit") >= minHits)
  }

  /** Ingest-time decontamination (`foreachBatch` sink): every micro-batch
    * is swept against the prepared benchmark and only CLEAN documents
    * append to the snapshot table at `outDir` — the decontaminate-on-ingest
    * sibling of [[graft.streaming.StreamingDedup]]'s dedup-on-ingest.
    * Stateless across batches by design (a doc is judged against the FIXED
    * benchmark alone, never against other docs), so the sweep cost per
    * batch is one pass over the batch; an all-contaminated or empty batch
    * publishes NO table version. With `appId` set the append is
    * EXACTLY-ONCE ([[graft.catalog.SnapshotTable.appendExactlyOnce]]'s
    * manifest-recorded (appId → batchId) marker — a crash-replayed
    * micro-batch is a structural no-op; use a stable id per pipeline and a
    * FRESH one if the checkpoint is ever reset, since batch ids restart
    * from 0). Without it, at-least-once on replay — compose with exact
    * dedup or MERGE where that matters.
    */
  def sink(
      prep: PreparedBenchmark,
      outDir: String,
      minHits: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id",
      appId: Option[String] = None): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    // a crash-replayed batch no-ops on the MARKER alone — before the sweep
    // (the sink's dominant cost), not after it inside appendExactlyOnce
    val replayed = appId.exists(app => graft.catalog.SnapshotTable
      .lastTxn(spark, outDir, app).exists(_ >= batchId))
    if (!replayed) {
      val flagged = ngramOverlapPrepared(batch, prep, minHits, textCol, idCol)
        .filter(col("contaminated")).select(col(idCol))
      // persisted: the emptiness probe and the append would otherwise each
      // run the full sweep — 2x the batch cost
      val clean = batch.join(flagged, Seq(idCol), "left_anti").persist()
      try {
        if (!clean.isEmpty) appId match {
          case Some(app) =>
            graft.catalog.SnapshotTable.appendExactlyOnce(spark, clean, outDir, app, batchId)
            ()
          case None =>
            // atomic: creation is decided inside the OCC commit loop, so
            // two sinks racing the same outDir's first batch both land
            graft.catalog.SnapshotTable.createOrAppend(spark, clean, outDir)
            ()
        }
      } finally clean.unpersist(blocking = false)
    }
    ()
  }

  /** Per-document overlap flags: (idCol, n_hit, contaminated) for EVERY
    * corpus document — n_hit = number of DISTINCT n-grams shared with any
    * benchmark document (0 for clean docs; `shingleHashes` already
    * de-duplicates within a doc), contaminated = n_hit ≥ minHits.
    *
    * @param docs      training corpus (idCol, textCol)
    * @param benchmark evaluation set (benchTextCol; ids irrelevant)
    * @param n         n-gram length — 13 is the published convention for
    *                  web-scale corpora; the default 8 suits shorter-doc
    *                  fixtures (a doc under n tokens has no n-grams and is
    *                  never flagged, mirroring the published rule)
    * @param minHits   distinct shared n-grams required to flag
    * @param expectedBenchGrams bloom sizing (distinct benchmark n-grams);
    *                  None (default) sizes from a count of the benchmark
    *                  side — see [[graft.ops.BloomJoin.bloomSemiJoin]]
    */
  def ngramOverlap(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      minHits: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id",
      benchTextCol: String = "text",
      expectedBenchGrams: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(minHits >= 1, s"minHits must be positive, got $minHits")
    val spark = docs.sparkSession
    val benchGrams = benchmark
      .select(explode(TextFunctions.shingleHashes(spark, col(benchTextCol), n)).as("h"))
      .distinct()
    val corpusGrams = docs
      .select(col(idCol), explode(TextFunctions.shingleHashes(spark, col(textCol), n)).as("h"))
    val hits = graft.ops.BloomJoin
      .bloomSemiJoin(corpusGrams, benchGrams, "h", "h", expectedBenchGrams, fpp)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit")) // hashes are per-doc distinct already
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contaminated", col("n_hit") >= minHits)
  }

  /** Span-level contamination EXCISION: instead of dropping a contaminated
    * document wholesale ([[removeContaminated]]), cut ONLY the token
    * windows that verbatim-overlap the benchmark — the decontamination
    * variant large pipelines use when whole-doc removal would throw away
    * too much clean text around a quoted benchmark snippet. Every token
    * covered by ANY matching n-gram window [p, p+n-1] is removed; the
    * survivors reassemble in original order.
    *
    * Token space is the dedup stack's canonical one (lowercased whitespace
    * tokens — same normalization as [[ngramOverlap]]'s shingles), so
    * `clean_text` is canonical-token text, not a byte-identical substring
    * of the input.
    *
    * Scale shape: fully relational — positions stay INSIDE each doc's token
    * array (never exploded against hits), benchmark grams aggregate once
    * (hash-keyed join; string equality modulo xxhash64 collisions, the
    * stack's standard argument), and the per-doc hit windows MERGE INTO
    * DISJOINT INTERVALS first (one groupBy + one sorted array fold, bounded
    * by the doc's hit count), so coverage is an array-local check of
    * O(tokens × merged-intervals) per doc — a long document quoting the
    * benchmark end-to-end collapses to ONE interval and costs O(tokens),
    * where a positions×hits join would cost O(len²). No windows, no
    * per-row UDFs, nothing corpus-sized on the driver.
    *
    * @return every corpus doc: (doc_id, clean_text, n_tokens, n_removed)
    */
  def exciseContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id",
      benchTextCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val spark = docs.sparkSession
    graft.extensions.GraftExtensions.register(spark) // ws_tokens below
    val toks = docs.select(col(idCol).as("doc_id"),
      graft.extensions.GraftExtensions.ws_tokens(lower(col(textCol))).as("toks"))
    // gram start positions: shingles() emits index order, so pos = start
    val grams = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.shingles(spark, col(textCol), n)).as(Seq("p", "s")))
      .select(col("doc_id"), col("p"), xxhash64(col("s")).as("h"))
    val benchGrams = benchmark
      .select(explode(TextFunctions.shingleHashes(spark, col(benchTextCol), n)).as("h"))
      .distinct()
    val hits = grams.join(benchGrams, "h")
      .select(col("doc_id"), col("p")).distinct()
    // merge each doc's hit windows [p, p+n-1] into disjoint intervals:
    // starts sort ascending, and a window whose start falls at or inside
    // the running interval (+1 for adjacency — the coverage union is the
    // same either way) extends it. Intervals ≤ hits, usually FAR fewer —
    // contiguous contamination collapses to one.
    val emptyIvs = expr("cast(array() as array<struct<s:int,e:int>>)")
    val ivs = hits.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("p"))).as("ps"))
      .select(col("doc_id"),
        aggregate(col("ps"), emptyIvs, (acc, p) => {
          val last = element_at(acc, -1)
          val end = (p + lit(n) - 1).cast("int")
          when(size(acc) > 0 && p <= last.getField("e") + 1,
            concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(last.getField("s").as("s"), end.as("e")))))
            .otherwise(concat(acc, array(struct(p.cast("int").as("s"), end.as("e")))))
        }).as("ivs"))
    // coverage is array-local: a token survives when no interval holds its
    // index; survivors keep original order, so the rebuild is a plain join
    val withIvs = toks.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"), coalesce(col("ivs"), emptyIvs).as("ivs"))
    val kept = filter(col("toks"), (_, i) =>
      !exists(col("ivs"), v => i >= v.getField("s") && i <= v.getField("e")))
    withIvs.select(col("doc_id"),
      concat_ws(" ", kept).as("clean_text"),
      size(col("toks")).cast("long").as("n_tokens"),
      (size(col("toks")) - size(kept)).cast("long").as("n_removed"))
  }

  /** The corpus with contaminated documents REMOVED — the pipeline's
    * actionable form of [[ngramOverlap]] (all original columns kept).
    */
  def removeContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      minHits: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id",
      benchTextCol: String = "text",
      expectedBenchGrams: Option[Long] = None): DataFrame = {
    val flagged = ngramOverlap(docs, benchmark, n, minHits, textCol, idCol,
      benchTextCol, expectedBenchGrams)
      .filter(col("contaminated")).select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
