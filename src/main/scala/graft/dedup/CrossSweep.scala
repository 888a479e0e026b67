package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPOSED inter-dump sweep: a fresh crawl dump deduped against the
  * curated corpus on BOTH tiers before it joins — verbatim
  * ([[Dedup.crossNearDupsPrepared]], shingle Jaccard) first because it is
  * the cheaper tier and catches the bulk (recrawls and mirrors), then ONLY
  * the survivors swept semantically
  * ([[SemDeDup.crossSemanticDupsPrepared]], cell-scoped embedding cosine)
  * for the paraphrase/template tail. This is the composition the per-tier
  * operators' docs describe; packaging it keeps the cache discipline
  * right: ONE persisted arrivals frame feeds both tiers (the verbatim
  * tier's shingling and the semantic tier's assignment read the same
  * in-memory batch — unpersisted, tier two would re-evaluate the
  * arrivals' source), and the survivors frame is pinned across its two
  * readers (the semantic sweep and the final anti-join).
  *
  * Both prepared references are reusable across dumps — cache-pinned
  * ([[Dedup.crossPrepare]]/[[SemDeDup.crossSemanticPrepare]]) or durable
  * snapshot tables ([[Dedup.crossPrepareTable]]/
  * [[SemDeDup.crossSemanticPrepareTable]]), interchangeably. Because a
  * semantic flag depends only on (doc, reference) — never on other
  * arrivals — sweeping survivors-only returns exactly `fresh` minus the
  * UNION of both tiers' flag sets, while paying the semantic tier's cell
  * join only for docs the cheap tier didn't already kill.
  */
object CrossSweep {

  /** `fresh` minus every doc that duplicates the curated corpus on either
    * tier — all original columns kept. `fresh` carries `idCol`, `textCol`
    * (verbatim tier) and `vecCol` (embedding array, semantic tier). Docs
    * too short to shingle pass the verbatim tier (no signature — the
    * single-corpus contract); every doc is still swept semantically.
    */
  def removeCrossAll(
      fresh: DataFrame,
      verbatim: Dedup.PreparedReference,
      semantic: SemDeDup.PreparedCells,
      jaccardThreshold: Double = 0.5,
      cosThreshold: Double = 0.95,
      textCol: String = "text",
      idCol: String = "doc_id",
      vecCol: String = "vec"): DataFrame = {
    // persist a DERIVED frame (trivial Project), never the caller's own
    // Dataset: persisting `fresh` directly would make the trailing
    // materialize() unpersist the CALLER's cache entry if they had pinned
    // the same plan — a library call must not clobber external cache state
    val arrivals = fresh.select(fresh.columns.map(col).toIndexedSeq: _*).persist()
    val vFlag = Dedup
      .crossNearDupsPrepared(arrivals, verbatim, jaccardThreshold, textCol, idCol)
      .select(col("new_id").as(idCol)).distinct()
    val survivors = arrivals.join(vFlag, Seq(idCol), "left_anti").persist()
    val sFlag = SemDeDup
      .crossSemanticDupsPrepared(
        survivors.select(col(idCol).as("id"), col(vecCol).as("vec")),
        semantic, cosThreshold)
      .select(col("new_id").as(idCol)).distinct()
    val kept = survivors.join(sFlag, Seq(idCol), "left_anti")
    graft.util.Caching.materialize(kept, arrivals, survivors)
  }

  /** The post-sweep BOOKKEEPING step, packaged: append the docs that just
    * joined the curated corpus (a sweep's survivors — [[crossAllSink]]'s
    * landed batch) to BOTH tiers' durable references in one call, so the
    * NEXT dump is deduped against them too. One persisted batch feeds the
    * verbatim tier's shingling ([[Dedup.crossPrepareAppend]]) and the
    * semantic tier's frozen-centroid assignment
    * ([[SemDeDup.crossSemanticPrepareAppend]]) — unpersisted, each append
    * would re-evaluate the caller's source. With `appId` the WHOLE step is
    * exactly-once across all three underlying tables under crash replay:
    * each table carries the (appId → batchId) marker independently, so a
    * re-run after a crash anywhere in the sequence re-commits exactly the
    * missing tables and no rows duplicate. Caller contract: ids not
    * already in the references (the sweep's output guarantees it); `landed`
    * carries `idCol`, `textCol`, and `vecCol`.
    */
  def appendReferences(
      landed: DataFrame,
      verbatimDir: String,
      semanticDir: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      vecCol: String = "vec",
      appId: Option[String] = None,
      batchId: Long = 0L): Unit = {
    // derived-frame persist, never the caller's own Dataset (the
    // removeCrossAll discipline: a library call must not clobber external
    // cache state by unpersisting a plan the caller also pinned)
    val batch = landed.select(landed.columns.map(col).toIndexedSeq: _*).persist()
    try {
      Dedup.crossPrepareAppend(batch, verbatimDir, textCol, idCol, appId, batchId)
      SemDeDup.crossSemanticPrepareAppend(
        batch.select(col(idCol).as("id"), col(vecCol).as("vec")),
        semanticDir, appId, batchId)
    } finally batch.unpersist(blocking = false)
  }

  /** Ingest form (`foreachBatch` sink): every micro-batch runs the
    * two-tier sweep and only docs duplicating NOTHING in the curated
    * corpus append to the snapshot table at `outDir` — the composed
    * member of the ingest tier ([[Dedup.crossSink]] +
    * [[SemDeDup.crossSemanticSink]] in one pass over one persisted
    * batch). Stateless across batches; all-dup/empty batches publish NO
    * version; exactly-once with `appId` (marker checked BEFORE the sweep,
    * so a crash-replayed batch costs one manifest parse); without one,
    * at-least-once on replay with atomic first-batch creation via
    * [[graft.catalog.SnapshotTable.createOrAppend]]
    * ([[Dedup.crossSink]]'s contract note).
    */
  def crossAllSink(
      verbatim: Dedup.PreparedReference,
      semantic: SemDeDup.PreparedCells,
      outDir: String,
      jaccardThreshold: Double = 0.5,
      cosThreshold: Double = 0.95,
      textCol: String = "text",
      idCol: String = "doc_id",
      vecCol: String = "vec",
      appId: Option[String] = None): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val replayed = appId.exists(app => graft.catalog.SnapshotTable
      .lastTxn(spark, outDir, app).exists(_ >= batchId))
    if (!replayed) {
      // eagerly materialized by removeCrossAll: the emptiness probe and
      // the append both read the checkpointed result, not a re-sweep
      val clean = removeCrossAll(batch, verbatim, semantic,
        jaccardThreshold, cosThreshold, textCol, idCol, vecCol)
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
    }
    ()
  }
}
