package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.ops.Graph

/** Incrementally-maintained dedup CLUSTERS — the composition that closes
  * the ingest-dedup loop: [[StreamingDedup.nearDupCandidates]] emits
  * candidate PAIRS per micro-batch, but pairs aren't directly actionable
  * (keeping "one of each pair" double-drops docs in several pairs —
  * [[graft.ops.Graph]]'s own rationale); the actionable output is every
  * doc mapped to its connected component's representative.
  *
  * The fold is O(Δ) in BOTH compute and I/O. Compute: (1) delta pairs'
  * endpoints map through the current assignment — two same-component nodes
  * contract to their reps; (2) [[Graph.connectedComponents]] runs on that
  * contracted graph, whose size is O(|Δ| endpoints) regardless of corpus
  * size; component-merging iteration only ever touches batch-sized frames.
  * I/O: the corpus-sized assignment is SCANNED once per fold (persisted
  * across the fold's joins, released on commit) and the rewrite goes
  * through [[SnapshotTable.mergeByKey]] with ONLY the changed rows — docs
  * whose rep actually moved (members of clusters merged by this batch)
  * plus the batch's brand-new docs — so only data files whose doc_id
  * bounds intersect the touched docs are rewritten; the rest of the
  * assignment moves to the new snapshot BY REFERENCE. A fold that changes
  * nothing (replayed batch, all-redundant edges) publishes NO version.
  *
  * The assignment lives in a snapshot table (schema `doc_id, rep_id` —
  * q59's shape), so readers get OCC-consistent versions, time travel over
  * cluster evolution, and vacuum for expired versions. A singleton rep
  * (doc_id = rep_id) survives the fold as a self-loop edge —
  * [[Graph.connectedComponents]] keeps self-loop-only nodes as rep=self.
  *
  * Re-folding an already-incorporated batch is IDEMPOTENT by construction:
  * its pairs connect nodes the assignment already places in one component,
  * so every contracted pair is a self-loop, the remap is empty, no row
  * changes, and the fold publishes no new version (a crash-replayed
  * foreachBatch never corrupts the clustering — or even churns a version).
  */
object IncrementalClusters {

  /** One fold's delta against the current assignment: `remap` = old rep →
    * new rep for components this batch MERGED (genuine moves only — never
    * identity rows), `newDocs` = (doc_id, rep_id) for ids the assignment
    * has never seen. Both are bounded by the batch (remap) or the batch
    * plus its touched clusters (the callers' changed-row joins).
    */
  private case class FoldDelta(remap: DataFrame, newDocs: DataFrame)

  /** Contract the batch against `prev` (the persisted current assignment)
    * and run components on the batch-sized contracted graph.
    */
  private def foldDelta(newEdges: DataFrame, prev: DataFrame): FoldDelta = {
    // contract each delta endpoint to its current rep (absent → itself:
    // a brand-new doc is its own node); same-component pairs become
    // self-loops, which connectedComponents keeps as rep=self nodes, so
    // every touched rep and new doc gets a row in the tiny result
    val mapped = newEdges
      .join(prev.select(col("doc_id").as("id_a"), col("rep_id").as("ra")), Seq("id_a"), "left")
      .join(prev.select(col("doc_id").as("id_b"), col("rep_id").as("rb")), Seq("id_b"), "left")
      .select(coalesce(col("ra"), col("id_a")).as("id_a"),
        coalesce(col("rb"), col("id_b")).as("id_b"))
    val ccd = Graph.connectedComponents(mapped)
    // a component's rep is always its min DOC id: member reps are their
    // old components' minima and new docs bring their own ids, so the
    // min over the contracted component is the min over the merged one.
    // Identity rows (id == rep: untouched components, self-loop-only
    // nodes) are excluded — they move nothing, and keeping them would
    // make every member of every TOUCHED-but-unmerged cluster a "change"
    val remap = broadcast(ccd.filter(col("id") =!= col("rep"))
      .select(col("id").as("rep_id"), col("rep").as("new_rep")))
    val newDocs = newEdges.select(col("id_a").as("doc_id"))
      .union(newEdges.select(col("id_b"))).distinct()
      .join(prev.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .join(ccd.select(col("id").as("doc_id"), col("rep").as("rep_id")), Seq("doc_id"))
    FoldDelta(remap, newDocs)
  }

  /** Fold one batch of candidate pairs (columns `id_a`, `id_b`; extras
    * ignored) into the clusters table at `clustersDir`, merging ONLY the
    * changed rows into the assignment snapshot. Returns the committed (or,
    * for a no-change fold, current) snapshot version. An empty batch — or
    * a batch whose pairs are all already-connected — publishes no version.
    */
  def foldPairs(spark: SparkSession, clustersDir: String, pairs: DataFrame): Long = {
    val newEdges = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
    val existing = SnapshotTable.exists(spark, clustersDir)
    if (existing && newEdges.isEmpty) {
      SnapshotTable.versions(spark, clustersDir).max
    } else if (!existing) {
      SnapshotTable.write(spark,
        Graph.connectedComponents(newEdges)
          .select(col("id").as("doc_id"), col("rep").as("rep_id")),
        clustersDir)
    } else {
      // persisted for the fold: the contract joins (both endpoints), the
      // moved-row join, and the new-doc anti-join would otherwise each
      // re-scan the corpus-sized assignment (spill-safe default storage
      // level; released the moment the merge commits)
      val prev = SnapshotTable.read(spark, clustersDir)
        .select(col("doc_id"), col("rep_id")).persist()
      try {
        val d = foldDelta(newEdges, prev)
        // changed rows only: members of merged clusters re-keyed to the
        // new rep, plus brand-new docs — the merge rewrites just the data
        // files whose doc_id bounds contain them
        val moved = prev.join(d.remap, Seq("rep_id"))
          .select(col("doc_id"), col("new_rep").as("rep_id"))
        val changes = moved.unionByName(d.newDocs).persist()
        try {
          if (changes.isEmpty) SnapshotTable.versions(spark, clustersDir).max
          else SnapshotTable.mergeByKey(spark, changes, clustersDir, "doc_id")
        } finally changes.unpersist(blocking = false)
      } finally prev.unpersist(blocking = false)
    }
  }

  /** `foreachBatch` sink over a candidate-pair stream:
    * {{{
    * StreamingDedup.nearDupCandidates(docs).writeStream
    *   .foreachBatch(IncrementalClusters.sink(dir)).start()
    * }}}
    */
  def sink(clustersDir: String)
      : (org.apache.spark.sql.Dataset[StreamingDedup.CandidatePair], Long) => Unit =
    (batch, _) => { foldPairs(batch.sparkSession, clustersDir, batch.toDF()); () }

  /** The current assignment (doc_id, rep_id). */
  def clusters(spark: SparkSession, clustersDir: String): DataFrame =
    SnapshotTable.read(spark, clustersDir)
}
