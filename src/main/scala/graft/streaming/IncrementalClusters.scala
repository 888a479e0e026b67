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
  * The fold never re-runs components over the accumulated pair set, and
  * never runs component ROUNDS over the assignment either. Each batch:
  * (1) maps the delta pairs' endpoints through the current assignment —
  * two same-component nodes contract to their reps; (2) runs
  * [[Graph.connectedComponents]] on that contracted graph, whose size is
  * O(|Δ| endpoints) regardless of corpus size; (3) rewrites the
  * assignment with ONE broadcast-join pass (the rep→new-rep table is
  * batch-sized) plus the batch's brand-new docs. Component-merging
  * iteration only ever touches batch-sized frames; the corpus-sized
  * assignment is scanned once per fold (persisted across the fold's
  * joins, released on commit) and rewritten once.
  *
  * The assignment lives in a snapshot table (schema `doc_id, rep_id` —
  * q59's shape), so readers get OCC-consistent versions, time travel over
  * cluster evolution, and vacuum for expired versions. A singleton rep
  * (doc_id = rep_id) survives the fold as a self-loop edge —
  * [[Graph.connectedComponents]] keeps self-loop-only nodes as rep=self.
  *
  * Re-folding an already-incorporated batch is IDEMPOTENT by construction:
  * its pairs connect nodes the assignment already places in one component,
  * so the recomputed assignment is unchanged (a crash-replayed foreachBatch
  * rewrites an equal snapshot version, never corrupts the clustering).
  */
object IncrementalClusters {

  /** Fold one batch of candidate pairs (columns `id_a`, `id_b`; extras
    * ignored) into the clusters table at `clustersDir`, replacing the
    * assignment snapshot. Returns the committed snapshot version. An empty
    * batch against an existing table is a no-op (current version, no new
    * snapshot).
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
      // remap pass, and the new-doc anti-join would otherwise each re-scan
      // the corpus-sized assignment — four table scans per fold instead of
      // one scan + cached reads (spill-safe default storage level; released
      // the moment the rewrite commits)
      val prev = SnapshotTable.read(spark, clustersDir)
        .select(col("doc_id"), col("rep_id")).persist()
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
      // min over the contracted component is the min over the merged one
      val remap = broadcast(ccd.select(col("id").as("rep_id"), col("rep").as("new_rep")))
      val updated = prev.join(remap, Seq("rep_id"), "left")
        .select(col("doc_id"), coalesce(col("new_rep"), col("rep_id")).as("rep_id"))
      val newDocs = newEdges.select(col("id_a").as("doc_id"))
        .union(newEdges.select(col("id_b"))).distinct()
        .join(prev.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .join(ccd.select(col("id").as("doc_id"), col("rep").as("rep_id")), Seq("doc_id"))
      try SnapshotTable.write(spark, updated.union(newDocs), clustersDir)
      finally prev.unpersist(blocking = false)
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
