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
  private[graft] case class FoldDelta(remap: DataFrame, newDocs: DataFrame)

  /** Contract the batch against `prev` (the persisted current assignment)
    * and run components on the batch-sized contracted graph.
    *
    * ONE-COLLECT driver path (r21): the contract join's output is
    * batch-bounded by construction, so within the same cap the AUTO
    * components entry already used, the WHOLE delta — contraction,
    * union-find, the remap AND the new-doc assignment — computes from a
    * single collected frame. The previous shape ran components driver-side
    * but still derived `newDocs` distributively (endpoint distinct →
    * anti-join against the corpus-sized assignment → join back to the
    * components), three scheduled stages per fold whose inputs the collect
    * already held; the r21 job profile showed q151's folds dominated by
    * exactly this class of small scheduled jobs. Past the cap the original
    * distributed shape runs unchanged.
    */
  private[graft] def foldDelta(newEdges: DataFrame, prev: DataFrame,
      driverMax: Int = 1 << 18): FoldDelta = {
    val spark = newEdges.sparkSession
    val joined = newEdges
      .join(prev.select(col("doc_id").as("id_a"), col("rep_id").as("ra")), Seq("id_a"), "left")
      .join(prev.select(col("doc_id").as("id_b"), col("rep_id").as("rb")), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"), col("ra"), col("rb"))
    val sample = joined.limit(driverMax + 1).collect()
    if (sample.length > driverMax) {
      // distributed fallback — the pre-r21 shape, verbatim
      val mapped = joined
        .select(coalesce(col("ra"), col("id_a")).as("id_a"),
          coalesce(col("rb"), col("id_b")).as("id_b"))
      val ccd = Graph.connectedComponentsAuto(mapped)
      val remap = broadcast(ccd.filter(col("id") =!= col("rep"))
        .select(col("id").as("rep_id"), col("rep").as("new_rep")))
      val newDocs = newEdges.select(col("id_a").as("doc_id"))
        .union(newEdges.select(col("id_b"))).distinct()
        .join(prev.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .join(ccd.select(col("id").as("doc_id"), col("rep").as("rep_id")), Seq("doc_id"))
      return FoldDelta(remap, newDocs)
    }
    // driver path: union-find with path halving over the CONTRACTED
    // endpoints (absent from prev → the doc is its own node); every union
    // keeps the SMALLER root, so find(x) is the component's min id — the
    // same algebra as Graph.connectedComponentsAuto, whose equivalence the
    // fold specs pin
    val n = sample.length
    val parent = new java.util.HashMap[Long, Long](n * 4)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) {
        parent.put(r, parent.get(parent.get(r)))
        r = parent.get(r)
      }
      r
    }
    def union(a: Long, b: Long): Unit = {
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    // new doc ids (endpoints absent from prev), deduped driver-side
    val newIds = new java.util.LinkedHashSet[Long]()
    var i = 0
    while (i < n) {
      val r = sample(i)
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "foldPairs: NULL edge id — id_a/id_b must be non-null values castable to long")
      val a = r.getLong(0); val b = r.getLong(1)
      val ca = if (r.isNullAt(2)) { newIds.add(a); a } else r.getLong(2)
      val cb = if (r.isNullAt(3)) { newIds.add(b); b } else r.getLong(3)
      union(ca, cb)
      i += 1
    }
    // remap rows: contracted nodes whose component min moved (identity
    // rows excluded — the pre-r21 ccd.filter(id =!= rep) semantics)
    val remapRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    parent.keySet().forEach { id =>
      val rep = find(id)
      if (rep != id) remapRows.add(org.apache.spark.sql.Row(id, rep))
    }
    val newDocRows = new java.util.ArrayList[org.apache.spark.sql.Row](newIds.size())
    newIds.forEach { id => newDocRows.add(org.apache.spark.sql.Row(id, find(id))) }
    def frame(rows: java.util.ArrayList[org.apache.spark.sql.Row],
        c1: String, c2: String) =
      spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(c1, org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField(c2, org.apache.spark.sql.types.LongType, false))))
    FoldDelta(broadcast(frame(remapRows, "rep_id", "new_rep")),
      frame(newDocRows, "doc_id", "rep_id"))
  }

  /** Fold one batch of candidate pairs (columns `id_a`, `id_b`; extras
    * ignored) into the clusters table at `clustersDir`, merging ONLY the
    * changed rows into the assignment snapshot. Returns the committed (or,
    * for a no-change fold, current) snapshot version. An empty batch — or
    * a batch whose pairs are all already-connected — publishes no version.
    *
    * `mor = true` commits the merge MERGE-ON-READ
    * ([[SnapshotTable.mergeByKeyMoR]]): superseded assignment rows become
    * deletion vectors and only the changed rows write as new files — fold
    * write cost strictly O(Δ) even when changed docs scatter across many
    * big files; schedule [[SnapshotTable.compact]] to purge the vectors.
    * Default (copy-on-write) rewrites the touched files whole, keeping
    * them clean.
    */
  def foldPairs(spark: SparkSession, clustersDir: String, pairs: DataFrame,
      mor: Boolean = false,
      // operational compaction cadence for MoR folds: after a fold
      // commits, if the assignment's deletion-vector positions exceed this
      // fraction of its physical rows (read from the MANIFEST — no data
      // scan), [[maintain]] runs, purging vectors and re-clustering by
      // doc_id. Closes the MoR loop without an external scheduler: read
      // amplification stays bounded by the ratio across any number of
      // folds. None (default) leaves maintenance to the caller's cadence.
      maintainAboveDvRatio: Option[Double] = None): Long = {
    maintainAboveDvRatio.foreach(r => require(r > 0.0 && r < 1.0,
      s"maintainAboveDvRatio must be in (0, 1), got $r"))
    val newEdges = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
    val existing = SnapshotTable.exists(spark, clustersDir)
    def maintained(v: Long): Long = maintainAboveDvRatio match {
      case Some(r) if dvRatio(spark, clustersDir) > r =>
        maintain(spark, clustersDir)
        SnapshotTable.versions(spark, clustersDir).max
      case _ => v
    }
    // NO empty-batch pre-probe (r21): the probe was one full scheduled job
    // per fold in the COMMON (non-empty) path; an empty batch flows through
    // the batch-bounded delta computation to the merge layer, which
    // detects the empty delta itself and no-ops without publishing a
    // version — the same version-wise contract, one job cheaper per fold.
    if (!existing) {
      SnapshotTable.write(spark,
        Graph.connectedComponentsAuto(newEdges)
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
        // changed rows only: members of merged clusters re-keyed to the
        // new rep, plus brand-new docs — the merge rewrites just the data
        // files whose doc_id bounds contain them ([[foldDeltaChanges]],
        // the one definition shared with the crash-repair path)
        val (d, changes0) = foldDeltaChanges(newEdges, prev)
        val changes = changes0.persist()
        // no emptiness pre-probe: the merge's own footprint collect detects
        // an empty delta and no-ops (returning the current version) — one
        // less job per fold
        try {
          maintained(
            if (mor) SnapshotTable.mergeByKeyMoR(spark, changes, clustersDir, "doc_id")
            else SnapshotTable.mergeByKey(spark, changes, clustersDir, "doc_id"))
        } finally changes.unpersist(blocking = false)
      } finally prev.unpersist(blocking = false)
    }
  }

  /** [[foldPairs]] plus incremental QUALITY-AWARE representative
    * maintenance ([[graft.dedup.Dedup.qualityAwareReps]]'s signal, kept
    * as mergeable per-cluster state): alongside the assignment at
    * `clustersDir`, a cluster-level side table at `repsDir` —
    * `(rep_id, best_doc, best_score)` — tracks each cluster's argmax
    * member, so selecting production representatives after a fold never
    * re-joins the corpus-sized assignment against a corpus-sized score
    * frame. Per-cluster best is MERGEABLE state (max of maxes = max of
    * all — the same struct-max argmax as the batch operator, score ties
    * to min doc id), so a fold only touches the clusters the batch
    * touched: absorbed clusters' bests re-key through the remap, target
    * clusters' own bests re-enter the argmax, the batch's new docs bring
    * their scores, and stale rep rows (absorbed cluster keys) delete —
    * every step batch-bounded, committed through the same
    * stats-pruned keyed MERGE as the assignment.
    *
    * `scores` must cover the batch's NEW doc ids with one deterministic
    * `(doc_id, score)` row each (the ingest pipeline computes them at
    * arrival — unscored members can't win, matching the batch operator's
    * inner-join contract). After any number of folds the reps table
    * equals the batch recomputation over the full assignment and all
    * scores (spec'd in IncrementalClustersSpec).
    *
    * CRASH SAFETY: the two tables commit separately (assignment first).
    * Without `txn`, a crash between them leaves reps one fold behind, and
    * because replays are structural no-ops they heal the assignment but
    * not reps — rebuild reps with the batch operator if that window
    * matters. WITH `txn = Some((appId, batchId))` (monotonic ids —
    * Structured Streaming's foreachBatch contract) the fold is
    * exactly-once end-to-end: the assignment merge records an
    * `appId#assign` marker and the reps merge an `appId#reps` marker, so a
    * re-delivered batch (a) skips cleanly when both landed, (b) re-runs
    * the whole fold when neither did, and (c) REPAIRS the half-applied
    * state when only the assignment committed — the fold's delta is
    * recomputed against the assignment AS OF the version before the
    * marker's commit (time travel; vacuum retention must still cover it)
    * and the reps leg re-runs. The reps leg is ONE commit — the stale-rep
    * deletes ride the merge itself ([[SnapshotTable.mergeByKeys]]'
    * `deleteKeys`) — so there is no state a crash can half-apply within
    * the leg.
    *
    * `mor = true` routes BOTH tables' merges through
    * [[SnapshotTable.mergeByKeyMoR]] (stale rep rows become deletion-
    * vector positions in the same commit).
    */
  def foldPairsScored(
      spark: SparkSession,
      clustersDir: String,
      repsDir: String,
      pairs: DataFrame,
      scores: DataFrame,
      mor: Boolean = false,
      txn: Option[(String, Long)] = None,
      // [[foldPairs]]' operational compaction cadence, over BOTH tables: a
      // MoR scored pipeline accumulates deletion vectors on the assignment
      // AND the reps table (stale-rep deletes vector out too), so after a
      // committing fold each table whose manifest-read [[dvRatio]] exceeds
      // this runs [[maintain]]. None (default) leaves maintenance to the
      // caller's cadence.
      maintainAboveDvRatio: Option[Double] = None): Long = {
    maintainAboveDvRatio.foreach(r => require(r > 0.0 && r < 1.0,
      s"maintainAboveDvRatio must be in (0, 1), got $r"))
    // after a committing fold (normal, create, or heal): compact whichever
    // table's deletion-vector ratio crossed the knob; the returned version
    // tracks the assignment's newest when its own maintenance committed
    def maintained(v: Long): Long = maintainAboveDvRatio match {
      case Some(r) =>
        val assignCompacted = dvRatio(spark, clustersDir) > r
        if (assignCompacted) maintain(spark, clustersDir)
        if (SnapshotTable.exists(spark, repsDir) && dvRatio(spark, repsDir) > r)
          maintainReps(spark, repsDir)
        if (assignCompacted) SnapshotTable.versions(spark, clustersDir).max else v
      case None => v
    }
    val newEdges = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
    val sc = scores.select(col("doc_id").cast("long").as("doc_id"), col("score"))
    val assignTxn = txn.map { case (a, b) => (s"$a#assign", b) }
    val repsTxn = txn.map { case (a, b) => (s"$a#reps", b) }
    val existing = SnapshotTable.exists(spark, clustersDir)
    val repsExisting = SnapshotTable.exists(spark, repsDir)

    // txn dispatch: the assignment already carries this batch -> the reps
    // leg is the only possibly-missing piece; repair it from the
    // assignment's HISTORY instead of re-running the fold (whose delta
    // against the post-fold assignment would be empty)
    assignTxn match {
      case Some((aApp, b)) if existing &&
          SnapshotTable.lastTxn(spark, clustersDir, aApp).exists(_ >= b) =>
        val repsDone = repsExisting &&
          repsTxn.exists { case (rApp, _) =>
            SnapshotTable.lastTxn(spark, repsDir, rApp).exists(_ >= b) }
        return if (repsDone) SnapshotTable.versions(spark, clustersDir).max
          else maintained(healRepsLeg(spark, clustersDir, repsDir, prev =>
            foldDeltaChanges(newEdges, prev), sc, aApp, b, mor, repsTxn))
      case _ => ()
    }

    require(repsExisting == existing,
      s"clusters ($clustersDir) and reps ($repsDir) tables must be created together " +
        "(bootstrapping reps for an existing assignment needs corpus-wide scores: " +
        "use Dedup.qualityAwareReps once, then fold; a txn-carrying fold heals its " +
        "own crash windows automatically)")

    // NO empty-batch pre-probe (r21): the probe was one full scheduled job
    // per fold in the COMMON (non-empty) path; an empty batch flows through
    // the batch-bounded delta computation to the merge layer, which
    // detects the empty delta itself and no-ops without publishing a
    // version — the same version-wise contract, one job cheaper per fold.
    if (!existing) {
      val assignment = Graph.connectedComponentsAuto(newEdges)
        .select(col("id").as("doc_id"), col("rep").as("rep_id")).persist()
      try {
        // with a marker, the create goes through the marker-carrying merge
        // (a merge against an absent table IS a create) so the crash window
        // between the two creates is detectable and heals on replay
        val v = txn match {
          case Some(_) => mergeInto(spark, assignment, clustersDir, "doc_id", mor, assignTxn)
          case None => SnapshotTable.write(spark, assignment, clustersDir)
        }
        crashSeam("afterAssignmentCommit")
        val repRows = bestOf(assignment.join(sc, "doc_id"))
        txn match {
          case Some(_) => mergeInto(spark, repRows, repsDir, "rep_id", mor, repsTxn)
          case None => SnapshotTable.write(spark, repRows, repsDir)
        }
        maintained(v)
      } finally assignment.unpersist(blocking = false)
    } else {
      val prev = SnapshotTable.read(spark, clustersDir)
        .select(col("doc_id"), col("rep_id")).persist()
      try {
        val (d, changes0) = foldDeltaChanges(newEdges, prev)
        val changes = changes0.persist()
        try {
          if (changes.isEmpty) SnapshotTable.versions(spark, clustersDir).max
          else {
            val v = mergeInto(spark, changes, clustersDir, "doc_id", mor, assignTxn)
            crashSeam("afterAssignmentCommit")
            applyRepsLeg(spark, repsDir, d, changes, sc, mor, repsTxn)
            maintained(v)
          }
        } finally changes.unpersist(blocking = false)
      } finally prev.unpersist(blocking = false)
    }
  }

  private def mergeInto(spark: SparkSession, batch: DataFrame, dir: String,
      key: String, mor: Boolean, marker: Option[(String, Long)],
      deleteKeys: Seq[Long] = Nil): Long =
    if (mor) SnapshotTable.mergeByKeysMoR(spark, batch, dir, Seq(key), txn = marker,
      deleteKeys = deleteKeys.map(Seq[Any](_)))
    else SnapshotTable.mergeByKeys(spark, batch, dir, Seq(key), txn = marker,
      deleteKeys = deleteKeys.map(Seq[Any](_)))

  /** Per-cluster argmax: max (score, -doc_id) struct — score ties resolve
    * to the MIN doc id, matching [[graft.dedup.Dedup.qualityAwareReps]].
    */
  private def bestOf(candidates: DataFrame): DataFrame = candidates
    .groupBy(col("rep_id"))
    .agg(max(struct(col("score"), (-col("doc_id")).as("neg"),
      col("doc_id").as("best_doc"))).as("m"))
    .select(col("rep_id"), col("m.best_doc").as("best_doc"),
      col("m.score").as("best_score"))

  /** (delta, changes) for a batch folded against `prev` — the shared core
    * of the normal fold and the crash-repair path.
    */
  private def foldDeltaChanges(newEdges: DataFrame, prev: DataFrame)
      : (FoldDelta, DataFrame) = {
    val d = foldDelta(newEdges, prev)
    val moved = prev.join(d.remap, Seq("rep_id"))
      .select(col("doc_id"), col("new_rep").as("rep_id"))
    (d, moved.unionByName(d.newDocs))
  }

  /** The reps-side half of a scored fold, committed as ONE keyed merge:
    * argmax candidates for every touched target cluster upsert, and the
    * absorbed clusters' stale rows delete IN THE SAME COMMIT
    * ([[SnapshotTable.mergeByKeys]]' `deleteKeys`). One commit means one
    * txn marker covers the whole leg — there is no window where a crash
    * can strand the delete and the merge apart, and a replayed leg either
    * fully applied (marker present, skip) or re-runs from unmodified
    * inputs.
    */
  private def applyRepsLeg(spark: SparkSession, repsDir: String, d: FoldDelta,
      changes: DataFrame, sc: DataFrame, mor: Boolean,
      repsTxn: Option[(String, Long)]): Unit = {
    val oldBests = SnapshotTable.read(spark, repsDir)
      .select(col("rep_id"), col("best_doc"), col("best_score"))
    // candidates for every TOUCHED target cluster: absorbed clusters'
    // bests re-keyed through the remap, the targets' own current bests,
    // and the new docs' scores — all batch-bounded
    val targets = changes.select(col("rep_id")).distinct()
    val movedBests = oldBests.join(d.remap, Seq("rep_id"))
      .select(col("new_rep").as("rep_id"),
        col("best_score").as("score"), col("best_doc").as("doc_id"))
    val survivorBests = oldBests.join(broadcast(targets), Seq("rep_id"), "left_semi")
      .select(col("rep_id"),
        col("best_score").as("score"), col("best_doc").as("doc_id"))
    val newScores = d.newDocs.join(sc, "doc_id")
      .select(col("rep_id"), col("score"), col("doc_id"))
    val repRows = bestOf(movedBests.unionByName(survivorBests).unionByName(newScores))
    // absorbed clusters are no longer reps: their rows delete in the same
    // commit (batch-bounded literal — the remap is O(|Δ| endpoints))
    val stale = d.remap.select(col("rep_id")).collect().map(_.getLong(0))
    // the reps invariant (every live cluster has a reps row) makes repRows
    // non-empty whenever anything was absorbed — surface a violation loudly
    // here instead of tripping the merge's opaque empty-batch refusal
    if (stale.nonEmpty) require(!repRows.isEmpty,
      s"reps invariant violated at $repsDir: ${stale.length} absorbed cluster(s) " +
        "produced no argmax candidates — the reps table lacks rows for live " +
        "clusters (or the batch's scores are missing); rebuild it with " +
        "Dedup.qualityAwareReps, then resume folding")
    // UNCONDITIONAL merge: an empty leg (stale empty too — reachable only
    // when the scores contract was violated for score-less new docs) still
    // records the txn marker via the merge's metadata-only commit, so a
    // replayed batch skips instead of re-healing forever
    mergeInto(spark, repRows, repsDir, "rep_id", mor, repsTxn, deleteKeys = stale.toSeq)
    ()
  }

  /** Repair the reps table after a crash inside a txn-carrying scored
    * fold: the assignment records (appId#assign -> batchId) but the reps
    * marker is missing. The fold's delta is recomputed against the
    * assignment AS OF the version BEFORE the marker's commit (time
    * travel — vacuum retention must still cover it); [[foldDelta]] is
    * deterministic given (prev, batch), so the repair equals what the
    * crashed fold would have committed.
    */
  private def healRepsLeg(spark: SparkSession, clustersDir: String, repsDir: String,
      deltaOf: DataFrame => (FoldDelta, DataFrame), sc: DataFrame,
      assignApp: String, batchId: Long, mor: Boolean,
      repsTxn: Option[(String, Long)]): Long = {
    val curV = SnapshotTable.versions(spark, clustersDir).max
    SnapshotTable.versionRecordingTxn(spark, clustersDir, assignApp, batchId) match {
      case None =>
        // marker >= batchId without the exact id retained: either that
        // batch structurally no-op'd on the assignment (empty delta -> no
        // reps work either) or its manifest was vacuumed along with every
        // LATER one that still records it — impossible while the current
        // manifest records >= batchId, since markers carry forward
        curV
      case Some(v) if v <= 1L =>
        // create-fold crash: batch 0 covered EVERY doc the assignment
        // holds, so reps rebuild from the full (first-batch-sized)
        // assignment and the batch's scores
        val repRows = bestOf(SnapshotTable.read(spark, clustersDir)
          .select(col("doc_id"), col("rep_id")).join(sc, "doc_id"))
        mergeInto(spark, repRows, repsDir, "rep_id", mor, repsTxn)
        curV
      case Some(v) =>
        require(SnapshotTable.exists(spark, repsDir),
          s"reps table at $repsDir is missing while the assignment at $clustersDir " +
            s"is $v folds deep — repair needs corpus-wide scores: rebuild with " +
            "Dedup.qualityAwareReps, then resume folding")
        // sanity: v must be the commit that INTRODUCED the marker, i.e.
        // v-1 predates the batch. Retention drops manifests oldest-first,
        // so this cannot trip on a healthy log — but if the true marker
        // commit were ever gone while a later carry-forward manifest
        // matched, repairing against a POST-fold snapshot would compute an
        // empty delta and silently leave reps stale; refuse loudly instead
        if (SnapshotTable.lastTxnAt(spark, clustersDir, v - 1, assignApp)
            .exists(_ >= batchId))
          throw new IllegalStateException(
            s"assignment log at $clustersDir no longer retains batch $batchId's marker " +
              s"commit (version ${v - 1} already records it) — the pre-fold snapshot is " +
              "gone; rebuild reps with Dedup.qualityAwareReps, then resume folding")
        val prev = SnapshotTable.readVersion(spark, clustersDir, v - 1)
          .select(col("doc_id"), col("rep_id")).persist()
        try {
          val (d, changes0) = deltaOf(prev)
          val changes = changes0.persist()
          try applyRepsLeg(spark, repsDir, d, changes, sc, mor, repsTxn)
          finally changes.unpersist(blocking = false)
        } finally prev.unpersist(blocking = false)
        curV
    }
  }

  /** Test seams for the two-table fold's crash-recovery specs: a name in
    * this set throws at the matching point. Production code never
    * populates it.
    */
  private[graft] val crashSeams: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def crashSeam(name: String): Unit =
    if (crashSeams.contains(name))
      throw new IllegalStateException(s"injected crash: $name")

  /** The current per-cluster best members (rep_id, best_doc, best_score). */
  def reps(spark: SparkSession, repsDir: String): DataFrame =
    SnapshotTable.read(spark, repsDir)

  /** `foreachBatch` sink over a candidate-pair stream:
    * {{{
    * StreamingDedup.nearDupCandidates(docs).writeStream
    *   .foreachBatch(IncrementalClusters.sink(dir)).start()
    * }}}
    */
  def sink(clustersDir: String, mor: Boolean = false,
      maintainAboveDvRatio: Option[Double] = None)
      : (org.apache.spark.sql.Dataset[StreamingDedup.CandidatePair], Long) => Unit =
    (batch, _) => {
      foldPairs(batch.sparkSession, clustersDir, batch.toDF(), mor, maintainAboveDvRatio)
      ()
    }

  /** `foreachBatch` sink for the SCORED fold — wires the stream's batchId
    * into the txn marker, so the two-table fold is exactly-once
    * end-to-end under crash replays (see [[foldPairsScored]]):
    * {{{
    * scoredPairs.writeStream.foreachBatch(
    *   IncrementalClusters.scoredSink(cdir, rdir, appId = "ingest-1",
    *     scoresOf = b => b.select(col("doc_id"), col("score")))).start()
    * }}}
    * The batch frame must carry (id_a, id_b) candidate pairs; `scoresOf`
    * extracts one deterministic (doc_id, score) row per NEW doc from the
    * same frame (the ingest pipeline computes scores at arrival —
    * [[foldPairsScored]]'s contract).
    */
  def scoredSink(clustersDir: String, repsDir: String, appId: String,
      scoresOf: DataFrame => DataFrame, mor: Boolean = false,
      maintainAboveDvRatio: Option[Double] = None)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    foldPairsScored(batch.sparkSession, clustersDir, repsDir, batch,
      scoresOf(batch), mor, txn = Some((appId, batchId)),
      maintainAboveDvRatio = maintainAboveDvRatio)
    ()
  }

  /** The current assignment (doc_id, rep_id). */
  def clusters(spark: SparkSession, clustersDir: String): DataFrame =
    SnapshotTable.read(spark, clustersDir)

  /** Deleted-position fraction of the assignment's PHYSICAL rows, read
    * from the manifest alone (no data scan) — the MoR fold's
    * read-amplification signal and [[foldPairs]]' `maintainAboveDvRatio`
    * trigger. 0.0 for clean or absent tables.
    */
  def dvRatio(spark: SparkSession, clustersDir: String): Double =
    SnapshotTable.currentManifest(spark, clustersDir) match {
      case None => 0.0
      case Some(m) =>
        val phys = m.entries.map(_.rows).sum
        if (phys == 0L) 0.0
        else m.entries.map(_.dv.map(_.deleted).getOrElse(0L)).sum.toDouble / phys
    }

  /** Assignment maintenance: compact the fold-fragmented file tail and
    * RANGE-CLUSTER by doc_id, so every data file covers a tight doc_id
    * span — [[SnapshotTable.mergeByKey]]'s file-bounds pruning then
    * rewrites the MINIMUM file set per fold (a batch touching k docs hits
    * only the files whose spans contain them, instead of every file whose
    * accidental id mixture overlaps). Run on the normal compaction cadence;
    * in MoR mode this also purges accumulated deletion vectors. Returns
    * (files before, files after).
    */
  def maintain(spark: SparkSession, clustersDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    SnapshotTable.compact(spark, clustersDir, targetBytes, zorderBy = Seq("doc_id"))

  /** [[maintain]] for the scored fold's REPS side table: compact +
    * range-cluster by `rep_id` — its merge key (reps rows are keyed by
    * CLUSTER, not doc, so the assignment's doc_id layout does not apply).
    */
  def maintainReps(spark: SparkSession, repsDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    SnapshotTable.compact(spark, repsDir, targetBytes, zorderBy = Seq("rep_id"))
}
