package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** SEMANTIC deduplication (SemDeDup, Abbas et al. 2023): near-duplicate
  * documents that share no verbatim text — paraphrases, templated rewrites,
  * boilerplate variants — are invisible to MinHash/SimHash but sit next to
  * each other in embedding space. The published recipe: k-means the
  * embeddings, compare pairs ONLY within a cluster, and keep one
  * representative per group of pairs above a cosine threshold.
  *
  * Scale shape: the cluster assignment is a broadcast cross join (k × dim
  * centroid frame, never shuffled per row) and the quadratic pairwise stage
  * is bounded BY CELL — a corpus of N docs in k balanced clusters costs
  * O(N²/k) comparisons instead of O(N²), and the cell join is a plain
  * shuffle-hash join on the cluster id, so no executor ever materializes
  * more than one cell's pair block. Grouping pairs into KEEP sets runs
  * through [[graft.ops.Graph.connectedComponents]] (O(log n) rounds on any
  * topology), because cosine-above-threshold is not transitive and a
  * doc's duplicates may chain A~B~C with cos(A,C) below the cut.
  *
  * Determinism: centroids are caller-supplied (or the deterministic
  * [[Similarity.trainCentroids]] fit); assignment tie-breaks like
  * [[Similarity.assignEmbeddings]] (max (score, cid) struct); the kept
  * representative is the component's minimum id.
  */
object SemDeDup {

  /** Per-document semantic-dup verdicts: (id, cluster, rep_id, keep) for
    * EVERY corpus vector — `rep_id` = min id of the doc's
    * cosine-≥-threshold component within its cluster (its own id when it
    * has no semantic dup), `keep` = (id == rep_id).
    *
    * @param corpus    (id, vec) — vec array<double>
    * @param centroids cluster centers (k × dim); assignment is spherical
    *                  (nearest by cosine)
    * @param threshold within-cluster cosine at or above which two docs are
    *                  semantic duplicates (the paper sweeps 0.9–0.95+)
    */
  def semanticDedup(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    val spark = corpus.sparkSession
    // persisted: the assignment cross join feeds BOTH sides of the cell
    // self-join and the output frame — unpersisted it would replan (and
    // re-score every corpus vector against every centroid) three times
    val withCell = corpus.select(col("id"), col("vec"))
      .join(Similarity.assignEmbeddings(corpus, centroids)
        .select(col("id"), col("cluster")), "id")
      .persist()
    // quadratic ONLY within a cell: equi-join on cluster, upper triangle
    val lhs = withCell.select(col("cluster"),
      col("id").as("id_a"), col("vec").as("vec_a"))
    val rhs = withCell.select(col("cluster"),
      col("id").as("id_b"), col("vec").as("vec_b"))
    val edges = lhs.join(rhs, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.nativeCosine(spark, col("vec_a"), col("vec_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    // duplicate-pair edges are threshold-sparse (a small fraction of the
    // corpus at the paper's 0.9+ thresholds), so the AUTO entry usually
    // answers with the driver union-find's one collect; past its 262k-edge
    // cap it self-selects the distributed engine, and the probe's partial
    // re-evaluation of the cell join reuses the persisted `withCell`
    val comps = graft.ops.Graph.connectedComponentsAuto(edges) // (id, rep) — rep = component min
    val out = withCell.select(col("id"), col("cluster"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("rep"), col("id")).as("rep_id"))
      .withColumn("keep", col("id") === col("rep_id"))
    graft.util.Caching.materialize(out, withCell)
  }

  /** [[semanticDedup]] with the centroids trained on the corpus itself by
    * the deterministic k-means-lite fit — the self-contained pipeline form.
    */
  def semanticDedupAuto(
      corpus: DataFrame,
      dim: Int,
      k: Int = 8,
      iters: Int = 4,
      threshold: Double = 0.95): DataFrame = {
    val centroids = Similarity.trainCentroids(corpus, dim, nlist = k, iters = iters)
    semanticDedup(corpus, centroids, threshold)
  }

  /** The corpus with semantic duplicates REMOVED — one representative (the
    * component's min id) survives per dup group; all original columns kept.
    */
  def removeSemanticDups(
      corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val keep = semanticDedup(corpus, centroids, threshold)
      .filter(col("keep")).select(col("id"))
    corpus.join(keep, Seq("id"), "left_semi")
  }

  /** CROSS-CORPUS semantic near-dups: every (fresh, reference) pair in the
    * SAME centroid cell with cosine ≥ `threshold` — [[crossSemanticDups]]
    * is to [[semanticDedup]] what [[Dedup.crossNearDups]] is to the
    * verbatim tier: the paraphrase/template half of the inter-dump sweep
    * (a rephrased recrawl shares no shingles with the curated copy but
    * sits next to it in embedding space). Both sides assign through the
    * SAME centroids (model state — train once, reuse across dumps), so a
    * fresh doc is compared exactly against the reference members of its
    * cell: O(|fresh| × cell occupancy), never all-pairs. Cross-cell
    * blindness is [[semanticDedup]]'s documented trade. No transitive
    * closure — cross pairs ARE the output (new_id, ref_id, cos).
    */
  def crossSemanticDups(
      fresh: DataFrame,
      reference: DataFrame,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val prep = crossSemanticPrepare(reference, centroids)
    // materialize BEFORE releasing the prepared cells: the sweep is lazy,
    // and unpersisting first would make the caller's evaluation recompute
    // the cell assignment uncached (correct via lineage, but double work —
    // the Dedup.crossNearDups discipline)
    try graft.util.Caching.materialize(crossSemanticDupsPrepared(fresh, prep, threshold))
    finally prep.release()
  }

  /** Reference-side state for REPEATED cross-semantic sweeps: the
    * reference's cell assignment, persisted PRE-PARTITIONED on the cell id
    * so every sweep's cell join reads it exchange-free (the
    * [[Dedup.crossPrepare]] discipline — only the arriving batch
    * shuffles). Centroids ride along so sweeps can never assign through a
    * different model than the reference did.
    */
  final class PreparedCells private[dedup] (
      val cells: DataFrame, val centroids: Seq[Seq[Double]]) {
    def release(): Unit = { cells.unpersist(blocking = false); () }
  }

  /** Build the [[PreparedCells]] for [[crossSemanticDupsPrepared]]. */
  def crossSemanticPrepare(
      reference: DataFrame,
      centroids: Seq[Seq[Double]]): PreparedCells = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val cells = reference.select(col("id"), col("vec"))
      .join(Similarity.assignEmbeddings(reference, centroids)
        .select(col("id"), col("cluster")), "id")
      .select(col("cluster"), col("id").as("ref_id"), col("vec").as("vec_b"))
      .repartition(col("cluster")).persist()
    // force now: prepare-time cost, not first-sweep surprise. On a forcing
    // failure unpersist before rethrowing — PreparedCells is never
    // constructed on that path, so release() would be unreachable.
    try cells.count()
    catch { case t: Throwable => cells.unpersist(blocking = false); throw t }
    new PreparedCells(cells, centroids)
  }

  /** The reference's cell-assignment rows — (cluster, ref_id, vec_b) —
    * shared by the from-scratch prepare and the incremental append so the
    * two paths can never diverge in shape or assignment semantics.
    */
  private def cellRowsOf(reference: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    reference.select(col("id"), col("vec"))
      .join(Similarity.assignEmbeddings(reference, centroids)
        .select(col("id"), col("cluster")), "id")
      .select(col("cluster"), col("id").as("ref_id"), col("vec").as("vec_b"))

  /** The FROZEN centroid model recorded at `dir/centroids`, cid order. */
  private def centroidsFromTable(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Seq[Double]] =
    graft.catalog.SnapshotTable.read(spark, s"$dir/centroids")
      .select(col("cid"), col("cvec")).collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toIndexedSeq: Seq[Double]).toIndexedSeq

  /** Persist the prepared cells DURABLY — [[Dedup.crossPrepareTable]]'s
    * semantic-tier sibling: the reference's cell assignment lands as a
    * snapshot table at `dir/cells` partitioned `bucket(buckets, cluster)`
    * (the sweep's exact join key, so with v2 bucketing the scan reports
    * KeyGroupedPartitioning and sweeps read the corpus-scale side IN
    * PLACE), and the centroids as a tiny model table at `dir/centroids`
    * (the frozen-DSIR precedent — the model rides with the state, so a
    * loader can never assign through different centroids than the
    * reference did; doubles round-trip parquet bit-exactly). Survives
    * sessions and executor loss; reload with
    * [[crossSemanticPreparedFromTable]].
    */
  def crossSemanticPrepareTable(
      reference: DataFrame,
      centroids: Seq[Seq[Double]],
      dir: String,
      buckets: Int = 32): Unit = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = reference.sparkSession
    import spark.implicits._
    graft.catalog.SnapshotTable.write(spark, cellRowsOf(reference, centroids),
      s"$dir/cells",
      partitionCols = Some(Seq(s"bucket($buckets,cluster)")))
    graft.catalog.SnapshotTable.write(spark,
      centroids.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cid", "cvec"),
      s"$dir/centroids")
    ()
  }

  /** Grow a [[crossSemanticPrepareTable]] reference INCREMENTALLY —
    * [[Dedup.crossPrepareAppend]]'s semantic-tier twin, completing the
    * composed inter-dump pipeline's bookkeeping loop for BOTH tiers:
    * `newlyCurated` docs (id, vec) assign through the FROZEN centroid
    * model recorded at `dir/centroids` (never re-trained — re-fitting
    * would silently move every existing doc's cell) and their cell rows
    * APPEND under the recorded bucket scheme; existing files are
    * untouched, and the next dump's sweep reads the grown reference with
    * no rebuild. One table, one commit — atomic, unlike the verbatim
    * tier's two-table append. Caller contract: ids not already in the
    * reference (the sweep's output guarantees it). With `appId` the
    * append is exactly-once under crash replay
    * ([[graft.catalog.SnapshotTable.appendExactlyOnce]]).
    */
  def crossSemanticPrepareAppend(
      newlyCurated: DataFrame,
      dir: String,
      appId: Option[String] = None,
      batchId: Long = 0L): Unit = {
    val spark = newlyCurated.sparkSession
    val cells = cellRowsOf(newlyCurated, centroidsFromTable(spark, dir))
    appId match {
      case Some(app) =>
        graft.catalog.SnapshotTable.appendExactlyOnce(spark, cells, s"$dir/cells",
          app, batchId)
      case None =>
        graft.catalog.SnapshotTable.append(spark, cells, s"$dir/cells")
    }
    ()
  }

  /** Maintenance for a grown semantic reference: BINPACK-compact the
    * append-fragmented tail of `dir/cells` (files under `smallFileBytes`
    * merge toward `targetBytes`; well-sized files carry by reference). The
    * rewrite re-routes through the table's recorded bucket spec, so the
    * exchange-free KeyGroupedPartitioning sweep geometry is preserved —
    * after many [[crossSemanticPrepareAppend]] generations the scan reads
    * few large files per bucket again instead of one file per append.
    *
    * VACUUM CAUTION: [[crossSemanticPreparedFromTable]] hands out a
    * VERSION-PINNED view; compaction + vacuum can delete files that pinned
    * version still references. Keep vacuum retention at or above the
    * longest open sweep's duration, or reload prepared handles after
    * maintenance ([[Dedup.crossMaintain]]'s contract).
    */
  def crossSemanticMaintain(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      smallFileBytes: Long = 32L * 1024 * 1024): Unit = {
    graft.catalog.SnapshotTable.compact(spark, s"$dir/cells",
      targetBytes = targetBytes, onlyFilesBelow = Some(smallFileBytes))
    ()
  }

  /** [[PreparedCells]] VIEW over [[crossSemanticPrepareTable]]'s tables —
    * nothing recomputed, nothing cache-pinned ([[crossSemanticDupsPrepared]]
    * / [[crossSemanticSink]] compose unchanged; `release()` is a no-op on
    * uncached frames). The cells view is PINNED to the version current at
    * load (`VERSION AS OF` — [[Dedup.crossPreparedFromTable]]'s
    * discipline): every sweep through this handle judges against one named
    * reference generation, reproducibly, regardless of concurrent
    * [[crossSemanticPrepareAppend]] commits; reload to observe growth.
    * Registers the `snap` catalog (namespaced — no planner behavior
    * change); the exchange-free cell join additionally needs the session's
    * v2-bucketing confs, which [[graft.Sessions.local]] sets from session
    * start (a loader must not flip planner confs mid-session).
    */
  def crossSemanticPreparedFromTable(
      spark: org.apache.spark.sql.SparkSession, dir: String): PreparedCells = {
    spark.conf.set("spark.sql.catalog.snap",
      classOf[graft.catalog.SnapshotCatalog].getName)
    val cellVersions = graft.catalog.SnapshotTable.versions(spark, s"$dir/cells")
    require(cellVersions.nonEmpty,
      s"no prepared semantic reference at $dir — build it with crossSemanticPrepareTable")
    val cellsV = cellVersions.max
    new PreparedCells(
      spark.sql(s"SELECT * FROM snap.`$dir/cells` VERSION AS OF $cellsV"),
      centroidsFromTable(spark, dir))
  }

  /** [[crossSemanticDups]] against [[PreparedCells]] — the repeated-sweep
    * form (identical pairs; the reference side just isn't recomputed).
    */
  def crossSemanticDupsPrepared(
      fresh: DataFrame,
      prep: PreparedCells,
      threshold: Double): DataFrame = {
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    val spark = fresh.sparkSession
    val f = fresh.select(col("id"), col("vec"))
      .join(Similarity.assignEmbeddings(fresh, prep.centroids)
        .select(col("id"), col("cluster")), "id")
      .select(col("cluster"), col("id").as("new_id"), col("vec").as("vec_a"))
    f.join(prep.cells, Seq("cluster"))
      .withColumn("cos", Similarity.nativeCosine(spark, col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("new_id"), col("ref_id"), col("cos"))
  }

  /** The filtering form of [[crossSemanticDups]]: `fresh` minus every doc
    * semantically duplicating the reference — compose AFTER the verbatim
    * [[Dedup.removeCrossDups]] in an inter-dump pipeline (verbatim first:
    * it is cheaper and catches the bulk). [[CrossSweep.removeCrossAll]] IS
    * that composition, packaged with the shared-arrivals cache discipline.
    */
  def removeCrossSemanticDups(
      fresh: DataFrame,
      reference: DataFrame,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val flagged = crossSemanticDups(fresh, reference, centroids, threshold)
      .select(col("new_id").as("id")).distinct()
    fresh.join(flagged, Seq("id"), "left_anti")
  }

  /** Ingest-time cross-semantic dedup (`foreachBatch` sink): every
    * micro-batch sweeps against the prepared reference cells and only docs
    * semantically duplicating NOTHING in the reference append to the
    * snapshot table at `outDir` — [[Dedup.crossSink]]'s paraphrase-tier
    * sibling, stateless across batches (arrivals are judged against the
    * fixed reference alone; compose with
    * [[graft.streaming.StreamingSemDeDup]] upstream to also dedup arrivals
    * against each other). All-dup/empty batches publish NO version;
    * exactly-once with `appId` (marker checked before the sweep). Without
    * an appId, at-least-once on replay; first-batch creation is atomic via
    * [[graft.catalog.SnapshotTable.createOrAppend]]
    * ([[Dedup.crossSink]]'s contract note).
    */
  def crossSemanticSink(
      prep: PreparedCells,
      outDir: String,
      threshold: Double,
      appId: Option[String] = None): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val replayed = appId.exists(app => graft.catalog.SnapshotTable
      .lastTxn(spark, outDir, app).exists(_ >= batchId))
    if (!replayed) {
      val flagged = crossSemanticDupsPrepared(batch, prep, threshold)
        .select(col("new_id").as("id")).distinct()
      val clean = batch.join(flagged, Seq("id"), "left_anti").persist()
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
}
