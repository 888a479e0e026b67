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
}
