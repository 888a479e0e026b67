package graft.util

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle discipline for operators that persist shared intermediate
  * frames (signatures, term vectors, training corpora). A library call must
  * not leak pinned blocks into the caller's long-lived session: at 100 TB an
  * unreleased cache is an eviction storm for every query that follows.
  */
object Caching {

  /** Eagerly materialize the (small, output-linear) `result`, then release
    * every intermediate cache.
    *
    * `localCheckpoint` truncates the lineage to the materialized RDD, so the
    * released intermediates can never be silently recomputed by a downstream
    * action — unpersisting a lazily-returned plan instead would just move
    * the recompute to the caller's first action. The checkpointed blocks
    * themselves are reclaimed by the ContextCleaner once the returned frame
    * is unreferenced. On a real cluster (where executor loss would kill
    * local checkpoint blocks), swap in reliable `checkpoint()` or a table
    * write — same contract.
    */
  def materialize(result: DataFrame, cached: DataFrame*): DataFrame =
    try result.localCheckpoint(eager = true)
    finally cached.foreach(_.unpersist(blocking = false))

  /** localCheckpoint a frame AND capture the ids of the RDD blocks it
    * pinned, so an iterative operator can release a superseded round's
    * blocks explicitly. `Dataset.unpersist` can NOT do this — the pinned
    * RDD is internal to the Dataset, so unpersist on the frame is a no-op
    * and every round would leak one checkpointed copy. The id capture
    * diffs the context's persistent-RDD registry around the checkpoint;
    * concurrent jobs persisting RDDs in the window would be captured too,
    * so keep the call inside one logical owner (every current caller is a
    * driver-side training/propagation loop).
    */
  def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    (out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  /** Release blocks captured by [[checkpointTracked]] once no frame reads
    * them anymore.
    */
  def releaseTracked(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
