package graft.ingest

import org.apache.spark.sql.DataFrame

/** Incrementally-maintained JOIN view — the second half of the
  * materialized-view story next to [[IncrementalRollup]]'s aggregates: for
  * an append-only equi-join view `M = A ⋈ B`, a new load (ΔA, ΔB) changes
  * the view by exactly
  *
  *   ΔM = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * (A, B = the sides BEFORE the load). Folding ΔM into M costs
  * O(Δ × matched), independent of |A ⋈ B| — the reason warehouse IVM
  * engines never re-join the full tables per load.
  *
  * Append-only by design, like the rollup: retractions would need the
  * full delta algebra (signed multiplicities) — the keyed-MERGE path
  * ([[graft.catalog.SnapshotTable.merge]]) is this library's answer for
  * updating facts.
  *
  * At 100 TB: each term shuffles one delta against one (pre-partitioned or
  * bucketed) base side on the join keys; the base sides are never joined
  * against each other again. Broadcast the delta side when it is small —
  * Spark's planner does exactly that under AQE since the deltas are tiny
  * relative to the bases.
  */
object IncrementalJoin {

  /** The view delta for one load. `aPrior`/`bPrior` are the sides BEFORE
    * this load's deltas are appended; either may be empty (first load).
    * Inner equi-join on `keys`; column layout = Spark's `join(…, keys)`
    * (join keys first, then A's payload, then B's payload).
    */
  def joinDelta(
      aPrior: DataFrame, bPrior: DataFrame,
      dA: DataFrame, dB: DataFrame,
      keys: Seq[String]): DataFrame =
    dA.join(bPrior, keys)
      .unionByName(aPrior.join(dB, keys))
      .unionByName(dA.join(dB, keys))

  /** Fold a sequence of per-load delta pairs into the full view — the
    * replay a catch-up consumer runs, and the correctness contract the spec
    * and oracle check: the folded view must equal the one-shot join of the
    * full sides. Returns (view, finalA, finalB).
    */
  def foldView(
      loads: Seq[(DataFrame, DataFrame)],
      keys: Seq[String]): (DataFrame, DataFrame, DataFrame) = {
    require(loads.nonEmpty, "foldView needs at least one load")
    val (dA0, dB0) = loads.head
    var view = joinDelta(dA0.limit(0), dB0.limit(0), dA0, dB0, keys)
    var a = dA0
    var b = dB0
    loads.tail.foreach { case (dA, dB) =>
      view = view.unionByName(joinDelta(a, b, dA, dB, keys))
      a = a.unionByName(dA)
      b = b.unionByName(dB)
    }
    (view, a, b)
  }
}
