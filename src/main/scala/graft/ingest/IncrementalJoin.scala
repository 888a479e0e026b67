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
  * The plain [[joinDelta]]/[[foldView]] pair is append-only; RETRACTIONS
  * ride the signed variants ([[signedJoinDelta]]/[[foldSignedView]]): rows
  * carry a multiplicity column (+n insert, −n retract), joined
  * multiplicities MULTIPLY (the Z-relation algebra every retraction-capable
  * IVM engine — DBSP, Differential Dataflow, Materialize — is built on),
  * and [[consolidate]] sums multiplicities per tuple and drops net-zero
  * rows. Out-of-order deliveries (a retraction folding in before its
  * insert) net to the same final view — the algebra is commutative.
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

  // ------------------------------------------------- signed (retractions)

  /** Sum multiplicities per tuple and drop net-zero rows — the Z-relation
    * normal form. O(|distinct tuples|) hash aggregation; run it after each
    * fold round so state size tracks the LIVE data, not the delivery
    * history.
    */
  def consolidate(df: DataFrame, multCol: String = "mult"): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.filterNot(_ == multCol)
    df.groupBy(cols.map(c => col(s"`$c`")): _*)
      .agg(sum(col(multCol)).as(multCol))
      .filter(col(multCol) =!= 0L)
  }

  /** [[joinDelta]] in the signed algebra: every side carries `multCol`, and
    * a joined row's multiplicity is the PRODUCT of its inputs' — which is
    * what makes a retraction (−1) cancel exactly the view rows its insert
    * (+1) produced, pair by pair.
    */
  def signedJoinDelta(
      aPrior: DataFrame, bPrior: DataFrame,
      dA: DataFrame, dB: DataFrame,
      keys: Seq[String],
      multCol: String = "mult"): DataFrame = {
    import org.apache.spark.sql.functions._
    def term(l: DataFrame, r: DataFrame): DataFrame =
      l.withColumnRenamed(multCol, "__ml")
        .join(r.withColumnRenamed(multCol, "__mr"), keys)
        .withColumn(multCol, col("__ml") * col("__mr"))
        .drop("__ml", "__mr")
    term(dA, bPrior).unionByName(term(aPrior, dB)).unionByName(term(dA, dB))
  }

  /** Fold signed per-load delta pairs into the full view. Sides and view
    * are consolidated every round, so each round's join state is the live
    * data only; the result equals the one-shot join of the net-live sides
    * with per-pair multiplicity products (the spec's fuzz contract).
    * Returns (view, finalA, finalB), all consolidated.
    */
  def foldSignedView(
      loads: Seq[(DataFrame, DataFrame)],
      keys: Seq[String],
      multCol: String = "mult"): (DataFrame, DataFrame, DataFrame) = {
    require(loads.nonEmpty, "foldSignedView needs at least one load")
    val (dA0, dB0) = loads.head
    var view = consolidate(
      signedJoinDelta(dA0.limit(0), dB0.limit(0), dA0, dB0, keys, multCol), multCol)
    var a = consolidate(dA0, multCol)
    var b = consolidate(dB0, multCol)
    loads.tail.foreach { case (dA, dB) =>
      view = consolidate(
        view.unionByName(signedJoinDelta(a, b, dA, dB, keys, multCol)), multCol)
      a = consolidate(a.unionByName(dA), multCol)
      b = consolidate(b.unionByName(dB), multCol)
    }
    (view, a, b)
  }
}
