package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles at scale.
  *
  * Spark's `percentile()` (like any collect-based exact quantile) buffers
  * every value of a group in executor memory — fine as a verification
  * harness, a scale-killer on a 100 TB column. This operator computes the
  * same type-7 (linear-interpolation) quantiles relationally: one sort per
  * group (window `row_number`), then ONLY the two bracketing rows per
  * (group, prob) survive into the final aggregate. Peak state per group is
  * O(probs), not O(rows).
  */
object Quantiles {

  /** One row per group with a column per requested quantile.
    *
    * Interpolation matches Spark's `percentile()`:
    * `v_lo · (ceil(h) − h) + v_hi · (h − floor(h))` at rank `h = (n−1)·p`,
    * collapsing to the exact element when `h` is integral.
    *
    * @param probs    quantile probabilities in [0, 1]
    * @param outNames output column name per prob (same length)
    */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      by: Seq[String],
      probs: Seq[Double],
      outNames: Seq[String]): DataFrame = {
    require(probs.nonEmpty && probs.length == outNames.length,
      "probs and outNames must be non-empty and the same length")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs must be in [0,1]: $probs")
    val keys = by.map(col)
    val sortW = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val cntW = Window.partitionBy(keys: _*)
    // rank h of prob p in THIS row's group; every row knows its group size.
    // NULL values are excluded BEFORE ranking — percentile() ignores them,
    // and an unfiltered NULL would both inflate the group size and sort
    // first under the ascending window.
    val ranked = df
      .select((keys :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(sortW))
      .withColumn("__n", count(lit(1)).over(cntW))
    def h(p: Double) = (col("__n") - 1) * p
    // keep only rows that bracket some requested quantile — the aggregate
    // below never sees the rest
    val bracketing = probs
      .map(p => col("__rn") - 1 === floor(h(p)) || col("__rn") - 1 === ceil(h(p)))
      .reduce(_ || _)
    val aggs = probs.zip(outNames).flatMap { case (p, nm) =>
      Seq(
        min(when(col("__rn") - 1 === floor(h(p)), col("__v"))).as(s"__lo_$nm"),
        min(when(col("__rn") - 1 === ceil(h(p)), col("__v"))).as(s"__hi_$nm"))
    } :+ min(col("__n")).as("__n")
    val agged = ranked.filter(bracketing).groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val outCols = probs.zip(outNames).map { case (p, nm) =>
      val hh = (col("__n") - 1) * p
      when(floor(hh) === ceil(hh), col(s"__lo_$nm"))
        .otherwise(col(s"__lo_$nm") * (ceil(hh) - hh) + col(s"__hi_$nm") * (hh - floor(hh)))
        .as(nm)
    }
    agged.select((keys ++ outCols): _*)
  }
}
