package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Which rank-like window filter the operator reproduces. */
sealed trait TopKMode
/** `row_number() <= k`: exactly k rows per key (ties broken arbitrarily
  * unless the order is total) — bounded at k rows per (partition, key).
  */
case object RowNumberMode extends TopKMode
/** `rank() <= k`: the first k rows per key PLUS everything tied with the
  * k-th ("WITH TIES") — exact for any tie structure, bounded at k + the
  * k-th value's tie count per (partition, key).
  */
case object RankMode extends TopKMode
/** `dense_rank() <= k`: every row whose order value is among the k
  * smallest DISTINCT values per key — bounded at k distinct values × their
  * tie counts per (partition, key).
  */
case object DenseRankMode extends TopKMode

/** Logical per-key top-k: the first `k` rows per `keys` group under
  * `order` — `ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order) <= k`
  * (or the rank()/dense_rank() forms, see [[TopKMode]]) without the
  * window's cost.
  *
  * Why a custom operator (the one place the engine goes beyond composing
  * built-ins + native expressions): the window formulation SORTS EVERY ROW
  * of every group and shuffles the full input to do it. At 100 TB,
  * "top 3 per key" needs neither — a bounded heap per key retains at most
  * k rows per (partition, key) before the shuffle, so the exchange carries
  * O(k · keys · partitions) rows instead of the table, and nothing is ever
  * fully sorted. The physical plan is the classic partial/final pair (like
  * HashAggregate): partial heaps per input partition, hash-exchange on
  * `keys` (inserted by EnsureRequirements via requiredChildDistribution),
  * final heaps per key.
  *
  * For [[RowNumberMode]], `order` must be a TOTAL order (include a unique
  * tiebreaker) — otherwise which of the tied rows survives is
  * partitioning-dependent. [[RankMode]]/[[DenseRankMode]] are exact under
  * ANY tie structure (ties are part of their semantics), at the cost of a
  * retention bound that grows with the data's tie multiplicity.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    mode: TopKMode = RowNumberMode) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  require(order.nonEmpty, "per-key top-k needs an ordering")

  override def output: Seq[Attribute] = child.output

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-heaps → exchange-on-keys → final-heaps. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, mode) =>
      TopKPerKeyExec(keys, order, k, partial = false, mode = mode,
        child = TopKPerKeyExec(keys, order, k, partial = true, mode = mode,
          child = planLater(child))) :: Nil
    case _ => Nil
  }
}
