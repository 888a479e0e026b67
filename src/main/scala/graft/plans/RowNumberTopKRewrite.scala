package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: plan `ROW_NUMBER()/RANK()/DENSE_RANK() OVER
  * (PARTITION BY k ORDER BY o) <= n` filters as the bounded-heap
  * [[TopKPerKey]] operator (row_number → exact-k retention, rank →
  * WITH-TIES, dense_rank → k-distinct-values — see [[TopKMode]]).
  *
  * Users write the window formulation because it is the idiomatic SQL — but
  * the window plan sorts EVERY row of every group and shuffles the full
  * input. When the rank column itself is immediately discarded (the usual
  * "top n per key, keep the data columns" query), the two are semantically
  * identical and the heap operator's exchange carries ≤ n(+ties) rows per
  * (partition, key). This rule makes the custom operator reachable from
  * plain window syntax instead of only through the `ops.TopK` API.
  *
  * Fires only when provably safe:
  * - single rank-like window expression with the standard running frame;
  * - the filter condition is exactly `rn <= lit` / `rn < lit` / `rn = 1`
  *   (any extra conjunct leaves the plan alone);
  * - the projection above drops the rank column (output references only
  *   the window child's columns), so nothing downstream can observe it.
  *
  * Tie behavior: the rank/dense_rank rewrites are exact under ANY tie
  * structure (ties are part of those functions' semantics); row_number
  * matches only under a total per-key order — the same caveat
  * [[TopKPerKey]] itself documents.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private def limit(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k)
    // `rn < k` ⇒ limit k−1; guard the subtraction — k = Int.MinValue would
    // wrap to Int.MaxValue and turn an always-false filter into top-MaxValue
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn && k > Int.MinValue => Some(k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn && k > Int.MinValue => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn && k == 1 => Some(1)
    case EqualTo(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn && k == 1 => Some(1)
    case _ => None
  }

  /** Spark's own InferWindowGroupLimit (3.5+) will already have inserted a
    * sort-based WindowGroupLimit below the window for this filter shape —
    * strip it too, or the plan pays BOTH the group-limit sorts and the
    * heaps. The heap operator subsumes it: same ≤ k rows per (partition,
    * key) bound on the exchange, with no Sort node on either side.
    */
  private def unwrapGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  /** The rank-like function and its standard frame → operator mode.
    * row_number runs over ROWS UNBOUNDED PRECEDING..CURRENT ROW; rank and
    * dense_rank over RANGE. rank() ≤ k is rewritten to the WITH-TIES
    * retention and dense_rank() ≤ k to the k-distinct-values retention —
    * both EXACT under any tie structure (no totality proof needed; ties
    * are part of those functions' semantics, unlike row_number where a
    * non-total order makes the window itself nondeterministic).
    */
  private def modeOf(fn: Expression, frame: SpecifiedWindowFrame): Option[TopKMode] =
    (fn, frame) match {
      // all three rank-likes carry the standard running frame
      // (ROWS/RANGE UNBOUNDED PRECEDING .. CURRENT ROW — Spark's RankLike
      // uses RowFrame); their values don't depend on the frame, so either
      // spelling is the same function
      case (_: RowNumber, SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow)) =>
        Some(RowNumberMode)
      case (_: Rank, SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow)) =>
        Some(RankMode)
      case (_: DenseRank, SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow)) =>
        Some(DenseRankMode)
      case _ => None
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(plist, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(fn,
          WindowSpecDefinition(parts, order, frame: SpecifiedWindowFrame)), _)),
          _, _, child, _)))
        if parts.nonEmpty && order.nonEmpty &&
          modeOf(fn, frame).isDefined &&
          limit(cond, al.exprId).exists(_ >= 1) &&
          plist.forall(_.references.subsetOf(child.outputSet)) =>
      Project(plist,
        TopKPerKey(parts, order, limit(cond, al.exprId).get, unwrapGroupLimit(child),
          modeOf(fn, frame).get))
  }
}
