package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: plan `ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) <= n`
  * filters as the bounded-heap [[TopKPerKey]] operator.
  *
  * Users write the window formulation because it is the idiomatic SQL — but
  * the window plan sorts EVERY row of every group and shuffles the full
  * input. When the rank column itself is immediately discarded (the usual
  * "top n per key, keep the data columns" query), the two are semantically
  * identical and the heap operator's exchange carries ≤ n rows per
  * (partition, key). This rule makes the custom operator reachable from
  * plain window syntax instead of only through the `ops.TopK` API.
  *
  * Fires only when provably safe:
  * - single row_number window expression with the standard frame;
  * - the filter condition is exactly `rn <= lit` / `rn < lit` / `rn = 1`
  *   (any extra conjunct leaves the plan alone);
  * - the projection above drops the rank column (output references only
  *   the window child's columns), so nothing downstream can observe it.
  *
  * Tie behavior matches row_number only under a total per-key order — the
  * same caveat [[TopKPerKey]] itself documents.
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

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(plist, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(parts, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)))
        if parts.nonEmpty && order.nonEmpty &&
          limit(cond, al.exprId).exists(_ >= 1) &&
          plist.forall(_.references.subsetOf(child.outputSet)) =>
      Project(plist,
        TopKPerKey(parts, order, limit(cond, al.exprId).get, unwrapGroupLimit(child)))
  }
}
