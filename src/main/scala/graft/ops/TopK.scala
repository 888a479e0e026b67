package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

import graft.plans.TopKPerKey

/** Per-key top-k via the custom [[graft.plans.TopKPerKey]] operator —
  * `ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order) <= k` semantics
  * with bounded-heap execution (see the logical node's docs for why the
  * window formulation is the wrong plan at scale).
  */
object TopK {

  /** @param order (column, ascending) pairs; MUST total-order rows within a
    *              key (append a unique tiebreaker) for deterministic output
    */
  def topKPerKey(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(keys.nonEmpty, "per-key top-k needs at least one key column")
    graft.extensions.GraftExtensions.register(df.sparkSession)
    val plan = df.queryExecution.analyzed
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column '$n' not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrder = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(attr), sortOrder, k, plan))
  }
}
