package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Physical per-key top-k: one bounded retention structure per key.
  *
  * [[RowNumberMode]]: a max-heap of exactly ≤ k rows. [[RankMode]]: the
  * same heap plus a buffer of rows TIED with the current k-th (WITH TIES
  * retention: keep r iff fewer than k rows sort strictly before it — the
  * buffer invalidates whenever a better row displaces the k-th).
  * [[DenseRankMode]]: an ordered map of the k smallest DISTINCT order
  * values, each with all its rows.
  *
  * `partial = true` runs on the un-exchanged input and bounds what the
  * shuffle carries — sound for every mode because each retention rule is
  * monotone: the global threshold (k-th row / k-th distinct value) is
  * never worse than any partition-local one, so local survivors ⊇ global
  * winners. `partial = false` requires `ClusteredDistribution(keys)` —
  * EnsureRequirements inserts the hash exchange — and produces the exact
  * result. Peak memory per task is O(k · distinct keys) for row_number,
  * plus tie multiplicity for the rank modes; nothing is globally sorted.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    mode: TopKMode,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** Per-key retention for one mode; implementations bound memory as the
    * class doc describes.
    */
  private sealed trait Retainer {
    def insert(row: InternalRow): Unit // row is NOT yet copied
    def rows: Iterator[InternalRow]
  }

  private final class RowNumberRetainer(kLocal: Int, rowOrd: Ordering[InternalRow])
      extends Retainer {
    // head of the queue = the WORST retained row under the sort order
    private val heap = mutable.PriorityQueue.empty[InternalRow](rowOrd)
    def insert(row: InternalRow): Unit =
      if (heap.size < kLocal) heap.enqueue(row.copy())
      else if (rowOrd.compare(row, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(row.copy())
      }
    def rows: Iterator[InternalRow] = heap.iterator
  }

  /** WITH TIES: the heap's k rows plus every row equal to the current
    * k-th (heap head) under the order. The tie buffer belongs to ONE
    * order value — when a strictly better row evicts the old k-th and the
    * new head sorts differently, the buffered ties no longer satisfy
    * "fewer than k strictly before" and are dropped wholesale.
    */
  private final class RankRetainer(kLocal: Int, rowOrd: Ordering[InternalRow])
      extends Retainer {
    private val heap = mutable.PriorityQueue.empty[InternalRow](rowOrd)
    private val ties = mutable.ArrayBuffer.empty[InternalRow]
    def insert(row: InternalRow): Unit =
      if (heap.size < kLocal) heap.enqueue(row.copy())
      else {
        val c = rowOrd.compare(row, heap.head)
        if (c == 0) ties += row.copy()
        else if (c < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
          if (ties.nonEmpty && rowOrd.compare(ties(0), heap.head) != 0) ties.clear()
        }
      }
    def rows: Iterator[InternalRow] = heap.iterator ++ ties.iterator
  }

  /** The k smallest DISTINCT order values, each with all its rows. */
  private final class DenseRankRetainer(kLocal: Int, rowOrd: Ordering[InternalRow])
      extends Retainer {
    private val buckets = new java.util.TreeMap[InternalRow, mutable.ArrayBuffer[InternalRow]](
      new java.util.Comparator[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = rowOrd.compare(a, b)
      })
    def insert(row: InternalRow): Unit = {
      val existing = buckets.get(row)
      if (existing != null) { existing += row.copy(); return }
      if (buckets.size < kLocal) {
        val copy = row.copy()
        buckets.put(copy, mutable.ArrayBuffer(copy))
      } else if (rowOrd.compare(row, buckets.lastKey()) < 0) {
        buckets.remove(buckets.lastKey())
        val copy = row.copy()
        buckets.put(copy, mutable.ArrayBuffer(copy))
      }
    }
    def rows: Iterator[InternalRow] = buckets.values().asScala.iterator.flatMap(_.iterator)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val modeLocal = mode
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      def mkRetainer(): Retainer = modeLocal match {
        case RowNumberMode => new RowNumberRetainer(kLocal, rowOrd)
        case RankMode => new RankRetainer(kLocal, rowOrd)
        case DenseRankMode => new DenseRankRetainer(kLocal, rowOrd)
      }
      val retainers = new java.util.HashMap[UnsafeRow, Retainer]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var r = retainers.get(key)
        if (r == null) {
          r = mkRetainer()
          retainers.put(key.copy(), r)
        }
        r.insert(row)
      }
      retainers.values().asScala.iterator.flatMap(_.rows)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
