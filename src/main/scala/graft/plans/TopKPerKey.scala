package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical top-k-per-key: keep the k best rows (by `ordering`) for every
  * distinct value of `keys`.
  *
  * Why a custom operator (SURVEY.md §7.3 ladder, rung (c)): demonstrates
  * the full logical-node → strategy → physical-operator machinery with a
  * partial/final split — bounded heaps per key map-side, so the exchange
  * carries at most k rows per key per input partition, then a final heap
  * pass. Note Spark 4's WindowGroupLimit also limits rank windows
  * map-side; the remaining difference here is selection by insertion into
  * k-bounded buffers with NO sort operator on either side of the exchange
  * (WindowGroupLimit still plans local + global sorts), plus no rank
  * column materialization.
  */
case class TopKPerKey(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Shared heap logic for both phases. */
private[plans] object TopKHeaps {
  def topKPerPartition(
      iter: Iterator[InternalRow],
      keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
      output: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val rowOrd = GenerateOrdering.generate(ordering, output)
    // per key: rows sorted best-first, at most k (insertion sort is fine —
    // k is small by contract)
    val heaps = new java.util.HashMap[InternalRow, java.util.ArrayList[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row).copy()
      var buf = heaps.get(key)
      if (buf == null) {
        // initial capacity is a HINT, not the bound (the bound is the
        // `buf.size() > k` trim below) — clamp it so k = Int.MaxValue
        // ("unbounded") doesn't wrap k + 1 to a negative capacity
        buf = new java.util.ArrayList[InternalRow](math.min(k.toLong + 1, 64L).toInt)
        heaps.put(key, buf)
      }
      // skip fast if worse than current k-th
      if (buf.size() < k || rowOrd.compare(row, buf.get(buf.size() - 1)) < 0) {
        val copy = row.copy()
        var pos = buf.size()
        while (pos > 0 && rowOrd.compare(copy, buf.get(pos - 1)) < 0) pos -= 1
        buf.add(pos, copy)
        if (buf.size() > k) buf.remove(buf.size() - 1)
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap(_.asScala)
  }
}

case class TopKPerKeyPartialExec(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKHeaps.topKPerPartition(_, keys, ordering, k, child.output))
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class TopKPerKeyFinalExec(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // EnsureRequirements inserts the hash exchange on the keys for us.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  // Report the child's hash distribution so a downstream operator needing
  // the same keys (e.g. the rank window over the cut sliver) reuses the
  // exchange instead of planning a second, redundant shuffle.
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKHeaps.topKPerPartition(_, keys, ordering, k, child.output))
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
