package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise vector sum with a row count — the one-pass,
  * map-side-partial aggregation that centroid computation needs (the
  * building block of IVF/k-means training over an embedding corpus).
  *
  * vs. posexplode + groupBy(group, dim): that shape shuffles dims× the
  * row count; this buffer carries ONE (count, sums[dims]) pair per group
  * per partition, so the exchange moves |groups|·|partitions| buffers
  * regardless of corpus size — the difference between shuffling 64·N
  * rows and shuffling P·G fixed-size arrays at 100 TB. (The spec proves
  * the two shapes agree exactly.)
  *
  * Inputs are pre-quantized to Long (see [[graft.ops.Centroids]]):
  * integer sums are exact and order-independent, where float addition
  * would make the centroid depend on partition layout.
  */
object VecSumAggregator
    extends Aggregator[Array[Long], (Long, Array[Long]), (Long, Array[Long])] {

  override def zero: (Long, Array[Long]) = (0L, Array.emptyLongArray)

  private def add(acc: Array[Long], v: Array[Long]): Array[Long] =
    if (acc.isEmpty) v.clone()
    else {
      require(acc.length == v.length,
        s"ragged embedding: ${acc.length} vs ${v.length}")
      var i = 0
      while (i < acc.length) { acc(i) += v(i); i += 1 }
      acc
    }

  override def reduce(b: (Long, Array[Long]), a: Array[Long]): (Long, Array[Long]) =
    (b._1 + 1, add(b._2, a))

  override def merge(a: (Long, Array[Long]), b: (Long, Array[Long])): (Long, Array[Long]) =
    if (a._1 == 0) b else if (b._1 == 0) a else (a._1 + b._1, add(a._2, b._2))

  override def finish(r: (Long, Array[Long])): (Long, Array[Long]) = r

  override def bufferEncoder: Encoder[(Long, Array[Long])] =
    ExpressionEncoder[(Long, Array[Long])]()
  override def outputEncoder: Encoder[(Long, Array[Long])] = bufferEncoder
}
