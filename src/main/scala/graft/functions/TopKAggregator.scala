package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: single-pass bounded top-k by score (descending, id-ascending
  * tiebreak) — the efficient aggregation form of "top-k per group" for
  * similarity search (SURVEY.md §2.9 extension surface).
  *
  * vs. a rank window: a window sorts/shuffles EVERY row of the group; this
  * aggregator carries at most k elements per partial buffer, so map-side
  * partial aggregation reduces the shuffle to k rows per group per
  * partition — the difference between shuffling N and shuffling k·P at
  * 100 TB.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  // ordering: higher score first; lower id first on ties (deterministic)
  private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(buf: Seq[(Long, Double)]): Seq[(Long, Double)] =
    buf.sortWith(lt).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], row: (Long, Double)): Seq[(Long, Double)] =
    trim(buf :+ row)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
