package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampType}

/** ANALYZE-style table profiling: one pass, one output row per column —
  * row count, null count, exact distinct, min/max (and mean for
  * numerics). The stats a cost-based planner (or a pipeline health
  * check) wants, produced the way a 100 TB table can afford: ALL columns
  * profile in ONE scan. count/null/min/max/mean reduce map-side to one
  * partial row per partition; the EXACT distincts are the expensive part
  * (Catalyst plans the multi-distinct via Expand — the shuffle carries
  * each column's distinct value set, unavoidable for exactness). At
  * 100 TB you swap `countDistinct` for `approx_count_distinct` — same
  * one-pass shape, sketch buffers instead of value sets; the sketch
  * error bound is already spec'd in ScalePathSpec's a5 test.
  *
  * min/max/mean are serialized to strings so heterogeneous column types
  * share one schema (the profile of a profile table is strings anyway).
  * Means sum in decimal — exact, order-free — then divide once as
  * doubles rounded to 4dp; a plain double `avg` would tie the result to
  * partition order (same rationale as [[Centroids]]).
  */
object Profile {

  /** Per-column stats for the given columns of `df`, long form:
    * (column, n_rows, n_nulls, n_distinct, min, max, mean). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val schema = df.schema
    val aggs: Seq[Column] = columns.flatMap { c =>
      val col_ = col(c)
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(when(col_.isNull, 1).otherwise(0)).as(s"${c}__nulls"),
        countDistinct(col_).as(s"${c}__distinct"),
        min(col_).cast("string").as(s"${c}__min"),
        max(col_).cast("string").as(s"${c}__max")) :+
        (if (isNum)
          round(sum(col_.cast("decimal(27,4)")).cast("double") / count(col_), 4)
            .cast("string")
         else lit(null).cast("string")).as(s"${c}__mean")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // long form via stack: |columns| literal rows from the single agg row
    val stackArgs = columns.map(c =>
      s"'$c', `${c}__rows`, `${c}__nulls`, `${c}__distinct`, " +
        s"`${c}__min`, `${c}__max`, `${c}__mean`").mkString(", ")
    one.select(expr(
      s"stack(${columns.size}, $stackArgs) AS " +
        "(column, n_rows, n_nulls, n_distinct, min, max, mean)"))
      .orderBy(col("column"))
  }

  /** The orders-table profile the driver oracle checks. */
  def ordersProfile(orders: DataFrame): DataFrame =
    profile(orders, Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority"))
}
