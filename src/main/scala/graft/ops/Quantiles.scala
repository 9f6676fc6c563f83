package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT quantiles by distributed rank selection — the scale path Spark's
  * built-in exact `percentile` aggregate does not have: that aggregate
  * buffers a value→count map PER AGGREGATION BUFFER (executor memory
  * proportional to the number of distinct values; a high-cardinality
  * measure at 100 TB OOMs the buffer or spills it to uselessness), and
  * `percentile_approx` trades the exactness away entirely.
  *
  * Histogram bisection instead: the k-th smallest element is found by
  * repeatedly counting an equi-width B-bucket histogram over the current
  * [lo, hi] candidate range (ONE map-side-combined aggregation per pass —
  * a B-row shuffle, nothing value-proportional anywhere), walking the
  * cumulative counts to the bucket containing rank k, and recursing into
  * it. The driver holds B longs; the data is scanned
  * ceil(log_B(domain)) times (integer-cent domains of ~10^7 values at
  * B = 4096 → 2–3 column-pruned passes). Every pass's aggregation is a
  * partial-agg (map-side combine) over a single pruned column — at
  * 100 TB this is bandwidth-bound scanning, the shape that scales, vs.
  * the value-map aggregate that does not. (The classic external
  * selection algorithm — iterated histogram refinement — applied as
  * Spark aggregations.)
  *
  * Rank semantics: `value(q)` = the k-th smallest element (1-based,
  * duplicates counted) with k = ceil(q · n) — i.e. the smallest v whose
  * cumulative count reaches q·n, the discrete quantile ("lower
  * interpolation"); bit-exact against the oracle's
  * `min(v) WHERE row_number ≥ ceil(q·n)`.
  *
  * Works on a LONG-embeddable domain (integers, decimals via fixed-point
  * scaling — the caller passes the embedding column); doubles with full
  * 52-bit mantissas would need order-preserving bit tricks this
  * deliberately omits.
  */
object Quantiles {

  val Buckets = 4096

  /** Exact (q, value) rows for `qs` over the long-valued `value` column
    * of `df`. Null values are excluded (SQL aggregate semantics).
    *
    * ALL quantiles refine in LOCKSTEP: each pass joins the data against
    * one broadcast (qi, lo, hi, width) dim and counts per (qi, bucket) —
    * ONE scan per pass TOTAL, not per quantile (at 100 TB the scan count
    * IS the cost; three quantiles in 3 passes = 4 column-pruned scans
    * including the min/max/count head, vs 10 for a per-q loop). The
    * driver holds |qs|·B counts per pass — bounded metadata, never data
    * (the [[Search]] stats-fold exemption). */
  def exactQuantiles(df: DataFrame, value: Column, qs: Seq[Double],
      buckets: Int = Buckets): Seq[(Double, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val head = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).collect()(0)
    val n = head.getLong(0)
    require(n > 0, "exactQuantiles: empty input")
    qs.foreach(q =>
      require(q > 0.0 && q <= 1.0, s"quantile out of range: $q"))
    // per-quantile state: candidate range [lo, hi] and remaining rank k
    // (invariant: the k-th smallest element within [lo, hi] is q's answer)
    final case class St(lo: Long, hi: Long, k: Long)
    val state = scala.collection.mutable.ArrayBuffer.tabulate(qs.size)(i =>
      St(head.getLong(1), head.getLong(2), math.ceil(qs(i) * n).toLong))
    while (state.exists(s => s.lo < s.hi)) {
      val open = state.zipWithIndex.filter { case (s, _) => s.lo < s.hi }
      val dim = open.map { case (s, i) =>
        (i, s.lo, s.hi, (s.hi - s.lo) / buckets + 1) }.toSeq
        .toDF("qi", "qlo", "qhi", "qw")
      // BroadcastNestedLoopJoin against the ≤|qs|-row dim: one data scan
      // serves every open quantile's histogram
      val hists = vals
        .join(broadcast(dim), col("v") >= col("qlo") && col("v") <= col("qhi"))
        .groupBy(col("qi"),
          ((col("v") - col("qlo")) / col("qw")).cast("int").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
      open.foreach { case (s, i) =>
        val width = (s.hi - s.lo) / buckets + 1
        val hist = hists(i).map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
        var acc = 0L; var found = -1; var before = 0L
        hist.foreach { case (b, c) =>
          if (found < 0) {
            if (acc + c >= s.k) { found = b; before = acc } else acc += c
          }
        }
        require(found >= 0, "exactQuantiles: rank walked past histogram — " +
          "concurrent mutation of the input?")
        val lo = s.lo + found * width
        state(i) = St(lo, math.min(s.hi, lo + width - 1), s.k - before)
      }
    }
    qs.zipWithIndex.map { case (q, i) => (q, state(i).lo) }
  }

  /** Per-GROUP exact quantiles, same lockstep discipline: the state is
    * one (lo, hi, k) per (group, q), the per-pass dim carries every open
    * cell, and the join adds a group-equality conjunct so the histogram
    * aggregation stays ONE scan per pass regardless of group count.
    * Bounded-cardinality groups only (the dim broadcasts; a high-
    * cardinality group column should go through [[exactQuantiles]] per
    * partition of interest instead). Returns (group, q, value) rows. */
  def exactQuantilesBy(df: DataFrame, group: Column, value: Column,
      qs: Seq[Double], buckets: Int = Buckets): Seq[(String, Double, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(group.cast("string").as("g"),
        value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val heads = vals.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
    require(heads.nonEmpty, "exactQuantilesBy: empty input")
    qs.foreach(q =>
      require(q > 0.0 && q <= 1.0, s"quantile out of range: $q"))
    final case class St(lo: Long, hi: Long, k: Long)
    val state = scala.collection.mutable.LinkedHashMap[(String, Int), St]()
    heads.foreach { h =>
      val (g, n) = (h.getString(0), h.getLong(1))
      qs.zipWithIndex.foreach { case (q, i) =>
        state((g, i)) = St(h.getLong(2), h.getLong(3), math.ceil(q * n).toLong)
      }
    }
    while (state.values.exists(s => s.lo < s.hi)) {
      val open = state.toSeq.filter { case (_, s) => s.lo < s.hi }
      val dim = open.map { case ((g, i), s) =>
        (g, i, s.lo, s.hi, (s.hi - s.lo) / buckets + 1) }
        .toDF("qg", "qi", "qlo", "qhi", "qw")
      val hists = vals
        .join(broadcast(dim), col("g") === col("qg") &&
          col("v") >= col("qlo") && col("v") <= col("qhi"))
        .groupBy(col("qg"), col("qi"),
          ((col("v") - col("qlo")) / col("qw")).cast("int").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(r => (r.getString(0), r.getInt(1)))
      open.foreach { case (key @ (_, _), s) =>
        val width = (s.hi - s.lo) / buckets + 1
        val hist = hists(key).map(r => (r.getInt(2), r.getLong(3))).sortBy(_._1)
        var acc = 0L; var found = -1; var before = 0L
        hist.foreach { case (b, c) =>
          if (found < 0) {
            if (acc + c >= s.k) { found = b; before = acc } else acc += c
          }
        }
        require(found >= 0, "exactQuantilesBy: rank walked past histogram")
        val lo = s.lo + found * width
        state(key) = St(lo, math.min(s.hi, lo + width - 1), s.k - before)
      }
    }
    state.toSeq.map { case ((g, i), s) => (g, qs(i), s.lo) }
      .sortBy { case (g, q, _) => (g, q) }
  }

  /** The fixture quantile set the oracle exercises. */
  val Qs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** `lineitem.l_extendedprice` exact p50/p90/p99 — DECIMAL(12,2)
    * embedded as integer cents, reported back in price units. Output:
    * (q, value), both DOUBLE (value is exact at 2 decimals). */
  def priceQuantiles(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    exactQuantiles(lineitem, col("l_extendedprice") * 100, Qs)
      .map { case (q, cents) => (q, cents / 100.0) }
      .toDF("q", "value")
  }

  /** Per-returnflag exact price quantiles. Output:
    * (l_returnflag, q, value), (flag, q)-ordered. */
  def priceQuantilesByFlag(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    exactQuantilesBy(lineitem, col("l_returnflag"),
        col("l_extendedprice") * 100, Qs)
      .map { case (g, q, cents) => (g, q, cents / 100.0) }
      .toDF("l_returnflag", "q", "value")
  }
}
