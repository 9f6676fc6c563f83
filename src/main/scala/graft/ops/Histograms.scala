package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution profiling: equi-width and equi-depth histograms — the
  * column statistics behind skew diagnosis and range layout (the same
  * boundaries [[graft.sources.Layout]] uses approximately, computed here
  * exactly because the oracle compares bit-for-bit).
  */
object Histograms {

  /** Equi-width histogram: global [min,max] edges as a 1-row broadcast,
    * bucket index per-row in the scan, one small groupBy.
    *
    * Degenerate-range guard: when every value is equal (`hi == lo`) the
    * bucket-width expression divides by zero — IEEE gives NaN and engines
    * disagree on `floor(NaN)`/`least(NaN, k)` semantics, so the zero-width
    * case is pinned to bucket 0 explicitly (and identically in the oracle
    * SQL, so the hash still matches).
    */
  def equiWidth(df: DataFrame, value: Column, buckets: Int = 10): DataFrame = {
    val v = df.select(value.as("v"))
    val edges = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    v.crossJoin(broadcast(edges))
      .select(
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / buckets)), lit(buckets - 1)))
          .cast("int").as("bucket"),
        col("lo"), col("hi"))
      .groupBy(col("bucket"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        round(col("lo") + col("bucket") * (col("hi") - col("lo")) / buckets, 4)
          .as("lo_edge"),
        round(col("lo") + (col("bucket") + 1) * (col("hi") - col("lo")) / buckets, 4)
          .as("hi_edge"),
        col("n"))
      .orderBy(col("bucket"))
  }

  /** Equi-depth histogram with EXACT `ntile` semantics, computed
    * distributed: a global `ntile(n) OVER (ORDER BY ...)` moves the whole
    * table into ONE task (Spark's WindowExec warns about exactly this), so
    * instead the global rank is assembled from a range-partitioned sort
    * plus per-partition offsets:
    *
    *  1. range-partition on (value, tiebreak) and sort within partitions —
    *     partition i then holds a contiguous slice of the global order;
    *  2. per-partition local index from `monotonically_increasing_id`
    *     (consecutive per task after the sort; normalized by the
    *     partition's min id, so no bit-layout assumption) — global rank =
    *     partition offset + local index;
    *  3. offsets and the total count come from a partition-count aggregate
    *     (≤ `spark.sql.shuffle.partitions` rows). The cumulative sum over
    *     that metadata-sized table is a triangular self-join, deliberately
    *     NOT a window, so the final plan carries no WindowExec at all
    *     (PlanGuardSpec asserts this); its BroadcastNestedLoopJoin is over
    *     ≤ P×P partition-count rows, never data;
    *  4. the bucket of 1-based rank r follows ntile's floor-division split
    *     (first `total % n` buckets get one extra row), all in integer
    *     `DIV` arithmetic so it is bit-identical to the oracle's ntile;
    *  5. per-bucket (min, max, count) is an ordinary distributed agg.
    *
    * The two consumers of the range exchange (the ranked rows and the
    * partition counts) share one shuffle via ReusedExchange — contents
    * identical by construction, so pid/mid are consistent across both.
    * Scale shape: one range shuffle of (value, tiebreak), one broadcast of
    * P offset rows, one bucket agg — no single-task stage anywhere.
    *
    * `tiebreak` must make (value, tiebreak) unique: the within-partition
    * sort must be a total order or local indices would not be reproducible
    * across the reused exchange's consumers.
    */
  def equiDepth(df: DataFrame, value: Column, tiebreak: Column,
      buckets: Int = 10): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.select(value.as("v"), tiebreak.as("tb"))
      .repartitionByRange(parts, col("v"), col("tb"))
      .sortWithinPartitions(col("v"), col("tb"))
      .select(col("v"), spark_partition_id().as("pid"),
        monotonically_increasing_id().as("mid"))
    val counts = sorted.groupBy(col("pid"))
      .agg(count(lit(1)).as("cnt"), min(col("mid")).as("mid0"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid"), col("a.mid0"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
    val totals = counts.agg(sum(col("cnt")).as("total"))
    sorted.join(broadcast(offsets), "pid")
      .crossJoin(broadcast(totals))
      // 0-based global rank; then ntile's split: base = total DIV n rows
      // per bucket, the first rem = total % n buckets take one extra.
      // greatest(base, 1) keeps the dead ELSE branch well-defined when
      // total < buckets (base = 0 — every row lands in the THEN branch).
      .withColumn("r0", col("off") + (col("mid") - col("mid0")))
      .withColumn("bucket", expr(
        s"CAST(CASE WHEN r0 < (total % $buckets) * (total DIV $buckets + 1) " +
        s"THEN r0 DIV (total DIV $buckets + 1) + 1 " +
        s"ELSE (r0 - (total % $buckets) * (total DIV $buckets + 1)) " +
        s"DIV greatest(total DIV $buckets, 1) + total % $buckets + 1 END AS INT)"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Per-group 3σ outlier counts with ENGINE-PORTABLE moment arithmetic:
    * values quantize to integer cents, so the two sums (Σv, Σv²) are
    * exact longs; mean/variance derive from them with one identically-
    * spelled IEEE expression per engine — no accumulation-order drift,
    * which is what makes a floating-point z-score hash-matchable in the
    * DuckDB oracle. Two passes by construction (the threshold needs the
    * moments); the cents projection is cached across them and the
    * |groups|-row stats side broadcasts. At 100 TB the long Σv² bound
    * (2^63) caps group size around 10^9 rows at this value range —
    * beyond that, the same shape with DECIMAL(38) sums. */
  def outliers(events: DataFrame): DataFrame = {
    val cents = graft.CacheScope.track(
      events.select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc")))
    val stats = cents.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(col("vc")).as("s1"),
        sum(col("vc") * col("vc")).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean_c"),
        // single-row groups have no sample variance: report 0, not the
        // 0/0 NaN the unguarded formula produces
        when(col("n") <= 1, lit(0.0)).otherwise(
          sqrt((col("n").cast("double") * col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
            (col("n").cast("double") * (col("n") - 1).cast("double"))))
          .as("std_c"))
    cents.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"), col("n"), col("mean_c"), col("std_c"))
      .agg(sum(when(abs(col("vc").cast("double") - col("mean_c")) >
          lit(3.0) * col("std_c"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("mean_c") / 100.0, 4).as("mean_value"),
        round(col("std_c") / 100.0, 4).as("std_value"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }
}
