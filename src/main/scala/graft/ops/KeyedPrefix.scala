package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-key ordered RANKS and PREFIX SUMS — the
  * [[Histograms.equiDepth]] range-partition + per-partition-offset
  * discipline, generalized to "within each key, in this total order".
  *
  * Why not `row_number()/sum() OVER (PARTITION BY key ORDER BY ...)`:
  * with a handful of keys (e.g. ~20 crawl sources) and a 100 TB corpus,
  * each key's ENTIRE stream lands on ONE reducer task — the classic
  * window scale-killer Spark's WindowExec warns about. Here instead:
  *
  *  1. range-partition on (key, ord...) and sort within partitions —
  *     partition i then holds a contiguous slice of every key's order,
  *     and a key that dominates the corpus simply spans MANY partitions;
  *  2. the within-partition position comes from
  *     `monotonically_increasing_id` (consecutive per task after the
  *     sort, normalized by the (partition, key) min id — no bit-layout
  *     assumption) for ranks, or a (partition, key)-windowed running sum
  *     for prefix sums — either way bounded by the PARTITION size the
  *     range exchange enforces, never by the key's corpus share;
  *  3. per-(partition, key) offsets come from a metadata-sized aggregate
  *     (≤ partitions × |keys| rows); the cumulative fold over it is a
  *     triangular self-join — deliberately NOT a window — and broadcasts
  *     back. Global rank/sum = offset + local position/sum.
  *
  * The two consumers of the range exchange share one shuffle via
  * ReusedExchange (contents identical by construction, so pid/mid are
  * consistent across both — the equiDepth invariant). `(key, ord...)`
  * must be a total order (unique), or local positions would not be
  * reproducible across the reused exchange's consumers.
  *
  * Scale shape: one range shuffle of the frame, one metadata broadcast;
  * [[prefixSum]] adds one hash exchange on (partition, key) for its
  * local window — a key whose cardinality is partitions × |keys|, so it
  * distributes regardless of key skew. KeyedPrefixSpec plan-guards the
  * consumers (no key-only WindowExec) AND the one-scan reuse contract
  * (the offsets side and the probe side must share the range exchange —
  * if ReusedExchange ever stopped firing, each side would re-sample its
  * own range boundaries and pid/mid would silently disagree).
  */
object KeyedPrefix {

  /** Work columns appended internally — the input frame must not carry
    * them (withColumn would silently replace a caller's column and the
    * offset join would resolve against the wrong attribute). */
  private val Reserved =
    Seq("_pid", "_mid", "_mid0", "_mid1", "_off", "_cnt", "_s", "_local")

  /** NULL keys form their own group (the semantics of the key-partitioned
    * windows these folds replaced): every internal join on `key` is
    * null-safe (`<=>`), so a null-keyed row ranks/sums within the null
    * group instead of silently vanishing through a non-matching equi-join
    * — a null `source` doc must still count against admission and
    * manifest totals. */
  private def nullSafeOn(left: DataFrame, right: DataFrame,
      key: String): Column =
    left("_pid") === right("_pid") && left(key) <=> right(key)

  private def ranged(df: DataFrame, key: String, ord: Seq[String]): DataFrame = {
    require(ord.nonEmpty,
      "KeyedPrefix: `ord` must be non-empty — (key, ord...) has to be a " +
        "total order or per-partition positions are not reproducible")
    val clash = Reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"KeyedPrefix: input frame carries reserved work column(s) " +
        s"${clash.mkString(", ")}")
    val parts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortCols = (key +: ord).map(col)
    df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
  }

  /** Append `out` = the 1-based rank (as a long) of each row within its
    * `key` group under the total order `ord`. */
  def rank(df: DataFrame, key: String, ord: Seq[String],
      out: String): DataFrame = {
    val sorted = ranged(df, key, ord)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
    // The local position `_mid - _mid0` relies on monotonically_increasing_id
    // being CONSECUTIVE within a task — true of current Spark but outside
    // its documented contract ("increasing and unique, not consecutive").
    // Guard the assumption on the metadata-sized counts frame: per
    // (partition, key) the id span must equal the row count, or a Spark
    // upgrade that broke consecutiveness would corrupt ranks SILENTLY.
    val counts = sorted.groupBy(col("_pid"), col(key))
      .agg(count(lit(1)).as("_cnt"), min(col("_mid")).as("_mid0"),
        max(col("_mid")).as("_mid1"))
      .withColumn("_mid0",
        when(col("_mid1") - col("_mid0") + lit(1L) === col("_cnt"),
          col("_mid0"))
          .otherwise(raise_error(lit(
            "KeyedPrefix.rank: monotonically_increasing_id was not " +
              "consecutive within a partition — the local-position " +
              "derivation's implementation assumption no longer holds"))))
      .drop("_mid1")
    val offsets = counts.as("a")
      .join(counts.as("b"),
        col(s"b.$key") <=> col(s"a.$key") && col("b._pid") < col("a._pid"),
        "left")
      .groupBy(col("a._pid"), col(s"a.$key"), col("a._mid0"))
      .agg(coalesce(sum(col("b._cnt")), lit(0L)).as("_off"))
    val off = broadcast(offsets)
    sorted.join(off, nullSafeOn(sorted, off, key))
      .drop(off("_pid")).drop(off(key))
      .withColumn(out, col("_off") + (col("_mid") - col("_mid0")) + 1L)
      .drop("_pid", "_mid", "_mid0", "_off")
  }

  /** Append `out` = the inclusive running sum of `value` within each
    * `key` group under the total order `ord`. The local window is
    * partitioned by (_pid, key) — bounded by the range exchange's
    * partition size, not the key's corpus share. */
  def prefixSum(df: DataFrame, key: String, ord: Seq[String], value: String,
      out: String): DataFrame = {
    val sorted = ranged(df, key, ord).withColumn("_pid", spark_partition_id())
    val sums = sorted.groupBy(col("_pid"), col(key))
      .agg(sum(col(value)).as("_s"))
    val offsets = sums.as("a")
      .join(sums.as("b"),
        col(s"b.$key") <=> col(s"a.$key") && col("b._pid") < col("a._pid"),
        "left")
      .groupBy(col("a._pid"), col(s"a.$key"))
      .agg(coalesce(sum(col("b._s")), lit(0L)).as("_off"))
    val w = Window.partitionBy(col("_pid"), col(key))
      .orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sorted.withColumn("_local", sum(col(value)).over(w))
    val off = broadcast(offsets)
    local.join(off, nullSafeOn(local, off, key))
      .drop(off("_pid")).drop(off(key))
      .withColumn(out, col("_off") + col("_local"))
      .drop("_pid", "_local", "_off")
  }
}
