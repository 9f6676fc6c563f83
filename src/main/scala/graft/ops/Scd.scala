package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) build: turn an event/fact
  * history into effective-dated dimension versions — the snapshotting
  * step every long-lived pipeline needs for point-in-time-correct joins
  * (training-data cutoffs included: "what was this entity's attribute
  * when the example was created" is an as-of join against exactly this
  * table, see [[AsOfJoin]]).
  *
  * Built here from `orders`: each order is treated as an observation of
  * its customer's priority attribute; the output is one row per
  * (customer, attribute run) with [valid_from, valid_to) ranges.
  *
  * Shape at 100 TB: everything is windowed over `o_custkey` — a
  * high-cardinality key, so the single shuffle spreads evenly (no
  * window-over-constant skew funnel). Three window passes share one
  * partitioning: Catalyst plans a single Exchange and three Window
  * operators on the same sort — `.explain` shows no re-shuffle between
  * them. Dedup-within-day picks the max-orderkey observation, so late
  * replays of the same day converge (deterministic, not arrival-order).
  */
object Scd {

  /** Effective-dated customer-priority versions:
    * (o_custkey, version, valid_from, valid_to, priority, is_current)
    * with consecutive identical values run-length-merged. */
  def customerPriorityScd2(orders: DataFrame): DataFrame = {
    val perDay = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(desc("o_orderkey"))
    val daily = orders
      .withColumn("rn", row_number().over(perDay))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderdate").as("valid_from"),
        col("o_orderpriority").as("priority"))
    val byCust = Window.partitionBy(col("o_custkey")).orderBy(col("valid_from"))
    // keep only run starts (value differs from the previous observation) …
    val runStarts = daily
      .withColumn("prev", lag(col("priority"), 1).over(byCust))
      .filter(col("prev").isNull || col("prev") =!= col("priority"))
    // … then close each version with the next run's start date.
    runStarts
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byCust))
      .withColumn("version", row_number().over(byCust).cast("bigint"))
      .select(col("o_custkey"), col("version"), col("valid_from"),
        col("valid_to"), col("priority"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** Point-in-time lookup against the SCD2 table — the consumption side:
    * each probe (customer, ts) resolves to the version in effect at ts,
    * i.e. valid_from <= ts < valid_to (null-open tail). This is what
    * training-data cutoffs need: attribute values AS OF example-creation
    * time, never leaked from the future.
    *
    * Shape at 100 TB: equi-join on the high-cardinality custkey with the
    * interval predicate as a residual — a plain SMJ/SHJ; per-key version
    * counts are small (run-length-merged), so the residual scan per probe
    * is bounded. Probes here: each customer's LAST order shifted one day
    * back, so some probes resolve to a non-current version (exercising
    * the interval logic, not just the open tail). */
  def asOfLookup(orders: DataFrame): DataFrame = {
    val dim = customerPriorityScd2(orders)
    val probes = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"))
      .select(col("o_custkey").as("p_custkey"),
        (col("last_order") - expr("INTERVAL 1 DAY")).as("probe_ts"))
    asOfResolve(probes, dim).orderBy(col("o_custkey"))
  }

  /** The resolve join alone — (p_custkey, probe_ts) probes against a
    * versioned dimension. No sort, no aggregation, so it runs unchanged
    * as a STREAM-STATIC join: a probe stream re-reads the static dim per
    * micro-batch with zero watermark/state (stream==batch gated in
    * `StatefulStreamSpec`) — the standard no-future-leakage attribute
    * lookup under streaming ingest. */
  def asOfResolve(probes: DataFrame, dim: DataFrame): DataFrame =
    probes.join(dim,
        col("p_custkey") === col("o_custkey") &&
        col("valid_from") <= col("probe_ts") &&
        (col("valid_to").isNull || col("valid_to") > col("probe_ts")))
      .select(col("p_custkey").as("o_custkey"), col("probe_ts"),
        col("version"), col("priority"), col("is_current"))
}
