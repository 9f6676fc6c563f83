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

  // --------------------------------------------- incremental maintenance

  /** Generic SCD2 build with a LAST-SEEN column — the incremental form
    * of [[customerPriorityScd2]]. `last_seen` on each version is the max
    * observed date inside its run: run-length merging erases "the same
    * value was observed again later", and without it a standing
    * dimension cannot DETECT an out-of-order delta (an observation
    * landing between the current run's start and its true last
    * observation would silently split a run a rebuild would merge).
    * Carrying last_seen makes [[scd2Apply]]'s monotone-feed refusal
    * exact instead of best-effort. Values must be non-null (a null
    * observation would poison the run-change comparison).
    *
    * Output: (key, version, valid_from, valid_to, value, is_current,
    * last_seen). Same single-Exchange window discipline as the fixed
    * build: every pass partitions by the high-cardinality key. */
  def scd2Build(obs: DataFrame, key: String, date: String,
      obsId: String, value: String): DataFrame = {
    val perDay = Window.partitionBy(col(key), col(date))
      .orderBy(desc(obsId))
    val daily = obs.withColumn("rn", row_number().over(perDay))
      .filter(col("rn") === 1).select(col(key), col(date), col(value))
    val byKey = Window.partitionBy(col(key)).orderBy(col(date))
    val prev = lag(col(value), 1).over(byKey)
    val runs = daily
      .withColumn("chg",
        when(prev.isNull || prev =!= col(value), 1L).otherwise(0L))
      .withColumn("runid", sum(col("chg")).over(byKey))
    val byRun = runs.groupBy(col(key), col("runid"))
      .agg(min(col(date)).as("valid_from"),
        max(col(date)).as("last_seen"), first(col(value)).as(value))
    val byStart = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    byRun
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .select(col(key), col("runid").cast("bigint").as("version"),
        col("valid_from"), col("valid_to"), col(value),
        col("valid_to").isNull.as("is_current"), col("last_seen"))
  }

  /** Apply a DELTA of observations to a standing SCD2 dimension,
    * touching ONLY the affected keys — the 100 TB dimension-maintenance
    * shape: the standing table holds billions of entities' version
    * history and a day's feed observes a sliver of them, so re-windowing
    * full history per feed (the [[scd2Build]] cost) is exactly what this
    * avoids. Result is row-identical to a from-scratch rebuild over
    * (history + delta) — spec-gated — under the MONOTONE-FEED contract:
    * each key's delta observations are dated strictly after that key's
    * `last_seen`, REFUSED loudly otherwise (exact detection — that is
    * what last_seen is stored for; an admitted out-of-order row would
    * silently split runs a rebuild would merge). A same-value
    * observation EXTENDS the current run (advances last_seen, no new
    * version); a changed value closes it and opens version+1; unseen
    * keys start at version 1.
    *
    * Plan shape: unaffected keys pass through untouched (left-anti on
    * the BROADCAST affected-key sliver — at scale, a key-partitioned
    * dimension rewrites only touched partitions); the re-run window
    * covers (current rows of affected keys + the delta) only — closed
    * history rows pass through verbatim, never re-windowed. */
  def scd2Apply(dim: DataFrame, obs: DataFrame, key: String,
      date: String, obsId: String, value: String): DataFrame = {
    // the two delta-sized slivers are MATERIALIZED (eager localCheckpoint):
    // `cur` feeds the refusal, the seeds, and the version base — without
    // the cut each consumer would re-evaluate the dim subtree (a standing
    // dim is a table scan; a derived dim would re-run its whole lineage)
    val affected = obs.select(col(key)).distinct().localCheckpoint()
    val untouched = dim.join(broadcast(affected), Seq(key), "left_anti")
    val aff = dim.join(broadcast(affected), Seq(key), "left_semi")
    val cur = aff.filter(col("is_current")).localCheckpoint()
    val closed = aff.filter(!col("is_current"))

    val lateRows = obs.join(
        broadcast(cur.select(col(key), col("last_seen"))), Seq(key), "left")
      .filter(col("last_seen").isNotNull && col(date) <= col("last_seen"))
    require(lateRows.take(1).isEmpty,
      "Scd.scd2Apply refused: delta contains observation(s) at or " +
        "before a key's last_seen — out-of-order feeds silently split " +
        "runs a rebuild would merge; rebuild with scd2Build instead")

    val perDay = Window.partitionBy(col(key), col(date))
      .orderBy(desc(obsId))
    val daily = obs.withColumn("rn", row_number().over(perDay))
      .filter(col("rn") === 1)
      .select(col(key), col(date), col(value),
        lit(null).cast(obs.schema(date).dataType).as("seed_from"))
    // the current version participates as a pseudo-observation dated at
    // its last_seen: strictly before every delta row (the refusal above),
    // so it sorts first and anchors the run-change comparison
    val seeds = cur.select(col(key), col("last_seen").as(date),
      col(value), col("valid_from").as("seed_from"))
    val byKey = Window.partitionBy(col(key)).orderBy(col(date))
    val prev = lag(col(value), 1).over(byKey)
    val runs = seeds.unionByName(daily)
      .withColumn("chg",
        when(prev.isNull || prev =!= col(value), 1L).otherwise(0L))
      .withColumn("runid", sum(col("chg")).over(byKey))
    val byRun = runs.groupBy(col(key), col("runid"))
      .agg(min(coalesce(col("seed_from"), col(date))).as("valid_from"),
        max(col(date)).as("last_seen"), first(col(value)).as(value))
    // version numbering continues per key: the seed run keeps its number
    val vbase = cur.select(col(key), (col("version") - 1).as("vbase"))
    val byStart = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    val rebuilt = byRun
      .join(broadcast(vbase), Seq(key), "left")
      .withColumn("version",
        (coalesce(col("vbase"), lit(0L)) + col("runid")).cast("bigint"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .select(col(key), col("version"), col("valid_from"), col("valid_to"),
        col(value), col("valid_to").isNull.as("is_current"),
        col("last_seen"))
    untouched.unionByName(closed).unionByName(rebuilt)
  }

  /** Fold one observation micro-batch into a STANDING SCD2 dimension
    * table (`{table}_scd2`) under BATCH-ID idempotence — [[MatView
    * .foldBatch]]'s ledger recipe applied to dimension maintenance.
    * Batch 0 bootstraps via [[scd2Build]]; later batches fold via
    * [[scd2Apply]] and swap the updated dimension in through the
    * crash-recoverable [[Swap]]. The apply output carries unaffected
    * keys verbatim, so at scale a key-partitioned dimension overwrites
    * only touched partitions — the whole-table staged swap is the
    * unpartitioned demo shape, crash-safe either way. The ledger check
    * runs BEFORE the apply, necessarily: a redelivered batch's
    * observations sit at or below last_seen by construction, so without
    * the ledger an at-least-once feed would trip the monotone-feed
    * refusal and ERROR instead of converging — the refusal guards
    * OUT-OF-ORDER data, the ledger guards REDELIVERED batches, and the
    * two failure modes need different answers (loud vs no-op). */
  def foldScd2Batch(table: String, bid: Long, obs: DataFrame,
      key: String, date: String, obsId: String, value: String): Unit = {
    val spark = obs.sparkSession
    val dimT = s"${table}_scd2"
    val ledger = s"${table}_batches"
    if (spark.catalog.tableExists(ledger) &&
        spark.table(ledger).filter(col("bid") === bid).take(1).nonEmpty)
      return // redelivered batch: already folded
    Swap.recoverUnpartitioned(spark, dimT)
    if (!spark.catalog.tableExists(dimT)) {
      scd2Build(obs, key, date, obsId, value)
        .write.mode("overwrite").format("parquet").saveAsTable(dimT)
    } else if (!obs.isEmpty) {
      Swap.stageThenSwap(spark, dimT,
        scd2Apply(spark.table(dimT), obs, key, date, obsId, value)) {
        (df, staged) =>
          df.write.mode("overwrite").format("parquet").saveAsTable(staged)
      }
    }
    MatView.writeLedger(spark, ledger, bid)
  }
}
