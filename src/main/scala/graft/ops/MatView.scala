package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED AGGREGATE (IVM) — the additive
  * `_stats` discipline ([[Search]]'s n_docs/sum_dl row) generalized into
  * a user-facing view: a standing `GROUP BY keys` aggregate maintained
  * under inserts AND deletes without ever re-reading the base table.
  *
  * Storage is ADDITIVE PARTIAL ROWS: each build/delta/delete appends one
  * generation of (keys…, cnt, sum_<c>…) rows — a delta appends its own
  * partial aggregate (delta-sized, map-side combined), a delete appends
  * the victims' NEGATED partials — and [[read]] folds generations by
  * summing per key, dropping cnt = 0 groups (a fully-deleted group
  * vanishes, exactly as a recompute would). Counts are longs and sums
  * must be DECIMAL/integral columns (associative, partition-order
  * independent — the money-math discipline), so the fold is EXACT: read
  * after any build/delta/delete sequence is bit-identical to a
  * from-scratch `GROUP BY` over the surviving base rows (spec-gated).
  *
  * At 100 TB: refresh cost is delta-sized (the base table is NEVER
  * re-read; the partial aggregate of a batch shuffles |batch| rows at
  * most, map-side combined to |touched keys|); read cost is
  * view-sized (Σ generations, folded by one key shuffle); [[compact]]
  * folds generations to one row per key through the crash-recoverable
  * [[Swap]] so read cost stays ~|keys| between maintenance windows.
  * Insert idempotence is the [[IngestGuard]] bloom contract on a
  * caller-named unique row-id column; deletes trust the caller to
  * deliver each victim ROW exactly once (the view stores no per-row
  * identity — at scale the base table's own delete pipeline, e.g. a
  * [[Tombstones]] victims frame, is the driver).
  *
  * SCOPE: additive measures only — count, sum, and anything derivable
  * from them at read time (avg = sum/cnt). min/max are deliberately NOT
  * offered: they are insert-maintainable but not delete-maintainable
  * (removing the current min needs the runner-up, which only the base
  * rows know) — a min/max view under deletes is a recompute-on-affected-
  * groups structure, a different design with base-read refresh cost,
  * and pretending otherwise here would be a silent-wrong-answer trap. */
object MatView {

  private def partial(df: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sums.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Materialize the view over `df`. `idCol` names the base table's
    * unique row id (the delta-disjointness guard); `sums` columns must
    * be DECIMAL or integral (exact additive fold). */
  def build(df: DataFrame, table: String, keys: Seq[String],
      sums: Seq[String], idCol: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${table}_mv")
    partial(df, keys, sums)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_mv")
    IngestGuard.write(spark, df, idCol, table, overwrite = true)
  }

  /** Incremental insert maintenance: append the DELTA's partial
    * aggregate — one delta-sized pass, the base is never re-read.
    * Delta rows must be new ([[IngestGuard]] — a replayed row would
    * silently double its group's cnt/sums). */
  def delta(table: String, df: DataFrame, keys: Seq[String],
      sums: Seq[String], idCol: String): Unit = {
    val spark = df.sparkSession
    if (df.isEmpty) return
    Swap.recoverUnpartitioned(spark, s"${table}_mv")
    require(spark.catalog.tableExists(s"${table}_mv"),
      s"MatView.delta needs a standing view: ${table}_mv not found — " +
        "run build first")
    // the view stores NO per-row identity, so a bloom hit cannot be
    // exact-confirmed like the index families do — suspects are refused
    // CONSERVATIVELY (fpp-rare false refusals; a real replay admitted
    // here would silently double its group's cnt/sums, the worse error)
    IngestGuard.suspectPredicate(spark, table, idCol).foreach { hit =>
      val suspects = df.select(col(idCol)).distinct().filter(hit)
      require(suspects.take(1).isEmpty,
        "MatView.delta refused: delta contains id(s) the guard has " +
          "(possibly) already seen; the view stores no row identity to " +
          "confirm, so bloom suspects are conservatively refused — " +
          "dedupe the feed or rebuild the view")
    }
    partial(df, keys, sums)
      .write.mode("append").format("parquet").saveAsTable(s"${table}_mv")
    IngestGuard.write(spark, df, idCol, table, overwrite = false)
  }

  /** Incremental delete maintenance: append the victims' NEGATED
    * partials (the BM25 negative-stats-row scheme per group). `victims`
    * are the full base rows being deleted, delivered exactly once. */
  def deleteRows(table: String, victims: DataFrame, keys: Seq[String],
      sums: Seq[String]): Unit = {
    val spark = victims.sparkSession
    if (victims.isEmpty) return
    Swap.recoverUnpartitioned(spark, s"${table}_mv")
    require(spark.catalog.tableExists(s"${table}_mv"),
      s"MatView.deleteRows needs a standing view: ${table}_mv not found")
    partial(victims, keys, sums)
      .select(keys.map(col) ++ ((-col("cnt")).as("cnt") +:
        sums.map(c => (-col(s"sum_$c")).as(s"sum_$c"))): _*)
      .write.mode("append").format("parquet").saveAsTable(s"${table}_mv")
  }

  /** The folded view: sum the additive generations per key, drop
    * fully-deleted groups. Bit-identical to a from-scratch GROUP BY
    * over the surviving base rows. */
  def read(spark: SparkSession, table: String, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    spark.table(s"${table}_mv")
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col("cnt") > 0)

  /** Streaming maintenance: fold ONE micro-batch under BATCH-ID
    * idempotence — the standard exactly-once `foreachBatch` recipe (a
    * batch-id ledger instead of row identity, which the view doesn't
    * keep): batch `bid` appends its partials once; a redelivered bid is
    * skipped entirely. SCOPE (the family-wide streaming contract): this
    * closes the REDELIVERY window — a batch fully folded but redelivered
    * because the crash hit between the fold and the stream's checkpoint
    * commit. A crash INSIDE the two appends (partials written, ledger
    * not) is the single-writer recovery scenario every multi-table
    * append shares: rebuild the view (delta-cheapness makes that rare
    * pain acceptable; a per-row ledger would change the structure's
    * whole cost model). Batch 0 bootstraps an empty catalog. */
  def foldBatch(table: String, bid: Long, df: DataFrame,
      keys: Seq[String], sums: Seq[String], idCol: String): Unit = {
    val spark = df.sparkSession
    val ledger = s"${table}_batches"
    if (!spark.catalog.tableExists(s"${table}_mv")) {
      build(df, table, keys, sums, idCol)
      writeLedger(spark, ledger, bid); return
    }
    if (spark.catalog.tableExists(ledger) &&
        spark.table(ledger).filter(col("bid") === bid).take(1).nonEmpty)
      return // redelivered batch: already folded
    if (df.isEmpty) { writeLedger(spark, ledger, bid); return }
    partial(df, keys, sums)
      .write.mode("append").format("parquet").saveAsTable(s"${table}_mv")
    IngestGuard.write(spark, df, idCol, table, overwrite = false)
    writeLedger(spark, ledger, bid)
  }

  /** CDC apply — one change-feed micro-batch (Debezium shape: an `op`
    * column, 'I' inserts / 'D' deletes carrying FULL row images) folded
    * into the view as ONE appended generation: the inserts' partials
    * plus the deletes' NEGATED partials, under the same batch-id ledger
    * as [[foldBatch]] (a redelivered bid is a strict no-op — CDC feeds
    * are exactly-once at the batch level, and both halves commit in one
    * append so a batch can never half-apply ACROSS ops; the
    * append-vs-ledger crash window is [[foldBatch]]'s documented
    * single-writer scope). Delete images must be the rows as ingested —
    * the CDC producer's before-image contract. */
  def applyCdc(table: String, bid: Long, changes: DataFrame,
      keys: Seq[String], sums: Seq[String]): Unit = {
    val spark = changes.sparkSession
    val ledger = s"${table}_batches"
    require(spark.catalog.tableExists(s"${table}_mv"),
      s"MatView.applyCdc needs a standing view: ${table}_mv not found — " +
        "run build first")
    if (spark.catalog.tableExists(ledger) &&
        spark.table(ledger).filter(col("bid") === bid).take(1).nonEmpty)
      return
    val ins = partial(changes.filter(col("op") === "I"), keys, sums)
    val del = partial(changes.filter(col("op") === "D"), keys, sums)
      .select(keys.map(col) ++ ((-col("cnt")).as("cnt") +:
        sums.map(c => (-col(s"sum_$c")).as(s"sum_$c"))): _*)
    ins.unionByName(del)
      .write.mode("append").format("parquet").saveAsTable(s"${table}_mv")
    writeLedger(spark, ledger, bid)
  }

  private def writeLedger(spark: SparkSession, ledger: String,
      bid: Long): Unit = {
    import spark.implicits._
    Seq(bid).toDF("bid").coalesce(1)
      .write.mode("append").format("parquet").saveAsTable(ledger)
  }

  /** Fold the generations physically to one row per key through the
    * crash-recoverable staged swap — read cost back to ~|keys|. The
    * guard sidecar is left as-is: unlike the index families the view
    * cannot reconstruct its id set, so deleted ids stay guard-refused
    * until the caller rebuilds (documented trade). */
  def compact(spark: SparkSession, table: String, keys: Seq[String],
      sums: Seq[String]): Unit = {
    Swap.recoverUnpartitioned(spark, s"${table}_mv")
    Swap.stageThenSwap(spark, s"${table}_mv",
      read(spark, table, keys, sums)) { (df, staged) =>
      df.write.mode("overwrite").format("parquet").saveAsTable(staged)
    }
  }
}
