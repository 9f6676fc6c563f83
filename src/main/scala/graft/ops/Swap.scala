package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The crash-recoverable staged swap for UNPARTITIONED tables — the
  * [[Search.recoverIndexSwap]] scheme factored once (partitioned tables
  * need the MSCK/locations dance and live in
  * [[Similarity.recoverPartitionedSwap]]): Spark cannot overwrite a
  * table it is reading and no atomic table-replace DDL exists, so a
  * compaction rewrite stages `{live}_compacting`, renames the live
  * generation to `{live}_retired`, renames the staged copy in, and
  * drops the retired generation — every intermediate catalog state is
  * one [[recoverUnpartitioned]] call away from a readable table. */
object Swap {

  /** Stage `df` as the next generation of `live` and swap it in.
    * `write` persists the staged frame (the caller picks layout —
    * plain parquet, bucketed, …). Call [[recoverUnpartitioned]] first
    * on any path that might see a torn catalog. */
  def stageThenSwap(spark: SparkSession, live: String, df: DataFrame)(
      write: (DataFrame, String) => Unit): Unit = {
    val staged = s"${live}_compacting"
    write(df, staged)
    spark.sql(s"ALTER TABLE $live RENAME TO ${live}_retired")
    spark.sql(s"ALTER TABLE $staged RENAME TO $live")
    spark.sql(s"DROP TABLE ${live}_retired")
  }

  /** Repair an interrupted [[stageThenSwap]]: roll a complete staged
    * copy forward when the live table is missing (the only state with
    * no readable table), drop a stale staged copy or leftover retired
    * generation otherwise. Idempotent cheap DDL; returns true iff a
    * roll-forward restored a missing live table. */
  def recoverUnpartitioned(spark: SparkSession, live: String): Boolean = {
    val staged = s"${live}_compacting"
    val retired = s"${live}_retired"
    val rolledForward =
      if (!spark.catalog.tableExists(live) &&
          spark.catalog.tableExists(staged)) {
        spark.sql(s"ALTER TABLE $staged RENAME TO $live")
        true
      } else false
    if (spark.catalog.tableExists(live) && spark.catalog.tableExists(staged))
      spark.sql(s"DROP TABLE $staged")
    if (spark.catalog.tableExists(live) && spark.catalog.tableExists(retired))
      spark.sql(s"DROP TABLE $retired")
    rolledForward
  }
}
