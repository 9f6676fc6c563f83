package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff + changelog apply: the incremental-refresh primitives
  * for a periodically re-crawled corpus. `diff` turns two snapshot
  * versions into a changelog (added / removed / changed by content
  * fingerprint); `applyChangelog` rolls the old snapshot forward — the
  * two compose to the identity, which the spec proves and the oracle
  * pins row-for-row.
  *
  * Shape at 100 TB: both sides key on `doc_id` — a full-outer sort-merge
  * join (one shuffle per side, even spread on the high-cardinality id;
  * with both snapshots bucketed by id on disk, [[graft.sources.Layout]]
  * style, even those exchanges disappear). The fingerprint comparison
  * rides the join; nothing is ever pairwise beyond the key match. Apply
  * is an anti-join (drop removed+changed) plus a union (insert
  * added+changed) — same key, same partitioning, reused across stages.
  *
  * The two snapshot versions are derived deterministically from the one
  * driver-provided `documents` table (there is only one): the "old"
  * snapshot is missing every 11th doc (those read as added) and carries a
  * perturbed fingerprint on every 13th (changed); the "new" snapshot is
  * missing every 17th (removed). The derivation is part of the contract
  * so the DuckDB oracle replays it exactly.
  */
object Snapshot {

  private def fp: Column = md5(Dedup.normText(col("text")).cast("binary"))
  private def oldFp: Column =
    when(col("doc_id") % 13 === 0,
      md5(concat(lit("old|"), Dedup.normText(col("text"))).cast("binary")))
      .otherwise(fp)

  /** The simulated prior snapshot: every 11th doc absent, every 13th
    * doc's content different (hence a different fingerprint). */
  def oldSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), oldFp.as("fp"))

  /** The current snapshot: every 17th doc deleted since `old`. */
  def newSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), fp.as("fp"))

  /** Changelog between two (doc_id, fp) snapshots: one row per difference,
    * `change` ∈ added|removed|changed, with both fingerprints where they
    * exist. Unchanged rows drop out — the changelog is |Δ|-sized, not
    * corpus-sized. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), col("fp").as("old_fp"))
    val n = newSnap.select(col("doc_id"), col("fp").as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed"))
      .filter(col("change").isNotNull)
      .select(col("doc_id"), col("change"), col("old_fp"), col("new_fp"))
      .orderBy(col("doc_id"))
  }

  /** Roll a snapshot forward by a changelog: drop removed/changed ids
    * (left-anti), insert added/changed rows. Composes with [[diff]] to
    * reproduce the new snapshot exactly. */
  def applyChangelog(oldSnap: DataFrame, changelog: DataFrame): DataFrame = {
    val dropIds = changelog
      .filter(col("change").isin("removed", "changed")).select("doc_id")
    val inserts = changelog
      .filter(col("change").isin("added", "changed"))
      .select(col("doc_id"), col("new_fp").as("fp"))
    oldSnap.join(dropIds, Seq("doc_id"), "left_anti")
      .unionByName(inserts)
      .orderBy(col("doc_id"))
  }
}
