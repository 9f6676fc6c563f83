package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STANDING LSH index as a physical artifact: the corpus's band keys
  * materialized into a table bucketed (and sorted) by the band join key.
  *
  * Why bucketing is the point: every delta-batch candidate check is a join
  * against this table on (b, k). With the index pre-bucketed on exactly
  * those keys, the scan itself satisfies the join's clustering requirement
  * — the 100 TB corpus side is NEVER re-shuffled; only the delta (small by
  * construction) exchanges to match the bucket layout. Ingest cost is
  * thereby independent of corpus size end-to-end: map-side signatures on
  * the delta (`minhash_sigs`), a delta-sized shuffle, a co-located probe.
  * `DedupIndexSpec` asserts the plan (zero Exchange over the index scan,
  * `Bucketed: true`) and the result (== `Dedup.incrementalNearDup`'s
  * candidate set).
  *
  * The exact-Jaccard verify stays downstream on the flagged sliver
  * ([[Dedup.incrementalNearDup]]); in production its shingle table is
  * materialized alongside the bands at build time instead of re-derived.
  */
object DedupIndex {

  /** Build (or replace) the band index table. `buckets` sizes the layout:
    * at corpus scale pick shuffle-partition-sized buckets; the join works
    * unchanged at any value because the bucket count only constrains the
    * delta side's matching exchange. */
  def build(docs: DataFrame, table: String, buckets: Int = 8): Unit =
    Dedup.lshBands(docs)
      .write.mode("overwrite")
      .bucketBy(buckets, "b", "k").sortBy("b", "k")
      .format("parquet").saveAsTable(table)

  /** Candidate (delta, index) near-dup pairs from band collisions against
    * the materialized index. */
  def candidates(spark: SparkSession, table: String, delta: DataFrame): DataFrame = {
    val ib = spark.table(table)
      .select(col("doc_id").as("index_id"), col("b"), col("k"))
    val db = Dedup.lshBands(delta)
      .select(col("doc_id").as("delta_id"), col("b"), col("k"))
    db.join(ib, Seq("b", "k"))
      .select(col("delta_id"), col("index_id")).distinct()
      .orderBy(col("delta_id"), col("index_id"))
  }
}
