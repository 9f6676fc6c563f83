package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign every document a (shard, seq_id, offset) slot
  * in a stream of fixed token-budget training sequences — the
  * "concatenate-then-chunk" packing step that turns a filtered corpus
  * into equal-length LLM training rows.
  *
  * Shape at 100 TB: packing is a prefix-sum, and a GLOBAL prefix sum over
  * the corpus would funnel everything through one ordered partition. Real
  * pipelines never need one global document order — they need *some*
  * deterministic order with bounded coordination — so the corpus is first
  * split into `Shards` deterministic shards by content-id hash (same
  * portable md5 bucket as [[Sampling.bucket256]], so retries and layout
  * changes can't move a document between shards), and the running token
  * count is a window prefix-sum PARTITIONed by (lang, shard): one shuffle
  * on a key whose cardinality scales with the configured shard count, each
  * partition packed independently and in parallel. Sequence identity is
  * the triple (lang, shard, seq_id) — globally unique without any
  * cross-shard coordination. A document longer than the budget simply
  * spans sequences, exactly as concat-then-chunk does.
  */
object Packing {

  /** Tokens per packed training sequence (toy-sized for the test corpus;
    * the real knob would be the model context length). */
  val SeqTokens = 512

  /** Deterministic shard count: at real scale this is O(cores in the
    * cluster); 8 keeps the toy corpus's per-shard streams non-trivial. */
  val Shards = 8

  /** Sharded per-document token counts — the shared scan stage of both
    * the assignment and the inventory (all per-row, codegen'd). */
  private def sharded(docs: DataFrame, shards: Int): DataFrame =
    docs.select(
      col("doc_id"), col("lang"),
      pmod(Sampling.bucket256("pack", col("doc_id")), lit(shards)).as("shard"),
      size(Dedup.words(col("text"))).cast("bigint").as("n_tokens"))

  /** Per-document packing assignment: shard, running token offset, the
    * sequence (chunk) the document starts in, and the offset within it. */
  def packSequences(docs: DataFrame, budget: Int = SeqTokens,
      shards: Int = Shards): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded(docs, shards)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        (col("cum_before") / budget).cast("bigint").as("seq_id"),
        pmod(col("cum_before"), lit(budget.toLong)).as("seq_offset"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum-STAGED packing: documents pack into fixed-token
    * sequences WITHIN their curriculum stage (and shard), so a training
    * run consumes stage-1 sequences before stage-2 — the physical
    * layout curriculum learning actually trains on (ordering by
    * difficulty is useless if the packed sequences interleave stages).
    * Stage cuts are the exact bisected quartiles
    * ([[graft.ops.Sampling.curriculum]]'s discipline — bounded driver
    * metadata, no global sort); the pack itself is the same
    * per-(stage, shard) prefix sum as [[packSequences]]. */
  def packCurriculum(docs: DataFrame, budget: Int = SeqTokens,
      shards: Int = Shards): DataFrame = {
    val base = graft.CacheScope.track(docs.select(
      col("doc_id"),
      pmod(Sampling.bucket256("pack", col("doc_id")), lit(shards)).as("shard"),
      size(Dedup.words(col("text"))).cast("bigint").as("n_tokens")))
    val cuts = Quantiles.exactQuantiles(base, col("n_tokens"),
      Seq(0.25, 0.5, 0.75)).map(_._2)
    val staged = base.withColumn("stage",
      (lit(1) + cuts.map(c => when(col("n_tokens") > c, 1).otherwise(0))
        .reduce(_ + _)).cast("int"))
    val w = Window.partitionBy(col("stage"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    staged
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("stage"), col("shard").cast("long").as("shard"),
        col("n_tokens"),
        (col("cum_before") / budget).cast("bigint").as("seq_id"),
        pmod(col("cum_before"), lit(budget.toLong)).as("seq_offset"))
      .orderBy(col("doc_id"))
  }

  /** Packed-sequence inventory: sequences started per (lang, shard) and
    * the padding the LAST partial sequence of each shard would carry —
    * the packing-efficiency number a pipeline reports. Derived from the
    * same sharded counts — a plain map-side-partial aggregate, no
    * prefix-sum window needed (sums don't care about intra-shard order). */
  def packingStats(docs: DataFrame, budget: Int = SeqTokens,
      shards: Int = Shards): DataFrame =
    sharded(docs, shards)
      .groupBy(col("lang"), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        // ceil-div: sequences needed to hold the shard's token stream
        ceil(sum(col("n_tokens")).cast("double") / budget).cast("bigint")
          .as("n_sequences"))
      .withColumn("pad_tokens",
        col("n_sequences") * budget - col("total_tokens"))
      .orderBy(col("lang"), col("shard"))
}
