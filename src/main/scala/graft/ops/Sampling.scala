package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training-data pipelines.
  *
  * At 100 TB the only splits that work are STATELESS ones: a row's
  * train/val/test assignment must be a pure function of its key, so any
  * executor (or any later re-run over a changed partition layout) assigns
  * identically with zero coordination — no global RNG, no sampled-row
  * table to join against, no ordering dependence. `rand()`-based
  * `sample()`/`sampleBy` give none of those guarantees across retries and
  * recomputed partitions, which is why production corpus pipelines key the
  * split on a content/id hash instead.
  *
  * The bucket is the first two hex digits of md5(salt|id) — uniform on
  * [0,256) and bit-identical in any engine (same no-murmur-seed rationale
  * as [[Dedup]]'s signatures), so the DuckDB oracle reproduces every
  * assignment exactly.
  */
object Sampling {

  /** Portable uniform bucket in [0,256): the first two md5 hex digits of
    * salt|id, parsed base-16 (`conv`). Per-row codegen'd — one scan, zero
    * shuffles; the oracle parses the same two digits with instr arithmetic. */
  def bucket256(salt: String, id: Column): Column = {
    val h = md5(concat(lit(salt + "|"), id.cast("string")).cast("binary"))
    conv(substring(h, 1, 2), 16, 10).cast("bigint")
  }

  /** 80/10/10 split thresholds on the 256-bucket space. */
  val TrainUpper = 205 // 205/256 ≈ 80.1%
  val ValUpper = 230   // 25/256 ≈ 9.8%; remainder ≈ 10.2% test

  /** Assign every document a reproducible train/val/test split. */
  def hashSplit(docs: DataFrame, salt: String = "split"): DataFrame =
    docs.select(col("doc_id"), bucket256(salt, col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
}
