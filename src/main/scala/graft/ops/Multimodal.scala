package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media row (binary payload + typed metadata). */
case class MediaRow(doc_id: Long, kind: String, bytes: Array[Byte])

/** Features extracted by the (stubbed) decoder. */
case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
    width: Int, height: Int, channels: Int)

/** Multimodal-column plumbing: image/audio/video payloads as opaque BINARY
  * columns with typed metadata, decoded/feature-extracted in BATCHES via
  * mapPartitions (the Scala analog of `mapInPandas`: fixed-size batches so
  * a real decoder amortizes model/library setup per batch, not per row).
  *
  * The decode itself is a clearly-marked STUB (no image/audio libraries in
  * this container): deterministic pseudo-decode from the leading payload
  * bytes. Everything around it — schema, binary synthesis, batching,
  * partition-parallel execution — is real and oracle-tested.
  */
object Multimodal {

  val BatchSize = 64

  /** Synthesize a deterministic binary media table from `documents`:
    * payload = the 16 md5 bytes of the text; kind cycles image/audio/video.
    * (Stands in for reading real blobs; at scale this column would come
    * from parquet BINARY or a blob-store path column.) */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      unhex(md5(col("text").cast("binary"))).as("bytes"))

  /** STUB decoder — a real implementation would parse image headers /
    * audio frames here. Deterministic fake: dimensions from leading bytes. */
  private def decodeStub(m: MediaRow): MediaFeatures =
    MediaFeatures(
      doc_id = m.doc_id,
      kind = m.kind,
      byte_len = m.bytes.length,
      width = m.bytes(0) & 0xff,
      height = m.bytes(1) & 0xff,
      channels = if (m.kind == "audio") 1 else 3)

  /** Frame sampling + resize planning for video rows — the third multimodal
    * plumbing shape (per-row EXPLODE into sampled frames, then per-frame
    * arithmetic), all Spark built-ins inside whole-stage codegen. The
    * "container header" (frame count, source dims) is the same deterministic
    * stub as [[decodeStub]] (leading payload bytes); frame extraction itself
    * would replace the md5 frame-hash stub with a real decoder call inside
    * [[extractFeatures]]'s batching. Resize preserves aspect ratio with
    * integer math (engine-portable, no float rounding). */
  def frameSample(media: DataFrame, stride: Int = 8, maxDim: Int = 64): DataFrame = {
    def hexPair(pos: Int) =
      conv(substring(lower(hex(col("bytes"))), pos, 2), 16, 10).cast("int")
    media.filter(col("kind") === "video")
      .withColumn("w", greatest(hexPair(1), lit(1)))
      .withColumn("h", greatest(hexPair(3), lit(1)))
      .withColumn("n_frames", hexPair(5) + 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("rw", least(col("w"), lit(maxDim)))
      .withColumn("rh", greatest(expr("(h * rw) div w"), lit(1L)).cast("int"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(concat_ws("_", col("doc_id"), col("frame_idx")).cast("binary")).as("frame_hash"),
        col("rw"), col("rh"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Batched feature extraction: partitions stream through the stub decoder
    * in [[BatchSize]] chunks. Runs fully parallel per partition; no shuffle. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // batch boundary = where a real decoder would run vectorized
          batch.map(decodeStub)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
