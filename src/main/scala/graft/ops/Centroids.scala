package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VecSumAggregator

/** Per-label embedding centroids — the aggregation half of IVF/k-means
  * training over an embedding corpus (the assignment half is
  * [[Similarity]]'s cell joins).
  *
  * Determinism contract: embeddings are QUANTIZED per element
  * (round(x·1000) as long, one IEEE double multiply from the exact
  * float→double widening — bit-identical in any engine) before summing.
  * Integer sums are exact and associative, so the centroid cannot depend
  * on partition layout or merge order — the property float summation
  * loses and the reason this op can carry a hash-matching oracle at all.
  * The quantization loss (≤0.5e-3 per element) is the price, and real
  * pipelines pay it happily (PQ/IVF quantize far more aggressively).
  *
  * Shape at 100 TB: one pass; the typed [[VecSumAggregator]] keeps a
  * single (count, sums[64]) buffer per label per partition, so the
  * exchange carries fixed-size buffers — never 64× exploded rows. The
  * long-form output (label, dim, value) exists for the driver gate
  * (array cells crash it) and is |labels|·dims rows — tiny. */
object Centroids {

  val Scale = 1000L

  /** (label, dim, centroid, n) — centroid rounded to 6dp. */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val quantized = embeddings.select(
      col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * Scale).cast("long")).as("q"))
      .as[(Int, Array[Long])]
    val summed = quantized
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VecSumAggregator.toColumn.name("acc"))
      .toDF("label", "acc")
      .select(col("label"), col("acc._1").as("n"), col("acc._2").as("sums"))
    summed
      .select(col("label"), col("n"), posexplode(col("sums")).as(Seq("dim", "s")))
      .select(col("label"), col("dim"),
        round(col("s").cast("double") / (lit(Scale.toDouble) * col("n")), 6)
          .as("centroid"),
        col("n"))
      .orderBy(col("label"), col("dim"))
  }
}
