package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join — `|a.t - b.t| <= W` within a key — rewritten to an
  * EQUI-join on time buckets. A naive inequality join plans as a cartesian
  * (per key) product; bucketing by `W`-sized windows and probing bucket
  * b and b+1 turns it into two shuffled equi-joins plus a cheap filter —
  * the standard linearization Spark's planner doesn't do automatically
  * (SURVEY.md §7.3: compose built-ins before custom plans).
  *
  * Probing (b, b) and (b, b+1) with src<dst covers every qualifying pair
  * exactly once: for a pair t_src <= t_dst within W, either both fall in
  * one bucket or t_dst falls in the next.
  */
object RangeJoin {

  /** Pairs of events by the same user within `windowSec` of each other
    * (src event earlier-or-equal, src<dst tiebreak on ids for identical
    * timestamps). Output: user_id, src, dst, dt_sec. */
  def eventPairsWithin(events: DataFrame, windowSec: Long): DataFrame = {
    val sec = unix_timestamp(col("ts"))
    val e = events.select(
      col("user_id"), col("event_id"), sec.as("sec"),
      (sec.cast("long") / windowSec).cast("long").as("bucket"))

    val a = e.select(col("user_id"), col("event_id").as("src"),
      col("sec").as("src_sec"), col("bucket"))
    // probe same bucket and the successor bucket
    val b0 = e.select(col("user_id"), col("event_id").as("dst"),
      col("sec").as("dst_sec"), col("bucket"))
    val b1 = b0.withColumn("bucket", col("bucket") - 1)
    val probes = b0.unionByName(b1)

    a.join(probes, Seq("user_id", "bucket"))
      .filter(
        col("dst_sec") >= col("src_sec") &&
        col("dst_sec") - col("src_sec") <= windowSec &&
        // strict pair ordering: by time, id tiebreak; excludes self
        (col("src_sec") < col("dst_sec") ||
          (col("src_sec") === col("dst_sec") && col("src") < col("dst"))))
      // no dedupe needed: a pair's dst lives in exactly one of {b, b+1}
      // relative to src's bucket, so exactly one probe matches it
      .select(col("user_id"), col("src"), col("dst"),
        (col("dst_sec") - col("src_sec")).as("dt_sec"))
      .orderBy(col("user_id"), col("src"), col("dst"))
  }
}
