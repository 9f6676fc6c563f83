package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table — the batch forms of the
  * streaming surface (SURVEY.md §2.8 extension; the same transforms run
  * under Structured Streaming in graft.streaming.Streams).
  */
object Windows {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Tumbling 1-hour windows per event type: epoch-aligned hour buckets
    * (identical to Spark's `window(ts, '1 hour').start`), count + exact
    * decimal sum. One shuffle on (hour, event_type) with map-side partials. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Sessionization: per-user sessions split at inactivity gaps > 30 min —
    * lag window + cumulative gap count = session id, then per-session
    * aggregates. Two window passes over the same (user_id, ts) partitioning
    * (Catalyst reuses the sort), then one shuffle for the final group-by. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val sec = unix_timestamp(col("ts"))
    events
      .withColumn("prev_sec", lag(sec, 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_sec").isNull ||
          (sec - col("prev_sec")) > gapMinutes * 60L, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        (max(sec) - min(sec)).as("duration_sec"))
      .orderBy(col("user_id"), col("session_idx"))
  }
}
