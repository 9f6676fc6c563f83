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

  /** Gap-fill / resample: per-user daily event counts over the corpus's full
    * date span with inactive days zero-filled — the dense time series every
    * downstream rate/trend computation wants.
    *
    * Scale shape: the calendar is ONE global min/max row exploded into a
    * |days|-row dim and broadcast; the user dim is a distinct over the fact
    * table (one shuffle); the fill is users × broadcast(days) then a left
    * join against the per-(user, day) counts. Cost at 100 TB is
    * |users|·|days| output rows — never a per-event sequence explode, and
    * no all-pairs anything. */
  def gapfillDaily(events: DataFrame): DataFrame = {
    val days = events
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val users = events.select(col("user_id")).distinct()
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    users.crossJoin(broadcast(days))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
  }
}
