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

  /** Ordered, time-bounded funnel view → click → purchase: each user's
    * furthest stage, where each stage must follow the previous one
    * within [[FunnelWindow]] (ordering + conversion window is what
    * distinguishes a funnel from three filters — an unbounded month of
    * events trivially saturates every stage). Output: one row per stage
    * with user counts and the conversion fraction from the top.
    *
    * Scale shape: three per-user min-aggregations (map-side partial) and
    * two equi-joins on user_id — each stage's candidate set only shrinks.
    * No sequence explode, no window over event streams. The per-stage
    * aggregates (v, c, p) are CacheScope-tracked: each is referenced by
    * both the next stage's join and the final stage assembly, and an
    * uncached plan duplicates every upstream subtree per reference — the
    * round-11 plan audit counted ~8 scans of the event table for the
    * 4-reference DAG. Cached, the fact is scanned once per event type
    * plus once for the user universe; the cached frames are per-USER
    * aggregates (slim, bounded by user count), never raw events. */
  val FunnelWindow = "INTERVAL 1 DAY"

  /** Per-user furthest funnel stage — the shared core of [[funnel]] and
    * the streaming parity test in StatefulStreamSpec. */
  def funnelStages(events: DataFrame): DataFrame = {
    def firstAfter(evType: String, prev: DataFrame, prevTs: String, outTs: String) =
      events.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs) &&
          col("ts") <= col(prevTs) + expr(FunnelWindow))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
    val v = graft.CacheScope.track(
      events.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view")))
    val c = graft.CacheScope.track(firstAfter("click", v, "t_view", "t_click"))
    val p = graft.CacheScope.track(firstAfter("purchase", c, "t_click", "t_purchase"))
    events.select(col("user_id")).distinct()
      .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("s3").isNotNull, "3_purchase")
          .when(col("s2").isNotNull, "2_click")
          .when(col("s1").isNotNull, "1_view")
          .otherwise("0_none").as("stage"))
  }

  def funnel(events: DataFrame): DataFrame = {
    val total = events.agg(countDistinct(col("user_id")).as("total"))
    funnelStages(events).groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .withColumn("frac", round(col("n_users").cast("double") / col("total"), 4))
      .select(col("stage"), col("n_users"), col("frac"))
      .orderBy(col("stage"))
  }

  /** Retention cohorts: users bucketed by first-activity day, activity
    * counted per (cohort day, day offset) — the triangle every growth
    * dashboard plots. All exact integers; output is |days|²/2 rows.
    *
    * Scale shape: first-day per user is one min-aggregation; activity is
    * the distinct (user, day) set (one shuffle); the cohort join is
    * per-user equi. Nothing beyond |users·active-days| ever flows. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    active.join(firstDay, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
