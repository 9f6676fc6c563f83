package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively, composed from built-ins
  * (preference (a) of SURVEY.md §7.3 / the build brief: compose before
  * custom plans): for each left row, the single right row with the largest
  * right-time ≤ left-time within the same key.
  *
  * Implementation: tag + union both sides, sort each key's timeline once,
  * carry the latest right-side values forward with last_value(ignoreNulls)
  * over (key ORDER BY time, side), keep left rows. One shuffle on the key —
  * same cost as a regular sort-merge join, no range explosion, no
  * per-row probes; this is the standard scalable formulation (vs. a
  * window-per-probe or inequality-join which would be quadratic).
  *
  * The DuckDB oracle uses its NATIVE ASOF JOIN — a fully independent
  * implementation cross-checking ours.
  */
object AsOfJoin {

  /** leftDf(keyCol, timeCol, ...) asof-left-join rightDf(keyCol, timeCol,
    * payload...): right payload columns are appended (null when no right row
    * precedes). Right side must be unique per (key, time) — pre-dedupe.
    *
    * The carried value is the whole payload STRUCT, not per-column
    * last(ignoreNulls): with per-column carry, a NULL field in the matching
    * right row would wrongly resurrect an older row's value. The struct is
    * non-null for every right row, so last(ignoreNulls) picks exactly the
    * most recent right ROW. */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal time (<=)
      .withColumn("__key", col(key))
    val rTagged = right.select(
      col(key).as("__key"), col(rightTime).as("__t"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))

    val unioned = lTagged
      .drop(payload.filter(lTagged.columns.contains): _*)
      .unionByName(rTagged, allowMissingColumns = true)

    val timeline = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(timeline))
      .filter(col("__side") === 1)
    payload.foldLeft(carried)((df, c) => df.withColumn(c, col("__p").getField(c)))
      .drop("__key", "__t", "__side", "__p")
  }
}
