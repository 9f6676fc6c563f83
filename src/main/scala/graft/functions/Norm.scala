package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** String/array normalization helpers reproducing the reference's Cypher
  * idioms exactly (reference: fastapi/services/student_service.py:151-155,
  * fastapi/services/create_relationships.py:21,84-86).
  *
  * All of these compose Spark built-in `functions._` — they stay inside
  * whole-stage codegen and are pushdown-friendly.
  */
object Norm {

  /** `toLower(trim(coalesce(x, '')))` — the reference's canonical null-safe
    * normalization (create_relationships.py:21). Note: this makes NULL == ''
    * == '  ' all compare equal, which the reference relies on in EP2 scoring
    * (student_service.py:151-154, the "''='' quirk" of SURVEY.md §7.4). */
  def norm(c: Column): Column = lower(trim(coalesce(c, lit(""))))

  /** Null-safe normalized equality (P3). */
  def normEq(a: Column, b: Column): Column = norm(a) === norm(b)

  /** Empty string array with a concrete type (for coalescing null arrays —
    * the reference treats null interest lists as `[]`, student_service.py:131). */
  val emptyStrArray: Column = array().cast(ArrayType(StringType))

  /** Element-wise `lower(trim(x))` over an array, null → []. */
  def normArr(c: Column): Column =
    transform(coalesce(c, emptyStrArray), x => lower(trim(x)))

  /** Case/space-insensitive array overlap —
    * `any(x IN a WHERE x IN b)` (create_relationships.py:84). */
  def overlapCi(a: Column, b: Column): Column =
    arrays_overlap(normArr(a), normArr(b))

  /** Case-preserving, case-insensitively-matched intersection that keeps the
    * LEFT argument's original casing: `[x IN a WHERE x IN b]` as the
    * reference computes it (student_service.py:155 keeps `o.interests`
    * casing; :103 keeps `s.interests` casing — left-side asymmetry noted in
    * SURVEY.md §7.4). */
  def intersectKeepLeft(a: Column, b: Column): Column =
    filter(
      coalesce(a, emptyStrArray),
      x => exists(coalesce(b, emptyStrArray), y => lower(trim(y)) === lower(trim(x))))
}
