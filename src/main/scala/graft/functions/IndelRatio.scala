package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** rapidfuzz `fuzz.ratio` parity as a native Catalyst expression with codegen
  * (the reference scores fuzzy name matches with rapidfuzz,
  * src/llm_cypher.py:30, fastapi/services/student_service.py:248).
  *
  * `ratio(s1, s2) = 100 * (1 - indel_distance / (|s1| + |s2|))` where
  * `indel_distance = |s1| + |s2| - 2 * LCS(s1, s2)` — insertions/deletions
  * only, NO substitutions (this is rapidfuzz's normalized Indel similarity,
  * distinct from a Levenshtein ratio). Computed over Unicode code points.
  *
  * Implemented as a BinaryExpression with `doGenCode` delegating to a static
  * JVM method, so it participates in whole-stage codegen instead of being a
  * UDF black box (SURVEY.md §2.9 U1 / §7.3).
  */
case class IndelRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "indel_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IndelRatio.ratio(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IndelRatio.ratio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IndelRatio {

  /** Longest-common-subsequence length over code points, O(min(m,n)) space. */
  private def lcsLen(a: Array[Int], b: Array[Int]): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    if (m == 0) return 0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 0
    while (i < l.length) {
      var j = 0
      while (j < m) {
        cur(j + 1) =
          if (l(i) == s(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  /** rapidfuzz fuzz.ratio semantics: 100 * (1 - indel/(m+n)); 100.0 when both
    * strings are empty (rapidfuzz returns 100 for two empty strings). */
  def ratio(s1: String, s2: String): Double = {
    val a = s1.codePoints().toArray
    val b = s2.codePoints().toArray
    val total = a.length + b.length
    if (total == 0) return 100.0
    val indel = total - 2 * lcsLen(a, b)
    100.0 * (1.0 - indel.toDouble / total.toDouble)
  }

  /** Register `indel_ratio(str, str) -> double` for SQL / `call_function`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "indel_ratio", exprs => IndelRatio(exprs(0), exprs(1)), "built-in")
}
