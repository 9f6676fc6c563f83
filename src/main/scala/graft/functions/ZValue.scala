package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: interleave the low 31 bits of two non-negative
  * dimension values — bit b of `x` lands at position 2b, bit b of `y` at
  * 2b+1 — so lexicographic order on the 62-bit result walks the 2-D
  * Z-curve. Sorting/range-partitioning a write by this key clusters BOTH
  * dimensions into every file, which is what makes parquet min/max
  * row-group stats prune selective filters on either column (the
  * single-column sort only ever clusters one). 31 bits per side keeps the
  * result strictly non-negative in engines whose BIGINT shift overflows at
  * bit 63 (the DuckDB oracle reproduces the key with plain shift/mask
  * arithmetic).
  */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value needs (bigint, bigint), got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZValue.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZValue.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Spread the low 31 bits of `v` to the even bit positions (magic-mask
    * doubling, the standard O(log w) Morton spread). */
  private def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static entry for both interpreted eval and generated code. */
  def compute(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Inverse of [[compute]] — (x, y) low-31-bit pair. Test/debug aid. */
  def deinterleave(z: Long): (Long, Long) = {
    def unspread(v: Long): Long = {
      var x = v & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      (x | (x >> 16)) & 0x00000000FFFFFFFFL
    }
    (unspread(z), unspread(z >> 1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_value", exprs => ZValue(exprs(0), exprs(1)), "built-in")
}
