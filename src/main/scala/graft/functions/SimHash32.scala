package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash over a word array as a native single-pass expression —
  * one pass per row instead of the words×32-bit-positions explode dataflow
  * (Dedup.simhash keeps the dataflow form; the two are proven equal in
  * SimHashSpec and against the DuckDB oracle).
  *
  * Bit semantics (identical to the SQL form): word's md5 hex digit b/4
  * contributes bit (b%4) of its value; fingerprint bit b = sign of the
  * summed ±1 contributions.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash32 needs array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    SimHash32.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  private val hexChars = "0123456789abcdef".toCharArray

  /** Static entry for both interpreted eval and generated code. */
  def compute(words: ArrayData): Long = {
    val counts = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) { // SQL SUM skips null contributions
        val digest = md.digest(words.getUTF8String(i).toString.getBytes("UTF-8"))
        md.reset()
        var b = 0
        while (b < 32) {
          val byteVal = digest(b / 8) & 0xff
          // hex digit b/4 = high nibble of byte for even digits, low for odd
          val digit = if ((b / 4) % 2 == 0) byteVal >> 4 else byteVal & 0xf
          val bit = (digit >> (b % 4)) & 1
          counts(b) += 2 * bit - 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) r |= 1L << b
      b += 1
    }
    r
  }

  /** Hex characters for any debugging of digest layout. */
  def hexOf(digest: Array[Byte]): String =
    digest.flatMap(x => Array(hexChars((x >> 4) & 0xf), hexChars(x & 0xf))).mkString

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", exprs => SimHash32(exprs.head), "built-in")
}
