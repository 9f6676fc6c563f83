package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns — the similarity
  * kernel (reference: the cosine scoring the rapidfuzz/recommend surface
  * implies at scale; see Similarity). One tight loop per row in generated
  * code; the equivalent `aggregate(zip_with(a, b, _*_), 0.0, _+_)` dataflow
  * form allocates an intermediate products array per row, which matters
  * when the kernel runs N×queries times per vector.
  *
  * Summation is the same left-to-right sequential fold as the dataflow form
  * and DuckDB's `list_dot_product`, so results agree bit-for-bit (proven in
  * DotProductSpec and by the sim_* oracle rows). Null ELEMENTS are not
  * supported (inputs are cast dense embeddings); length = min(|a|, |b|).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"dot_product needs two array<double>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Static entry for interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Register as a temp function (idempotent) — the public route from
    * Column-land to a custom Expression; same pattern as [[SimHash32]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => new DotProduct(exprs(0), exprs(1)), "built-in")
}
