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
  * DotProductSpec and by the sim_* oracle rows). A null ELEMENT makes the
  * result null — same as the dataflow form, where `zip_with` yields a null
  * product and the `aggregate` fold absorbs it. When the static type says
  * `containsNull=false` the per-element check is skipped entirely.
  * Length = min(|a|, |b|).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elementsMayBeNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true // pre-typecheck; resolved inputs are always ArrayType
    }
  }

  override def nullable: Boolean = super.nullable || elementsMayBeNull

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"dot_product needs two array<double>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (elementsMayBeNull)
      DotProduct.computeBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsMayBeNull) {
      // freshName, NOT a fixed local: with non-nullable array children whose
      // elements are nullable, nullSafeCodeGen emits this snippet unguarded,
      // so two dot_product calls in one generated function would otherwise
      // declare the same Java local twice (Janino error → silent interpreted
      // fallback). The braces scope the temp regardless.
      nullSafeCodeGen(ctx, ev, { (a, b) =>
        val r = ctx.freshName("graftDotProdRes")
        s"""
        {
          java.lang.Double $r = graft.functions.DotProduct.computeBoxed($a, $b);
          if ($r == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $r.doubleValue(); }
        }
      """
      })
    } else {
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Static entry for interpreted eval and generated code (no-null fast
    * path, used when both inputs are `containsNull=false`). */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Null-aware path: a null element anywhere in the overlapped prefix makes
    * the whole result null, matching `aggregate(zip_with(a,b,_*_),0.0,_+_)`. */
  def computeBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Register as a temp function (idempotent) — the public route from
    * Column-land to a custom Expression; same pattern as [[SimHash32]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => new DotProduct(exprs(0), exprs(1)), "built-in")
}
