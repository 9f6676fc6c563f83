package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized `spark.util.sketch.BloomFilter` —
  * the pruning half of sketch-based decontamination
  * ([[graft.ops.Decontam.overlapBloom]]): the filter is built once over the
  * eval side with `df.stat.bloomFilter` (distributed partial-merge
  * aggregation), serialized, and carried here as a BINARY literal, the same
  * way Spark's own runtime row-group filtering ships its bloom subquery
  * result. No false negatives by construction; false positives are killed
  * by the exact verify join downstream, so the composed operator stays
  * bit-exact (and oracle-checkable).
  *
  * The probe bytes are the UTF8 encoding of the value — identical to what
  * `stat.bloomFilter` put in (`putString` = `putBinary(utf8 bytes)`), so
  * probe and build hash the same keys.
  *
  * `right` must be foldable: the filter is deserialized ONCE (lazily, per
  * executor) and referenced from generated code, not re-read per row.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) if right.foldable && right.eval() == null =>
        // fail at analysis with a clear message — otherwise the lazy
        // deserialization NPEs inside BloomFilter.readFrom at plan time
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain got a NULL serialized filter")
      case (StringType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain needs a FOLDABLE serialized filter (a literal)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs (string, binary), got $other")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(value: Any, bytes: Any): Any =
    filter.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (v, _) => s"$bloomRef.mightContainBinary(($v).getBytes())")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
}
