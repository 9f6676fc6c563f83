package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature — h_i = min over 3-word shingles of
  * md5("i|" ++ shingle) — as ONE native single-pass expression over the
  * word array, instead of the explode-shingles → groupBy(doc_id) →
  * NumHashes×min(md5(...)) dataflow (Dedup.minhashSignatureOf keeps the
  * dataflow form; MinHashSpec proves the two equal, and the DuckDB oracle
  * hash-matches this path bit-for-bit).
  *
  * Why it matters at scale: the dataflow form explodes every document into
  * its shingle rows and shuffles partial mins per doc; this expression
  * computes the signature INSIDE the scan stage — zero shuffle, zero row
  * blow-up — so LSH banding becomes a pure map until the band self-join's
  * single exchange. Per shingle it feeds one reused MessageDigest
  * incrementally (prefix, word, space, word, space, word) — no per-hash
  * string concat, cast, or hex round-trip like the expression-tree form.
  *
  * Parity details: the minimum tracks raw 16-byte digests compared as
  * unsigned bytes — lowercase hex is order-isomorphic to unsigned byte
  * order (hex digits ascend with nibble value), so this equals the SQL
  * lexicographic min over md5 hex strings. Duplicate shingles need no
  * dedup: min over a multiset equals min over its support. Null words are
  * skipped with no separator, matching concat_ws / array_join.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs needs array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    MinHashSigs.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {

  val NumHashes = 8

  private val hexChars = "0123456789abcdef".toCharArray
  private val space = Array[Byte](' ')
  // "0|" .. "7|" — the per-hash prefixes, UTF-8
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(NumHashes)(i => s"$i|".getBytes("UTF-8"))

  /** Static entry for both interpreted eval and generated code. */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      wb(i) = if (words.isNullAt(i)) null else words.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val mins = Array.fill(NumHashes)(null: Array[Byte])

    // feed one shingle's words (nulls skipped, single-space separated) and
    // fold the digest into the running min for every hash index
    def digestShingle(from: Int, len: Int): Unit = {
      var h = 0
      while (h < NumHashes) {
        md.update(prefixes(h))
        var wrote = false
        var j = from
        val end = from + len
        while (j < end) {
          if (wb(j) != null) {
            if (wrote) md.update(space)
            md.update(wb(j))
            wrote = true
          }
          j += 1
        }
        md.digest(buf, 0, 16)
        if (mins(h) == null) {
          mins(h) = java.util.Arrays.copyOf(buf, 16)
        } else if (unsignedLess(buf, mins(h))) {
          System.arraycopy(buf, 0, mins(h), 0, 16)
        }
        h += 1
      }
    }

    if (n >= 3) {
      var s = 0
      while (s <= n - 3) { digestShingle(s, 3); s += 1 }
    } else {
      digestShingle(0, n) // whole (short) text as the single shingle
    }

    new GenericArrayData(mins.map(m => UTF8String.fromString(hex(m))): Array[Any])
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs.head), "built-in")
}
