package graft

import org.apache.spark.sql.functions._

/** The GraftExtensions optimizer rule + injected function, on the shared
  * session (registered in SparkSpec's builder). */
class ExtensionsSpec extends SparkSpec {

  test("array_intersect on non-null string arrays is rewritten to filter form") {
    // non-foldable input (column-dependent) so constant folding can't
    // pre-evaluate the expression before the rewrite is observable
    val df = spark.range(1).selectExpr(
      "array_intersect(array('b', 'a', 'b', cast(id AS STRING)), array('a','b','9')) AS i")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_distinct"), s"expected rewrite in:\n$optimized")
    assert(!optimized.contains("array_intersect"), s"rule did not fire:\n$optimized")
    // semantics preserved: distinct, left first-occurrence order
    assert(df.collect().head.getSeq[String](0) === Seq("b", "a"))
  }

  test("nullable-element arrays are left untouched (semantics guard)") {
    val df = spark.sql(
      "SELECT array_intersect(array('a', NULL), array('a', NULL)) AS i")
    assert(df.collect().head.getSeq[String](0) === Seq("a", null))
  }

  test("indel_ratio is available via extensions without manual registration") {
    val r = spark.sql("SELECT indel_ratio('aayush', 'ayush') AS r")
      .collect().head.getDouble(0)
    assert(math.abs(r - 100.0 * (1 - 1.0 / 11)) < 1e-9)
  }

  test("dot_product is available via extensions without manual registration") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, -2.0d, 3.0d), array(4.0d, 5.0d, -6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === (4.0 - 10.0 - 18.0))
  }

  test("simhash32 and minhash_sigs are available via extensions") {
    val r = spark.sql(
      "SELECT simhash32(array('a', 'b')) AS s, minhash_sigs(array('x')) AS m")
      .collect().head
    assert(r.getLong(0) === graft.functions.SimHash32.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(org.apache.spark.unsafe.types.UTF8String.fromString("a"),
          org.apache.spark.unsafe.types.UTF8String.fromString("b")))))
    assert(r.getSeq[String](1).head ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex("0|x"))
  }
}
