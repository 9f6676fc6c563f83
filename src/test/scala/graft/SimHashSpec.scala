package graft

import org.apache.spark.sql.functions._

import graft.functions.SimHash32
import graft.model.Tables
import graft.ops.Dedup

/** The native single-pass SimHash expression must equal the explode-based
  * dataflow form on real documents. */
class SimHashSpec extends SparkSpec {

  test("expression simhash == dataflow simhash on sf0.001 documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    SimHash32.register(spark)
    val viaExpr = docs.select(col("doc_id"),
      call_function("simhash32", Dedup.words(col("text"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFlow = Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaFlow)
  }

  test("null words are skipped; empty array is 0") {
    SimHash32.register(spark)
    val r = spark.sql(
      "SELECT simhash32(array('a', CAST(NULL AS STRING))) AS a, " +
      "simhash32(array('a')) AS b, simhash32(CAST(array() AS ARRAY<STRING>)) AS e")
      .collect().head
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(2) === 0L)
  }
}
