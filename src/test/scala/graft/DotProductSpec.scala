package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Similarity

/** The native dot_product expression must be BIT-identical to the
  * zip_with+aggregate dataflow fold (same left-to-right summation), on real
  * embeddings and on hand-built edge cases. */
class DotProductSpec extends SparkSpec {

  test("native expression == dataflow fold on real embeddings, bit-for-bit") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Similarity.dot(col("v"), col("qv")).as("native"),
        Similarity.dotDataflow(col("v"), col("qv")).as("dataflow"))
    assert(both.filter(col("native") =!= col("dataflow")).count() === 0)
    assert(both.count() === 2000)
  }

  test("edge cases: empty arrays, negatives, single element") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(2.0), Seq(-3.5)),
      (Seq(1.0, -2.0, 3.0), Seq(4.0, 5.0, -6.0))
    ).toDF("a", "b")
    val rows = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotDataflow(col("a"), col("b")).as("dataflow"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.0, -7.0, 1.0 * 4 - 2 * 5 + 3 * -6))
  }

  test("null element => null result, matching the dataflow fold") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotDataflow(col("a"), col("b")).as("dataflow"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) === 11.0 && rows(1).getDouble(1) === 11.0)
  }

  test("whole-stage codegen covers the native kernel") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = e.select(Similarity.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" star prefix is WholeStageCodegenExec's rendering — the
    // projection containing dot_product must sit inside a codegen stage
    assert(plan.contains("*(1) Project [dot_product"))
  }
}
