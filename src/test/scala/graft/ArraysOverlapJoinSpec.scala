package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** The arrays_overlap-join rewrite: no cartesian product in the plan, and
  * results identical to the naive formulation's semantics. */
class ArraysOverlapJoinSpec extends SparkSpec {

  private def parts = Tables.partInterests(spark, "/root/testdata/sf0.001")

  test("overlap join plans as an equi-join on exploded tokens, not a cartesian") {
    val a = parts.select(col("id").as("a_id"), col("interests").as("a_arr"))
    val b = parts.select(col("id").as("b_id"), col("interests").as("b_arr"))
    val joined = a.join(b,
      arrays_overlap(col("a_arr"), col("b_arr")) && col("a_id") < col("b_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rewrite did not fire:\n$plan")
    assert(plan.contains("Generate"), plan)
  }

  test("rewrite preserves overlap-join semantics (pairs appear exactly once)") {
    val a = parts.select(col("id").as("a_id"), col("interests").as("a_arr"))
    val b = parts.select(col("id").as("b_id"), col("interests").as("b_arr"))
    val got = a.join(b,
      arrays_overlap(col("a_arr"), col("b_arr")) && col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates from multi-token pairs
    assert(got.length === got.distinct.length)
    // reference result from the (unrewritable) cross-join formulation
    val expected = a.crossJoin(b)
      .filter(arrays_overlap(col("a_arr"), col("b_arr")) && col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === expected.toSet)
    assert(expected.length === got.length)
  }
}
