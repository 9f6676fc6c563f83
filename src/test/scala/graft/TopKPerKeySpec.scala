package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Similarity
import graft.plans.TopK

/** Custom TopKPerKey operator: plan shape (partial → exchange → final) and
  * result parity with the rank-window formulation. */
class TopKPerKeySpec extends SparkSpec {

  private def scored = {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosine(col("v"), col("qv")), 6).as("cos"))
  }

  test("plan contains partial and final heap operators around one exchange") {
    val df = TopK.perKey(scored, Seq("qid"), "cos", "vec_id", 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
  }

  test("results match the rank-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val viaCustom = TopK.perKey(scored, Seq("qid"), "cos", "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaWindow = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaCustom === viaWindow)
  }

  test("keeps fewer than k when a key has fewer rows, and exact k otherwise") {
    val df = TopK.perKey(scored.filter(col("vec_id") < 6), Seq("qid"), "cos", "vec_id", 5)
    // qids 0..3, candidates = vec_id in 0..5 minus self → 5 rows each
    val counts = df.groupBy("qid").count().collect().map(_.getLong(1)).toSet
    assert(counts === Set(5L))
    val small = TopK.perKey(scored.filter(col("vec_id") < 3), Seq("qid"), "cos", "vec_id", 5)
    assert(small.groupBy("qid").count().collect().map(_.getLong(1)).max <= 3)
  }
}
