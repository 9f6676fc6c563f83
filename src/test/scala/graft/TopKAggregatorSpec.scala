package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.model.Tables
import graft.ops.Similarity

/** The single-pass top-k aggregator must agree with the rank-window form. */
class TopKAggregatorSpec extends SparkSpec {

  test("aggregator top-k == window top-k on brute-force cosine search") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosine(col("v"), col("qv")), 6).as("cos"))

    val topkUdaf = udaf(new TopKAggregator(5))
    val viaAgg = scored
      .groupBy("qid")
      .agg(topkUdaf(col("vec_id"), col("cos")).as("topk"))
      .select(col("qid"), explode(col("topk")).as("e"))
      .select(col("qid"), col("e._1").as("vec_id"), col("e._2").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    import org.apache.spark.sql.expressions.Window
    val viaWindow = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(viaAgg === viaWindow)
  }
}
