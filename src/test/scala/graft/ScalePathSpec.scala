package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.EdgeRules

/** The local tables are small enough that Catalyst broadcasts everything;
  * at 100 TB these joins run as shuffled SMJ/SHJ on the salted keys. Force
  * that path and assert results are identical — the plan that ships is the
  * plan that was tested. */
class ScalePathSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("edge backfill and interest join: broadcast path == shuffled-join path") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val broadcastEdges = EdgeRules.backfill(Tables.students(spark, sfDir)).count()
    val broadcastInterests = EdgeRules.interestRule(Tables.partInterests(spark, sfDir))
      .agg(count(lit(1)), sum(size(col("common")))).first()
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = EdgeRules.backfill(Tables.students(spark, sfDir))
      assert(e.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      assert(e.count() === broadcastEdges)
      val i = EdgeRules.interestRule(Tables.partInterests(spark, sfDir))
        .agg(count(lit(1)), sum(size(col("common")))).first()
      assert(i === broadcastInterests)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
