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

  test("pair salt is a pure parallelism knob: salt 1 == 16 == 64 under forced SMJ") {
    val students = Tables.students(spark, sfDir)
    def run(): (Long, Long) = {
      val e = EdgeRules.backfill(students)
      val i = EdgeRules.interestRule(Tables.partInterests(spark, sfDir))
      (e.count(), i.agg(sum(size(col("common")))).first().getLong(0))
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val baseline = run() // default salt (16), broadcast allowed
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (salt <- Seq("1", "64")) {
        spark.conf.set(EdgeRules.PairSaltConf, salt)
        assert(run() === baseline, s"salt=$salt diverged")
      }
    } finally {
      spark.conf.unset(EdgeRules.PairSaltConf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("j4 undirected probe is an equi-join, not a nested loop") {
    val st = Tables.students(spark, sfDir)
    val q = graft.ops.StudentQueries.pairRelationship(
      st, EdgeRules.backfill(st), "Customer#000000000", "Customer#000000001")
    val plan = q.queryExecution.executedPlan.toString
    // The 1-row x 1-row name-pair cross is a legitimate BNLJ(Cross); the
    // EDGE probe (the LeftOuter join) must be an equi-join on (src, dst).
    assert(!plan.contains("BroadcastNestedLoopJoin BuildRight, LeftOuter") &&
           !plan.contains("BroadcastNestedLoopJoin BuildLeft, LeftOuter"),
      "undirected edge probe fell back to a nested loop")
    assert(q.count() >= 1)
  }

  test("df-capped interest rule with cap >= max df equals the exact rule") {
    val toks = Tables.partInterests(spark, sfDir)
    val exact = EdgeRules.interestRule(toks)
      .select(col("src"), col("dst"), col("common"))
    val capped = EdgeRules.interestRuleCapped(toks, maxDf = Long.MaxValue)
      .select(col("src"), col("dst"), col("common"))
    assert(capped.exceptAll(exact).isEmpty && exact.exceptAll(capped).isEmpty)
  }
}
