package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sources.Layout

/** The co-located fact-fact join ([[Layout.writeBucketed]]): with both
  * facts bucketed (and sorted) on the join key, the SortMergeJoin must
  * consume the bucketed scans DIRECTLY — zero shuffle exchange and zero
  * sort on either join input (the write-time layout satisfies the join's
  * clustering + ordering requirement), and the result must equal the
  * plain join over the unbucketed tables. */
class BucketedJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join: zero exchange and zero sort below the " +
      "join; result == plain join") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft-bkj-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkj_test LOCATION '$wh'")
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    Layout.writeBucketed(orders, "graft_bkj_test.o", "o_orderkey")
    Layout.writeBucketed(lineitem, "graft_bkj_test.l", "l_orderkey")

    // forbid broadcast so the join MUST be a sort-merge join — the plan
    // shape under test; tiny sf would otherwise broadcast and prove
    // nothing about the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkj_test.o")
        .join(spark.table("graft_bkj_test.l"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"),
          col("o_orderpriority"))
      val got = joined.collect().map(_.toSeq).toSet

      val want = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"),
          col("o_orderpriority"))
        .collect().map(_.toSeq).toSet
      assert(got === want, "bucketed join result diverged from plain join")

      // plan: ZERO ShuffleExchange below the SMJ — the network cost (the
      // 100 TB lever) is eliminated; a LOCAL per-partition SortExec
      // remains by design: Spark does not propagate sortBy file order
      // from bucketed scans (multiple files per bucket would interleave),
      // so the nearly-sorted runs re-sort in memory — cheap, no IO, no
      // network (documented in Layout.writeBucketed)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def kids(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      def collectNodes(p: SparkPlan): Seq[SparkPlan] =
        p +: kids(p).flatMap(collectNodes)
      val all = collectNodes(joined.queryExecution.executedPlan)
      val smj = all.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined,
        s"no SortMergeJoin in the bucketed join plan:\n${joined.queryExecution.executedPlan}")
      val below = collectNodes(smj.get)
      assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"bucketed join still shuffles an input:\n${joined.queryExecution.executedPlan}")
      assert(joined.queryExecution.executedPlan.toString
          .contains("Bucketed: true"),
        "join inputs not read as bucketed scans")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
