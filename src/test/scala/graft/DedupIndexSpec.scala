package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Dedup, DedupIndex}

/** The materialized LSH band index: candidate checks against the bucketed
  * table must (a) equal the recompute-everything path and (b) never
  * re-shuffle the index side — the property that makes delta ingest cost
  * independent of corpus size. */
class DedupIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed index: same candidates, zero exchange over the index scan") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val index = docs.filter(col("doc_id") % 5 =!= 0)

    val wh = Files.createTempDirectory("graft-lsh-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_lsh LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS graft_lsh.bands")
    DedupIndex.build(index, "graft_lsh.bands")

    // force the shuffle path: a broadcast of the tiny delta would hide
    // whether the bucket layout is what spares the index side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = DedupIndex.candidates(spark, "graft_lsh.bands", delta)
      val rows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // (a) result parity with the recompute path's candidate join
      val ib = Dedup.lshBands(index)
        .select(col("doc_id").as("index_id"), col("b"), col("k"))
      val db = Dedup.lshBands(delta)
        .select(col("doc_id").as("delta_id"), col("b"), col("k"))
      val expected = db.join(ib, Seq("b", "k"))
        .select("delta_id", "index_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === expected)
      assert(rows.nonEmpty)

      // (b) the index scan reads buckets and sits under NO exchange: the
      // only hash exchanges are the delta side of the join and the
      // distinct — never a third for the index side (node traversal, not
      // toString: AQE's toString repeats the initial plan)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      def hashExchanges(p: SparkPlan): Int = {
        val self = p match {
          case s: ShuffleExchangeExec if s.outputPartitioning.isInstanceOf[HashPartitioning] => 1
          case _ => 0
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        self + kids.map(hashExchanges).sum
      }
      val exec = got.queryExecution.executedPlan
      assert(exec.toString.contains("Bucketed: true"), s"index scan not bucketed:\n$exec")
      val n = hashExchanges(exec)
      assert(n <= 2, s"index side re-shuffled ($n hash exchanges):\n$exec")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
