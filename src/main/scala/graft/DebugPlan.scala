package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run named queries and print one summary line of the FINAL
  * adaptive plan's shape — shuffle/broadcast stage counts, parquet scan
  * count, ReusedExchange count. Complements PlanAudit (full formatted
  * plans) when iterating on exchange reuse / scan dedup:
  * `SF_DIR=... sbt "runMain graft.DebugPlan dedup_lsh_pairs ..."`. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(s).map(_.group(1)).toSeq
      val bStageIds = "BroadcastQueryStage (\\d+)".r.findAllMatchIn(s).map(_.group(1)).toSeq
      println(s"@@ $name shuffleStages=${stageIds.size} distinct=${stageIds.distinct.size} " +
        s"broadcastStages=${bStageIds.size}/${bStageIds.distinct.size} " +
        "FileScan=" + "Scan parquet".r.findAllIn(s).length +
        " ReusedExch=" + "ReusedExchange".r.findAllIn(s).length +
        " skewSplits=" + "skew=true".r.findAllIn(s).length)
      if (sys.env.contains("PLAN")) println(s)
      // free tracked views AND restore scoped execution confs between
      // names, matching the Verify/Bench query boundary
      CacheScope.unpersistAll()
    }
    spark.stop()
  }
}
