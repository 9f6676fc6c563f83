package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named queries to files —
  * the optimization rounds' `plans/rNN/<query>_{before,after}.txt`
  * deliverable. Usage:
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <name1> [name2 ...]"
  * writes `<outDir>/<name>_<suffix>.txt` for each query. Plans are the
  * pre-execution formatted physical plans (AQE initial plan), the same
  * shape `df.explain("formatted")` prints; env SF_DIR overrides the data
  * dir (default /root/testdata/sf0.1). Queries whose result depends on
  * side-effecting table setup (lifecycle rows) still plan — the plan is
  * the FINAL query's, after the row's builds have run. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      } finally CacheScope.unpersistAll()
    }
    spark.stop()
  }
}
