package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional arg(1): comma-separated subset (quiet control-relative
    // adjudication runs); default = the full bench set
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.benchQueries)
    for (name <- names) {
      val t0 = System.nanoTime()
      // noop sink to match Bench's materialization semantics (count() lets
      // Catalyst prune columns and drop sorts).
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable => println(s"$name ERR ${e.getMessage}"); false }
      println(f"$name%-25s ${(System.nanoTime()-t0)/1e9}%8.2fs  ok=$ok")
      CacheScope.unpersistAll() // free views + restore scoped confs
    }
    spark.stop()
  }
}
