package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session once (codegen compiler, parquet footer reader,
    // shuffle machinery) so the first timed query doesn't absorb one-time
    // JVM costs; steady-state is what BASELINE.md compares across rounds.
    spark.sql("SELECT 1").count()
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().count()
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every unused
      // column and eliminate final sorts, so it under-times the real query.
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      // failures are flagged as -1, never reported as a (bogus) fast time
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout for a human; a file for the driver — sbt prefixes stdout with
    // "[info] " which made BENCH_r01 unparseable ("parsed": null).
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/bench_out.json"), json + "\n")
    spark.stop()
  }
}
