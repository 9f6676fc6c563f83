package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the documented local[32] bench target; the local[4]
    // default this replaced silently 2.5×'d the full-width pair queries
    // (see BASELINE.md "methodology trap").
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // r15: whichever query runs FIRST was still absorbing several hundred
    // ms of one-time cost the tiny nation warmup doesn't touch (driver
    // r14: q1_agg 1.66× its quiet band, purely positional) — the big-fact
    // parquet footer/stripe readers and the agg/shuffle codegen paths.
    // Warm them with a SLICE of lineitem (limit before the agg: footer +
    // codegen warm, but none of the real query's full-scan work).
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(1000).groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity")).count()
    // Best-of-2 per query: this machine carries concurrent load and per-run
    // variance is large (BASELINE.md: ±30%); the min of two back-to-back runs
    // is a far more stable regression signal than a single sample, at the
    // cost of ~2× bench wall time.
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    require(iterations >= 1,
      s"SPARK_GRAFT_BENCH_ITERS must be >= 1, got $iterations")
    // argv: [outPath.json] [queryName ...] — an arg ending in .json is the
    // output-path override (the driver's original contract); any remaining
    // args select a subset of benchQueries (local iteration aid). The two
    // were conflated once: query names became stray root-dir files.
    val (outPathArgs, nameArgs) = args.partition(_.endsWith(".json"))
    val outPath = outPathArgs.headOption.getOrElse("bench_out.json")
    val toRun =
      if (nameArgs.nonEmpty) SparkEntry.benchQueries.filter(nameArgs.toSet)
      else SparkEntry.benchQueries
    // Build every warm standing index BEFORE the timed loop, priced as its
    // own row: previously the suite's FIRST toucher of a shared index paid
    // the build inside its own number, so a converted query-only row's
    // reading depended on run order (r17 verdict item 1 — 6.6× phantom
    // regressions). Full-suite runs (the driver and the close) always
    // prewarm; subset runs skip it unless SPARK_GRAFT_PREWARM=1, so a solo
    // row still prices like its full-suite self via best-of-2's warm min.
    val warmBuildSec =
      if (nameArgs.isEmpty || sys.env.get("SPARK_GRAFT_PREWARM").contains("1")) {
        val t0 = System.nanoTime()
        graft.ops.WarmIndex.prebuildAll(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } else None
    val results = toRun.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to iterations).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune every unused
        // column and eliminate final sorts, so it under-times the real query.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            // failures are flagged as -1, never reported as a (bogus) fast time
            -1.0
        }
      }
      // Free operator-persisted views AFTER the query's iterations (not
      // between them: iteration 2 deliberately times the warm cache, see
      // BASELINE.md best-of-2 methodology), so queries don't accumulate
      // each other's cached blocks across the bench run.
      CacheScope.unpersistAll()
      (name,
        if (times.exists(_ < 0)) -1.0 else times.min,
        times.head) // iteration 1 = the cold number (-1 if it failed)
    }
    // warm_index_build leads the queries map (single-shot time: the builds
    // are memoized per JVM, so a best-of-2 min would read ~0 and hide the
    // cost). It counts toward the headline total — the suite paid this
    // work before too, just smeared into first-toucher rows.
    val qs = (warmBuildSec.map("\"warm_index_build\":" + _).toSeq ++
        results.map { case (k, v, _) => "\"" + k + "\":" + v })
      .mkString("{", ",", "}")
    // A failed query (-1 marker) must not DEFLATE the headline total — sum
    // only successes and surface the failure count alongside.
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum + warmBuildSec.getOrElse(0.0)
    // Cold-run reporting (SPARK_GRAFT_BENCH_COLD=1): iteration-1 times as
    // a SIBLING key, so warm-cache rows (q15's revenue view, the shingle
    // views, the WarmIndex query twins) get an honest first-run number
    // without touching the "queries" min the regression gate reads.
    val coldField =
      if (sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1"))
        ",\"cold\":" + results.map { case (k, _, c) => "\"" + k + "\":" + c }
          .mkString("{", ",", "}")
      else ""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed$coldField,"sf":"$sfDir"}"""
    // stdout for a human; a file for the driver — sbt prefixes stdout with
    // "[info] " which made BENCH_r01 unparseable ("parsed": null). The path
    // is cwd-relative (= repo root under sbt) and overridable via argv.
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath),
      json + "\n")
    spark.stop()
    // Sentinel-prefixed copy as the very LAST stdout line (after
    // spark.stop(), so no shutdown chatter can follow it): BENCH_r17.json
    // recorded "parsed": null because the driver greps stdout and sbt's
    // "[info] " prefix plus interleaved log lines made the bare JSON line
    // unreliable. A fixed prefix makes the grep deterministic.
    println("BENCHJSON:" + json)
  }
}
