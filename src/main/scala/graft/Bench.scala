package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * SELF-ADJUDICATING since round 20: three consecutive rounds of
  * driver-bench disputes ("is this row a regression or a loud host
  * window?") were settled by hand-run quiet-host sessions. Two artifacts
  * make the JSON adjudicate alone:
  *  - `controls`: the q1_agg control re-run every [[ControlEvery]] rows
  *    (plus suite start/end) as [row_index, sec] pairs — a mid-suite
  *    loud window shows up as a control spike ALIGNED with the over-band
  *    rows; a genuine regression reads over band against a flat series.
  *  - `io`: per-row Spark metrics deltas from a listener (shuffle
  *    read/write, memory/disk SPILL, input/output bytes, RDD block
  *    persist/checkpoint bytes to memory and disk, GC ms, task count) —
  *    separates IO-pressure rows (persist/checkpoint/table-write heavy,
  *    the r19 weak set's shared signature) from compute regressions
  *    mechanically. Deltas span the row's full best-of-2 block.
  */
object Bench {

  /** Re-run the q1 control after every this many timed rows. */
  val ControlEvery = 25

  /** Listener accumulating task-level IO totals; per-row numbers are
    * snapshot deltas around each query's timed block. Block updates for
    * RDD blocks capture what task metrics cannot: persist and
    * localCheckpoint traffic (the r19 weak rows' dominant cost). */
  private final class IoAccum extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shufRead, shufWrite, memSpill, diskSpill, input, output,
      cacheMem, cacheDisk, gcMs, tasks = new AtomicLong()

    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
        output.addAndGet(m.outputMetrics.bytesWritten)
        gcMs.addAndGet(m.jvmGCTime)
        tasks.incrementAndGet()
      }
      ()
    }

    override def onBlockUpdated(
        bu: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit = {
      val info = bu.blockUpdatedInfo
      if (info.blockId.isRDD) {
        cacheMem.addAndGet(info.memSize)
        cacheDisk.addAndGet(info.diskSize)
      }
      ()
    }

    def snapshot(): Map[String, Long] = Map(
      "shuffle_read" -> shufRead.get(), "shuffle_write" -> shufWrite.get(),
      "mem_spill" -> memSpill.get(), "disk_spill" -> diskSpill.get(),
      "input" -> input.get(), "output" -> output.get(),
      "cache_mem" -> cacheMem.get(), "cache_disk" -> cacheDisk.get(),
      "gc_ms" -> gcMs.get(), "tasks" -> tasks.get())

    /** The listener bus is ASYNC: poll until the counters go quiet so a
      * row's tail events don't bleed into the next row's delta. Bounded
      * — a busy bus only smears metrics, it must not hang the bench.
      * r21: cap 2000→500 ms (VERDICT r20 item 1b): two polls bracket every
      * row, so the worst case added 4 s/row of pure sleep to the suite
      * wall; a late event past 500 ms only smears one row's IO delta. */
    def quiesce(): Map[String, Long] = {
      var prev = snapshot()
      var stable = false
      var waited = 0
      while (!stable && waited < 500) {
        Thread.sleep(50)
        waited += 50
        val cur = snapshot()
        stable = cur == prev
        prev = cur
      }
      prev
    }
  }

  private val IoKeys = Seq("shuffle_read", "shuffle_write", "mem_spill",
    "disk_spill", "input", "output", "cache_mem", "cache_disk", "gc_ms",
    "tasks")

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
    val io = new IoAccum
    spark.sparkContext.addSparkListener(io)
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

    def runOnce(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every unused
      // column and eliminate final sorts, so it under-times the real query.
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // The interleaved control: one warm q1_agg run, recorded against the
    // index of the NEXT timed row. q1 persists nothing, so the extra runs
    // don't perturb neighbors beyond their own wall time. Exception-guarded
    // (r20 ADVICE): a transient failure inside a control run must degrade
    // to a -1 control point, not abort the suite and lose every row.
    val controls = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    def control(atRow: Int): Unit = {
      val sec =
        try runOnce("q1_agg")
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] control at $atRow failed: ${e.getMessage}")
            -1.0
        }
      controls += ((atRow, sec))
      ()
    }

    // r21 (VERDICT r20 item 1b): skip iteration 2 when iteration 1 exceeds
    // this many seconds. The rows this fires on are the write/lifecycle/
    // fixpoint rows whose warm min is the same regime as cold (they persist
    // tables or checkpoint state; nothing useful stays cached), so the
    // reported number barely moves while the suite wall drops by the sum of
    // their second iterations (~230 s at the r20 close). Override with
    // SPARK_GRAFT_BENCH_SKIP2_OVER; set it huge to restore pure best-of-2.
    val skip2Over =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SKIP2_OVER", "5.0").toDouble

    val ioRows = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Long]]
    def delta(before: Map[String, Long], after: Map[String, Long]): Map[String, Long] =
      IoKeys.map(k => k -> (after(k) - before(k))).toMap

    // Build every warm standing index BEFORE the timed loop, priced as its
    // own row: previously the suite's FIRST toucher of a shared index paid
    // the build inside its own number, so a converted query-only row's
    // reading depended on run order (r17 verdict item 1 — 6.6× phantom
    // regressions). Full-suite runs (the driver and the close) always
    // prewarm; subset runs skip it unless SPARK_GRAFT_PREWARM=1, so a solo
    // row still prices like its full-suite self via best-of-2's warm min.
    val warmBuildSec =
      if (nameArgs.isEmpty || sys.env.get("SPARK_GRAFT_PREWARM").contains("1")) {
        val pre = io.quiesce()
        val t0 = System.nanoTime()
        graft.ops.WarmIndex.prebuildAll(spark, sfDir)
        val sec = (System.nanoTime() - t0) / 1e9
        ioRows += ("warm_index_build" -> delta(pre, io.quiesce()))
        Some(sec)
      } else None
    control(0)
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]

    // Render the FULL artifact JSON from whatever has completed so far.
    // r21 (VERDICT r20 item 1a): the artifact is re-written after every row
    // so that a driver-side timeout leaves a parseable prefix — BENCH_r20
    // was rc=124 with zero numbers because the JSON was built only after
    // the whole suite. Intermediate writes carry "partial":true; the final
    // write drops it.
    def renderJson(partial: Boolean): String = {
      // warm_index_build leads the queries map (single-shot time: the
      // builds are memoized per JVM, so a best-of-2 min would read ~0 and
      // hide the cost). It counts toward the headline total — the suite
      // paid this work before too, just smeared into first-toucher rows.
      val qs = (warmBuildSec.map("\"warm_index_build\":" + _).toSeq ++
          results.map { case (k, v, _) => "\"" + k + "\":" + v })
        .mkString("{", ",", "}")
      // A failed query (-1 marker) must not DEFLATE the headline total —
      // sum only successes and surface the failure count alongside.
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
      val controlsField = ",\"controls\":" + controls
        .map { case (i, s) => s"[$i,${math.rint(s * 1000) / 1000}]" }
        .mkString("[", ",", "]")
      val ioField = ",\"io\":" + ioRows
        .map { case (name, m) =>
          "\"" + name + "\":" +
            IoKeys.map(k => "\"" + k + "\":" + m(k)).mkString("{", ",", "}")
        }
        .mkString("{", ",", "}")
      val partialField = if (partial) ",\"partial\":true" else ""
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed$coldField$controlsField$ioField$partialField,"sf":"$sfDir"}"""
    }
    def writeArtifact(partial: Boolean): String = {
      val json = renderJson(partial)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath), json + "\n")
      json
    }

    toRun.zipWithIndex.foreach { case (name, idx) =>
      if (idx > 0 && idx % ControlEvery == 0) control(idx)
      val pre = io.quiesce()
      val t1 =
        try runOnce(name)
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            // failures are flagged as -1, never reported as a (bogus) fast time
            -1.0
        }
      // Iteration 2+ runs when iteration 1 came in under the skip
      // threshold (see skip2Over above) OR the row left tracked persisted
      // views: for cache-backed rows (the inline graph family's shared
      // rule-join view, the corpus capstones' shingle views) iteration 2
      // is the warm regime their committed bands price — measured cold
      // 9–27× warm (graph_node_similarity 44.7s cold vs 1.65 warm min),
      // so skipping there would manufacture phantom regressions. For the
      // cache-free slow rows (index writes, lifecycles, fixpoints) the
      // cold number IS the reported number from r21 on.
      val times = Seq(t1) ++ {
        if (t1 >= 0 && (t1 < skip2Over || CacheScope.liveCount > 0))
          (2 to iterations).map { _ =>
            try runOnce(name)
            catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}")
                -1.0
            }
          }
        else Seq.empty
      }
      // Free operator-persisted views AFTER the query's iterations (not
      // between them: iteration 2 deliberately times the warm cache, see
      // BASELINE.md best-of-2 methodology), so queries don't accumulate
      // each other's cached blocks across the bench run.
      CacheScope.unpersistAll()
      ioRows += (name -> delta(pre, io.quiesce()))
      val sec = if (times.exists(_ < 0)) -1.0 else times.min
      results += ((name, sec, t1))
      writeArtifact(partial = true)
      // Per-row sentinel on stdout (distinct prefix from the summary's
      // BENCHJSON so a grep for either is deterministic): even a truncated
      // stdout log carries every completed row's number.
      println(s"""BENCHROW:{"name":"$name","sec":$sec,"cold":$t1}""")
    }
    control(toRun.size)
    // stdout for a human; a file for the driver — sbt prefixes stdout with
    // "[info] " which made BENCH_r01 unparseable ("parsed": null). The path
    // is cwd-relative (= repo root under sbt) and overridable via argv.
    val json = writeArtifact(partial = false)
    println(json)
    spark.stop()
    // Sentinel-prefixed copy as the very LAST stdout line (after
    // spark.stop(), so no shutdown chatter can follow it): BENCH_r17.json
    // recorded "parsed": null because the driver greps stdout and sbt's
    // "[info] " prefix plus interleaved log lines made the bare JSON line
    // unreliable. A fixed prefix makes the grep deterministic.
    println("BENCHJSON:" + json)
  }
}
