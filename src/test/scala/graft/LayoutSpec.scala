package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.ZValue
import graft.model.Tables
import graft.sources.Layout

/** Write-side layout: range compaction (file count / sorting / disjoint
  * ranges / size cap) and Z-ordering (every file bounds BOTH dimensions —
  * the property that lets parquet footer stats prune filters on either
  * column, which a single-column sort only provides for its own column). */
class LayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def partFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq

  test("writeRangeCompacted: n sorted files, disjoint ranges, nothing lost") {
    val orders = Tables.orders(spark, sfDir)
    val dir = Files.createTempDirectory("orders-compact").toString
    Layout.writeRangeCompacted(orders, col("o_orderkey"), dir, numFiles = 4)
    val files = partFiles(dir)
    assert(files.size === 4)
    val ranges = files.map { f =>
      val rows = spark.read.parquet(f).select(col("o_orderkey")).collect().map(_.getLong(0))
      assert(rows.toSeq === rows.sorted.toSeq, s"file $f not sorted")
      (rows.min, rows.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, "file key ranges overlap")
      case _ => ()
    }
    assert(spark.read.parquet(dir).count() === orders.count())
  }

  test("maxRecordsPerFile caps every file") {
    val orders = Tables.orders(spark, sfDir)
    val dir = Files.createTempDirectory("orders-capped").toString
    Layout.writeRangeCompacted(orders, col("o_orderkey"), dir,
      numFiles = 2, maxRecordsPerFile = 500L)
    val files = partFiles(dir)
    assert(files.size > 2, "cap should split the 2 range partitions")
    files.foreach(f => assert(spark.read.parquet(f).count() <= 500L))
  }

  test("z-ordered files bound BOTH dimensions; single-column sort does not") {
    val events = Tables.events(spark, sfDir).select(col("event_id"),
      col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("day"))

    def avgSpans(dir: String): (Double, Double) = {
      val spans = partFiles(dir).map { f =>
        val r = spark.read.parquet(f)
          .agg(max("user_id") - min("user_id"), max("day") - min("day"))
          .collect().head
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      (spans.map(_._1).sum / spans.size, spans.map(_._2).sum / spans.size)
    }

    val zDir = Files.createTempDirectory("events-z").toString
    Layout.writeZOrdered(events, col("user_id"), col("day"), zDir, numFiles = 8)
    val uDir = Files.createTempDirectory("events-u").toString
    Layout.writeRangeCompacted(events, col("user_id"), uDir, numFiles = 8)

    val (gUser, gDay) = {
      val r = events.agg(max("user_id") - min("user_id"), max("day") - min("day"))
        .collect().head
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    val (zUser, zDay) = avgSpans(zDir)
    val (uUser, uDay) = avgSpans(uDir)
    info(f"global ($gUser%.0f, $gDay%.0f)  z ($zUser%.1f, $zDay%.1f)  userSort ($uUser%.1f, $uDay%.1f)")

    // single-column layout: its own column clusters hard...
    assert(uUser <= 0.3 * gUser)
    // ...but the other dimension spans ~the whole domain in every file
    assert(uDay >= 0.8 * gDay)
    // z-layout bounds BOTH dimensions well below their global spans
    assert(zUser <= 0.75 * gUser, s"z user span $zUser vs global $gUser")
    assert(zDay <= 0.75 * gDay, s"z day span $zDay vs global $gDay")
    // and beats the single-column layout on the dimension it neglects
    assert(zDay < uDay)

    // the pruning semantics directly: a filter on one dimension can skip
    // every file whose footer [min,max] excludes the value — count
    // candidate files over every point predicate in the domain
    def candidates(dir: String, colName: String, lo: Long, hi: Long): Long = {
      val ranges = partFiles(dir).map { f =>
        val r = spark.read.parquet(f).agg(min(colName), max(colName)).collect().head
        (r.getLong(0), r.getLong(1))
      }
      (lo to hi).map(v => ranges.count { case (mn, mx) => mn <= v && v <= mx }.toLong).sum
    }
    val zDayCand = candidates(zDir, "day", 19723L, 19752L)
    val uDayCand = candidates(uDir, "day", 19723L, 19752L)
    info(s"day-predicate candidate files: z=$zDayCand userSort=$uDayCand")
    // user-sorted layout can essentially never skip a file for a day
    // predicate (tiny slack: a file may happen to miss the domain's edge)
    assert(uDayCand >= (0.95 * 30 * 8).toLong)
    assert(zDayCand <= (0.6 * uDayCand).toLong, s"z=$zDayCand u=$uDayCand")
    // round-trip: the layout never loses rows
    assert(spark.read.parquet(zDir).count() === events.count())
  }

  test("z_value interleave round-trips through deinterleave") {
    assert(ZValue.deinterleave(ZValue.compute(12345L, 67890L)) === ((12345L, 67890L)))
    assert(ZValue.compute(0L, 0L) === 0L)
    // bit b of x lands at 2b; bit b of y at 2b+1
    assert(ZValue.compute(1L, 0L) === 1L)
    assert(ZValue.compute(0L, 1L) === 2L)
    assert(ZValue.compute(3L, 1L) === (1L | 4L | 2L))
  }

  test("date-partitioned write: a week filter scans only the 7 matching dirs") {
    val events = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("datepart").toFile.getAbsolutePath
    Layout.writeDatePartitioned(events, dir)
    val nDates = events.select(to_date(col("ts"))).distinct().count()

    val filtered = spark.read.parquet(dir)
      .filter(col("event_date").between("2024-01-08", "2024-01-14"))
    val expected = events
      .filter(to_date(col("ts")).between("2024-01-08", "2024-01-14")).count()
    // execute THIS df so its scan metrics populate (count() would build
    // and execute a separate plan)
    assert(filtered.collect().length.toLong === expected)

    val scan = scans(filtered.queryExecution.executedPlan).head
    // the filter reached the partition level (pruning, not row filtering)
    assert(scan.partitionFilters.nonEmpty, "no partition filters on the scan")
    val read = scan.metrics("numPartitions").value
    assert(read === 7, s"scanned $read partition dirs, expected 7 of $nDates")
    assert(nDates > 7)
  }

  test("enforceRetention: metadata-only (ZERO Spark jobs), expired " +
      "partitions gone, survivors byte-identical") {
    val wh = Files.createTempDirectory("graft-ret-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ret_test LOCATION '$wh'")
    val t = "graft_ret_test.ev"
    val events = Tables.events(spark, sfDir)
    Layout.writeDatePartitionedTable(events, t)
    val before = spark.sql(s"SHOW PARTITIONS $t").count()
    val keptFiles = spark.table(t)
      .filter(col("event_date") >= "2024-01-08")
      .select(input_file_name()).distinct().collect().map(_.getString(0))

    // the claim: retention is DDL, not computation — no job may run
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val dropped = Layout.enforceRetention(spark, t, "event_date",
        "2024-01-08")
      Thread.sleep(1000) // listener delivery is async; let the bus drain
      assert(jobs === 0, s"retention ran $jobs Spark job(s) — not " +
        "metadata-only")
      assert(dropped.size === 7 && dropped.head === "2024-01-01" &&
        dropped.last === "2024-01-07", s"dropped: $dropped")
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(spark.sql(s"SHOW PARTITIONS $t").count() === before - 7)
    // survivors: same rows AND the same physical files (nothing rewritten)
    assert(spark.table(t).count() ===
      events.filter(to_date(col("ts")) >= "2024-01-08").count())
    val after = spark.table(t).select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(after.sorted.toSeq === keptFiles.sorted.toSeq,
      "retention rewrote surviving files")
  }

  test("backfillDay: one partition replaced, other days' files " +
      "physically untouched, re-run converges") {
    val wh = Files.createTempDirectory("graft-bf-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bf_test LOCATION '$wh'")
    val t = "graft_bf_test.ev"
    val events = Tables.events(spark, sfDir)
    Layout.writeDatePartitionedTable(events, t)
    val day = "2024-01-15"
    def otherFiles() = spark.table(t)
      .filter(col("event_date") =!= day)
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val othersBefore = otherFiles()
    val corrected = events.filter(
      to_date(col("ts")) === to_date(lit(day)) && col("user_id") % 10 =!= 7)
    val want = events.filter(
      !(to_date(col("ts")) === to_date(lit(day)) && col("user_id") % 10 === 7))
      .count()

    Layout.backfillDay(spark, t, corrected)
    assert(spark.table(t).count() === want, "backfill content wrong")
    assert(otherFiles() === othersBefore,
      "backfill rewrote files outside the target day")
    // idempotence: the re-run converges (replacement, not append)
    Layout.backfillDay(spark, t, corrected)
    assert(spark.table(t).count() === want, "re-run duplicated the day")
    assert(otherFiles() === othersBefore)
    // the session conf is restored (no dynamic-overwrite leakage)
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic"), "backfillDay leaked the overwrite mode")
  }

  test("DPP: a dim-side weekend filter prunes the fact scan at runtime") {
    val events = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("datepart-dpp").toFile.getAbsolutePath
    Layout.writeDatePartitioned(events, dir)
    val weekends = Layout.dateDim(events).filter(col("is_weekend"))
    val nWeekend = weekends.count()
    val nDates = events.select(to_date(col("ts"))).distinct().count()
    assert(nWeekend < nDates, "fixture must have non-weekend days")

    // NO date predicate on the fact — only the joined dim is filtered
    val joined = spark.read.parquet(dir)
      .join(broadcast(weekends), Seq("event_date"))
    val expected = events
      .filter(dayofweek(to_date(col("ts"))).isin(1, 7)).count()
    assert(joined.count() === expected) // correctness via a separate plan
    joined.collect()                    // execute THIS plan for metrics

    val fact = scans(joined.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.nonEmpty).head
    assert(fact.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic pruning on the fact scan: ${fact.partitionFilters}")
    assert(fact.metrics("numPartitions").value === nWeekend,
      s"fact scanned ${fact.metrics("numPartitions").value} dirs, expected $nWeekend")
  }
}
