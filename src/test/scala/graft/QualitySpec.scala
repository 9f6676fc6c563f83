package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Quality
import graft.sources.Layout

/** The data-quality gate: all row rules in ONE scan (plan-asserted),
  * exact violation counts for uniqueness/FK on crafted corruptions,
  * documented null semantics, and partition-gap detection that never
  * scans the fact. */
class QualitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("checkRows: N rules, ONE scan; counts exact; null comparisons " +
      "pass silently unless notNull is used (documented)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, -5L), (3L, null), (4L, -1L))
      .toDF("id", "v")
    val out = Quality.checkRows(df, Seq(
      Quality.RowRule("positive(v)", col("v") <= 0),
      Quality.notNull("v"),
      Quality.RowRule("id_range", col("id") > 100)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the null v row passes positive(v) — three-valued logic — and is
    // caught by the explicit notNull rule instead
    assert(out === Map("positive(v)" -> 2L, "not_null(v)" -> 1L,
      "id_range" -> 0L))

    val plan = Quality.checkRows(Tables.orders(spark, sfDir), Seq(
      Quality.RowRule("a", col("o_totalprice") <= 0),
      Quality.RowRule("b", col("o_custkey").isNull),
      Quality.RowRule("c", col("o_orderkey") < 0)))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"3 row rules cost $scans scans, want 1:\n$plan")
  }

  test("checkUnique counts EXCESS rows; checkFk counts orphans via a " +
      "broadcast anti join") {
    import spark.implicits._
    val child = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 99L), (3L, 10L))
      .toDF("k", "ref")
    val parent = Seq(10L, 11L).toDF("p")
    val uniq = Quality.checkUnique(child, Seq("k")).collect()(0)
    assert(uniq.getString(0) === "unique(k)" && uniq.getLong(1) === 2L,
      s"k=1 has 3 rows -> 2 excess, got ${uniq.getLong(1)}")
    val fk = Quality.checkFk(child, "ref", parent, "p")
    assert(fk.collect()(0).getLong(1) === 1L, "one orphan (ref=99)")
    val plan = fk.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"FK check not a broadcast anti join:\n$plan")
  }

  test("checkRowsBy: stratified counts in ONE scan; checkFreshness " +
      "answers from the catalog alone") {
    import spark.implicits._
    val df = Seq((("a"), 10L), (("a"), -5L), (("b"), -1L), (("b"), 2L))
      .toDF("g", "v")
    val out = Quality.checkRowsBy(df, Seq("g"), Seq(
      Quality.RowRule("positive(v)", col("v") <= 0),
      Quality.notNull("v")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("a", "positive(v)") -> 1L, ("a", "not_null(v)") -> 0L,
      ("b", "positive(v)") -> 1L, ("b", "not_null(v)") -> 0L))
    val plan = Quality.checkRowsBy(Tables.orders(spark, sfDir),
      Seq("o_orderpriority"), Seq(
        Quality.RowRule("a", col("o_totalprice") <= 0),
        Quality.RowRule("b", col("o_custkey").isNull)))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length === 1,
      s"stratified rules must still cost one scan:\n$plan")

    val wh = java.nio.file.Files.createTempDirectory("graft-qf-wh")
      .toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_qf_test LOCATION '$wh'")
    val t = "graft_qf_test.ev"
    Layout.writeDatePartitionedTable(Tables.events(spark, sfDir), t)
    val fresh = Quality.checkFreshness(spark, t, "2024-01-30")
    val row = fresh.collect()(0)
    assert(row.getBoolean(2), "table with day 30 landed must be fresh")
    assert(!Quality.checkFreshness(spark, t, "2024-02-01")
      .collect()(0).getBoolean(2), "watermark past the data must be stale")
    assert(!fresh.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "freshness check scanned data")
  }

  test("checkPartitionGaps: finds exactly the missing days, and its " +
      "plan never scans the fact table") {
    val wh = java.nio.file.Files.createTempDirectory("graft-qp-wh")
      .toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_qp_test LOCATION '$wh'")
    val t = "graft_qp_test.ev"
    val ev = Tables.events(spark, sfDir).filter(
      !to_date(col("ts")).isin("2024-01-05", "2024-01-06", "2024-01-21"))
    Layout.writeDatePartitionedTable(ev, t)
    val gaps = Quality.checkPartitionGaps(spark, t)
    assert(gaps.collect().map(_.getDate(0).toString).toSeq ===
      Seq("2024-01-05", "2024-01-06", "2024-01-21"))
    // the gap report derives from catalog metadata: no parquet scan
    val plan = gaps.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"gap detection scanned data:\n$plan")
  }

  test("checkVolumeTrend: flags the >2x drop and spike, judges only full-" +
      "history days, and the median baseline shrugs off single bad days") {
    import spark.implicits._
    // 20 uniform days of 100 rows, day 12 cut to 30 (drop), day 16
    // tripled to 300 (spike)
    val rows = (1 to 20).flatMap { day =>
      val n = if (day == 12) 30 else if (day == 16) 300 else 100
      (1 to n).map(i => (f"2024-02-$day%02d", i))
    }
    val df = rows.toDF("ds", "i").withColumn("d", to_date(col("ds")))
    val out = Quality.checkVolumeTrend(df, col("d"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getString(3))).toSeq
    assert(out === Seq(
      ("2024-02-12", 30L, 100L, "drop"),
      ("2024-02-16", 300L, 100L, "spike")))
    // days 13-19 carry the bad days in their trailing history: the
    // MEDIAN baseline stays 100 (one outlier of seven), so none flag.
    // days 1-8 are unjudged (no full 7-day history)
    val early = Quality.checkVolumeTrend(
      df.filter(col("d") <= "2024-02-08"), col("d"))
    assert(early.count() === 0)
  }

  test("distDrift: identical frames score 0; a wholesale length shift flags") {
    import spark.implicits._
    def corpus(len: Int) = (1L to 200L)
      .map(i => (i, Seq.fill(len + (i % 3).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val a = corpus(10)
    val same = Quality.distDrift(a, corpus(10)).collect()(0)
    assert(same.getAs[Long]("chi2_scaled") === 0L)
    assert(!same.getAs[Boolean]("drifted"))
    // every doc jumps two bins (10-12 -> 40-42 tokens): full mass moves
    val far = Quality.distDrift(a, corpus(40)).collect()(0)
    assert(far.getAs[Boolean]("drifted"),
      s"wholesale shift not flagged: ${far.getAs[Long]("chi2_scaled")}")
    assert(far.getAs[Long]("chi2_scaled") > same.getAs[Long]("chi2_scaled"))
  }
}
