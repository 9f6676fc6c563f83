package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.ops.{FuzzySearch, Histograms}
import graft.model.Tables

/** Histograms.equiDepth must be bit-identical to the ntile spec it
  * replaced AND must never plan a WindowExec — the single-partition global
  * window was the round-6 verdict's scale-killer. Same no-window guard for
  * FuzzySearch.correctTokens (round-6 verdict item 5). */
class HistogramsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** WindowExec nodes anywhere in the executed plan (same traversal as
    * PlanGuardSpec: AQE stages, cached relations, subqueries). */
  private def windows(p: SparkPlan): Seq[String] = {
    val bad = p match {
      case _: WindowExec => Seq(p.nodeName)
      case _             => Nil
    }
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case other                    => other.children
    }
    bad ++ kids.flatMap(windows) ++ p.subqueries.flatMap(windows)
  }

  /** The spec being replaced — ntile's floor-division bucket split —
    * computed DRIVER-SIDE over the collected sorted rows. (An actual
    * `ntile().over(Window.orderBy(...))` here would be an equally valid
    * reference, but Spark logs the "Moving all data to a single partition"
    * WindowExec warning for it, indistinguishable in the test log from a
    * product-plan regression; the DuckDB `a12_equidepth` oracle already
    * provides the independent cross-engine ntile check.) */
  private def ntileReference(df: org.apache.spark.sql.DataFrame,
      value: String, tiebreak: String, n: Int): Seq[(Int, Double, Double, Long)] = {
    val rows = df
      .select(col(value).cast("double").as("v"), col(tiebreak).cast("long").as("tb"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq.sorted
    val q = rows.length / n
    val r = rows.length % n
    val sizes = (1 to n).map(i => if (i <= r) q + 1 else q).filter(_ > 0)
    var idx = 0
    sizes.zipWithIndex.map { case (sz, i) =>
      val slice = rows.slice(idx, idx + sz)
      idx += sz
      (i + 1, slice.head._1, slice.last._1, sz.toLong)
    }
  }

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq

  test("equiDepth matches ntile semantics on sf0.001 orders") {
    val orders = Tables.orders(spark, sfDir)
    val got = asTuples(
      Histograms.equiDepth(orders, col("o_totalprice"), col("o_orderkey")).collect())
    val want = ntileReference(orders, "o_totalprice", "o_orderkey", 10)
    assert(got === want)
  }

  test("equiDepth matches ntile on duplicate values and N % buckets != 0") {
    import spark.implicits._
    // 137 rows, heavy value duplication — the tiebreak makes the order total
    val df = spark.range(137)
      .select((col("id") * 37 % 50).cast("double").as("v"), col("id").as("k"))
    val got = asTuples(Histograms.equiDepth(df, $"v", $"k").collect())
    val want = ntileReference(df, "v", "k", 10)
    assert(got === want)
  }

  test("equiDepth matches ntile when N < buckets") {
    import spark.implicits._
    val df = spark.range(7).select(col("id").cast("double").as("v"), col("id").as("k"))
    val got = asTuples(Histograms.equiDepth(df, $"v", $"k").collect())
    val want = ntileReference(df, "v", "k", 10)
    assert(got.size === 7 && got === want)
  }

  test("equiDepth plans no WindowExec") {
    val df = SparkEntry.queries("a12_equidepth")(spark, sfDir)
    df.collect() // finalize the adaptive plan before auditing it
    val offending = windows(df.queryExecution.executedPlan)
    assert(offending.isEmpty,
      s"a12_equidepth planned a window: ${offending.mkString(", ")}\n" +
        df.queryExecution.executedPlan)
  }

  test("equiDepth's two range-exchange consumers share ONE scan (ReusedExchange)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("a12_equidepth")(spark, sfDir)
    df.collect()
    def scans(p: SparkPlan): Int = {
      val self = p match {
        case f: FileSourceScanExec if f.toString.contains("orders") => 1
        case _ => 0
      }
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
        case other                    => other.children
      }
      self + kids.map(scans).sum
    }
    val plan = df.queryExecution.executedPlan
    val n = scans(plan) + plan.subqueries.map(scans).sum
    assert(n === 1,
      s"expected one orders scan (ranked rows + partition counts must share " +
        s"the range exchange), got $n:\n$plan")
  }

  test("equiWidth pins a zero-width range (all values equal) to bucket 0") {
    import spark.implicits._
    val df = spark.range(42).select(lit(3.25).as("v"))
    val rows = Histograms.equiWidth(df, $"v").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getInt(0) === 0 && r.getDouble(1) === 3.25 &&
      r.getDouble(2) === 3.25 && r.getLong(3) === 42L)
  }

  test("hybridRrf ranks via the triangular count join — no WindowExec") {
    val df = SparkEntry.queries("search_hybrid_rrf")(spark, sfDir)
    df.collect()
    val offending = windows(df.queryExecution.executedPlan)
    assert(offending.isEmpty,
      s"search_hybrid_rrf planned a window: ${offending.mkString(", ")}")
  }

  test("correctTokens aggregates per-token top-1 without a WindowExec") {
    val df = SparkEntry.queries("u2_token_correct")(spark, sfDir)
    df.collect()
    val offending = windows(df.queryExecution.executedPlan)
    assert(offending.isEmpty,
      s"u2_token_correct planned a window: ${offending.mkString(", ")}")
  }

  test("correctTokens top-1 keeps the (max score, min name) tie-break") {
    import spark.implicits._
    // two names at the same distance from "anna" — min name must win
    val students = Seq("annb", "annc", "zzzz").toDF("name")
    val rows = FuzzySearch.correctTokens(students, "anna", threshold = 70.0)
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "anna" && rows.head.getString(1) === "annb")
  }

  test("outliers: a planted extreme is the single 3-sigma hit; layout-stable") {
    import spark.implicits._
    val fixture = (Seq.fill(100)(10.0) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
    val out = Histograms.outliers(fixture).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 101L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    // mean = (100*10 + 1000)/101 = 19.8020 in display units
    assert(r.getAs[Double]("mean_value") === 19.802)
    CacheScope.unpersistAll()
    val again = Histograms.outliers(fixture.repartition(7)).collect().head
    assert(again.getAs[Double]("std_value") === r.getAs[Double]("std_value"))
    assert(again.getAs[Long]("n_outliers") === 1L)
    CacheScope.unpersistAll()
  }
}
