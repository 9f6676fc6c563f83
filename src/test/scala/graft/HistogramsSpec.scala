package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
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

  /** The spec being replaced: ntile over the one-task global sort. */
  private def ntileReference(df: org.apache.spark.sql.DataFrame,
      value: String, tiebreak: String, n: Int) =
    df.select(col(value).as("v"), col(tiebreak).as("tb"))
      .withColumn("bucket", ntile(n).over(Window.orderBy(col("v"), col("tb"))))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"), count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  test("equiDepth matches ntile semantics on sf0.001 orders") {
    val orders = Tables.orders(spark, sfDir)
    val got = Histograms.equiDepth(orders, col("o_totalprice"), col("o_orderkey"))
      .collect().toSeq
    val want = ntileReference(orders, "o_totalprice", "o_orderkey", 10)
      .collect().toSeq
    assert(got === want)
  }

  test("equiDepth matches ntile on duplicate values and N % buckets != 0") {
    import spark.implicits._
    // 137 rows, heavy value duplication — the tiebreak makes the order total
    val df = spark.range(137)
      .select((col("id") * 37 % 50).cast("double").as("v"), col("id").as("k"))
    val got = Histograms.equiDepth(df, $"v", $"k").collect().toSeq
    val want = ntileReference(df, "v", "k", 10).collect().toSeq
    assert(got === want)
  }

  test("equiDepth matches ntile when N < buckets") {
    import spark.implicits._
    val df = spark.range(7).select(col("id").cast("double").as("v"), col("id").as("k"))
    val got = Histograms.equiDepth(df, $"v", $"k").collect().toSeq
    val want = ntileReference(df, "v", "k", 10).collect().toSeq
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
}
