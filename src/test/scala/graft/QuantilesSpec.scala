package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Quantiles

/** Exact-quantile bisection ([[Quantiles]]): the histogram-refinement
  * selection must land on EXACTLY the k-th smallest element
  * (k = ceil(q·n), duplicates counted) for adversarial shapes — heavy
  * duplicates, negative domains, singletons, and a wide domain forcing
  * multiple refinement passes. */
class QuantilesSpec extends SparkSpec {

  private def kth(sorted: IndexedSeq[Long], q: Double): Long =
    sorted((math.ceil(q * sorted.size) - 1).toInt)

  private def check(values: Seq[Long], qs: Seq[Double]): Unit = {
    import spark.implicits._
    val df = values.toDF("x")
    val got = Quantiles.exactQuantiles(df, col("x"), qs)
    val sorted = values.sorted.toIndexedSeq
    val want = qs.map(q => (q, kth(sorted, q)))
    assert(got === want, s"bisection diverged from sort-based selection " +
      s"on n=${values.size}")
  }

  test("uniform, duplicate-heavy, negative, and singleton domains") {
    check(1L to 100L, Seq(0.01, 0.5, 0.99, 1.0))
    check(Seq.fill(50)(7L) ++ Seq.fill(50)(9L), Seq(0.5, 0.51, 1.0))
    check((-500L to 500L by 3), Seq(0.25, 0.5, 0.75))
    check(Seq(42L), Seq(0.5, 1.0))
  }

  test("wide domain forces multi-pass refinement and stays exact") {
    // values spread over ~10^9 so one 4096-bucket pass cannot resolve
    val rng = new scala.util.Random(7)
    val values = Seq.fill(5000)(rng.nextLong() % 1000000000L)
    check(values, Seq(0.1, 0.5, 0.9, 0.999))
  }

  test("grouped bisection == per-group sort-based selection") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(3000)(i =>
      (s"g${i % 3}", rng.nextLong() % 100000L))
    val df = rows.toDF("g", "x")
    val qs = Seq(0.25, 0.5, 0.95)
    val got = Quantiles.exactQuantilesBy(df, col("g"), col("x"), qs)
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted.toIndexedSeq
      qs.map(q => (g, q, kth(sorted, q)))
    }.sortBy { case (g, q, _) => (g, q) }
    assert(got === want)
  }

  test("fixture row: priceQuantiles == window-rank selection on lineitem") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val got = Quantiles.priceQuantiles(li).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val cents = li.select((col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    val want = Quantiles.Qs.map(q => (q, kth(cents, q) / 100.0))
    assert(got === want)
  }
}
