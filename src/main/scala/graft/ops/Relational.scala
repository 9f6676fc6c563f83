package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Headline relational pipelines over the TPC-H-ish driver tables — the
  * scan → filter → join → aggregate → top-k surface (SURVEY.md §2.2-§2.5)
  * at bench scale.
  *
  * Money math is done in DECIMAL(18,2) and cast to DOUBLE at the end: decimal
  * aggregation is exact and associative, so results are identical across
  * partition orders (and across engines — the DuckDB oracle does the same),
  * while the final double keeps the output schema simple.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact discounted revenue: extendedprice * (1 - discount) in decimals. */
  def revenue: Column = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** TPC-H Q1-shaped pricing summary: hash aggregate with map-side partial
    * aggregation; the only shuffle is on the 6-value group key. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(revenue).cast("double").as("sum_disc_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped top-k revenue per order for one segment. The
    * customer→orders join keys are pre-filtered on the dimension side;
    * orderBy+limit plans as TakeOrderedAndProject (no global sort). */
  def q3TopRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    // No broadcast hint on customer: it grows with the data (unlike true
    // dims); Catalyst/AQE picks BHJ while it fits and SMJ beyond that.
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), revenue.as("rev"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped per-nation revenue: lineitem joined to three broadcast
    * dimensions — ONE shuffle total (the final group-by), because every
    * dimension is broadcast. */
  def q5NationRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, sfDir).select("r_regionkey")
    Tables.lineitem(spark, sfDir).select(col("l_suppkey"), revenue.as("rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q7-shaped bi-directional trade volume: fact joined to two
    * broadcast nation dims through supplier and customer⋈orders, grouped by
    * (supp_nation, cust_nation, year). */
  def q7Volume(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("yr"), revenue.as("rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("yr"))
      .agg(sum(col("rev")).cast("double").as("volume"), count(lit(1)).as("n"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
  }

  /** TPC-H Q9-shaped profit: revenue minus a retail-price-based cost,
    * by supplier nation and year; part filter pushed to the dim scan. */
  def q9Profit(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), dec(col("p_retailprice")).as("cost"))
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), year(col("l_shipdate")).as("yr"),
        revenue.as("rev"), dec(col("l_quantity")).as("qty"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("yr"))
      .agg(sum(col("rev") - col("cost") * col("qty")).cast("double").as("profit"))
      .orderBy(col("n_name"), col("yr"))
  }

  /** TPC-H Q18-shaped large orders: HAVING on a fact aggregate, then a
    * semi-join-shaped enrichment back through orders⋈customer. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 150) // HAVING
    Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        col("total_qty").cast("double").as("total_qty"),
        col("o_totalprice"))
      .orderBy(desc("total_qty"), col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q4-shaped EXISTS aggregation: orders with at least one returned
    * line (left-semi join — the EXISTS plan shape), counted per priority.
    * The semi-join build side carries only the join key. */
  def q4PriorityExists(spark: SparkSession, sfDir: String): DataFrame = {
    val returned = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"))
    Tables.orders(spark, sfDir)
      .join(returned, Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q10-shaped returned-item reporting: lost revenue per customer
    * over returned lines, top 20 — fact filter first, broadcast nation,
    * TakeOrderedAndProject for the cut. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenue.as("rev"))
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q6-shaped forecasting: pure filter + aggregate, no joins — the
    * canonical pushdown showcase (every predicate reaches the scan). */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")) === 1996 &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q14-shaped promo-revenue ratio: conditional aggregation (two
    * sums over one pass) against a broadcast part dim. */
  def q14PromoEffect(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), revenue.as("rev"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        round((sum(when(col("p_type").startsWith("PROMO"), col("rev"))
            .otherwise(lit(BigDecimal(0)))).cast("double") * 100.0 /
          sum(col("rev")).cast("double")), 6).as("promo_pct"),
        count(lit(1)).as("n"))
  }

  /** Set-ops surface (SURVEY.md §2.6 extension): urgent orders ∩ big orders,
    * minus orders with any returned lineitem, ∪ the single largest order.
    * Exercises intersect / except / union as distinct-set operators. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val big = o.filter(col("o_totalprice") > 150000.0).select("o_orderkey")
    val returned = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey").as("o_orderkey"))
    val top1 = o.orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(1).select("o_orderkey")
    urgent.intersect(big).except(returned).union(top1)
      .distinct()
      .orderBy(col("o_orderkey"))
  }
}
