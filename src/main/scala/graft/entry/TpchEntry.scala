package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Relational sweep: TPC-H q1-q22, set ops, distinct aggs, order ranks (§2.6).
  * Rows split verbatim from SparkEntry (round 17); composed back in
  * [[graft.SparkEntry.queries]] / [[graft.SparkEntry.oracleSql]]. */
object TpchEntry {
  import EntryFixtures._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_top_revenue" -> ((s, d) => Relational.q3TopRevenue(s, d)),
    "q5_region_revenue" -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "q7_volume" -> ((s, d) => Relational.q7Volume(s, d)),
    "q9_profit" -> ((s, d) => Relational.q9Profit(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q4_priority_exists" -> ((s, d) => Relational.q4PriorityExists(s, d)),
    "q6_forecast_revenue" -> ((s, d) => Relational.q6ForecastRevenue(s, d)),
    "q10_returned_items" -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q14_promo_effect" -> ((s, d) => Relational.q14PromoEffect(s, d)),
    "q2_top_acctbal" -> ((s, d) => Relational.q2TopAcctbalPerNation(s, d)),
    "q8_market_share" -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q11_important_parts" -> ((s, d) => Relational.q11ImportantParts(s, d)),
    "q12_priority_class" -> ((s, d) => Relational.q12PriorityByStatus(s, d)),
    "q13_order_distribution" -> ((s, d) => Relational.q13OrderDistribution(s, d)),
    "q15_top_supplier" -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q16_supplier_cnt" -> ((s, d) => Relational.q16SupplierCount(s, d)),
    "q17_small_qty_revenue" -> ((s, d) => Relational.q17SmallQtyRevenue(s, d)),
    "q19_disjunctive" -> ((s, d) => Relational.q19Disjunctive(s, d)),
    "q20_recent_concentration" -> ((s, d) => Relational.q20RecentConcentration(s, d)),
    "q21_sole_returner" -> ((s, d) => Relational.q21SoleReturner(s, d)),
    "q22_idle_customers" -> ((s, d) => Relational.q22IdleCustomers(s, d)),
    "set_ops" -> ((s, d) => Relational.setOps(s, d)),
    // multi-DISTINCT aggregate (Expand-based plan) + window-function breadth
    "a7_distinct_agg" -> ((s, d) =>
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n"))),
    "w4_order_ranks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(byPrice).as("price_rn"),
        ntile(4).over(byDate).as("quartile"),
        lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"))
        .filter(col("price_rn") <= 3)
        .orderBy(col("o_custkey"), col("price_rn"))
    }),
    // training-data pipeline: dedup
  )

  def oracleSql: Map[String, String] = Map(
    "q4_priority_exists" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM orders o " +
       "WHERE EXISTS (SELECT 1 FROM lineitem l " +
       "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q6_forecast_revenue" ->
      ("SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
       "count(*) AS n FROM lineitem " +
       "WHERE year(l_shipdate) = 1996 AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q14_promo_effect" ->
      (s"SELECT round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $decRev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 / " +
       s"CAST(sum($decRev) AS DOUBLE), 6) AS promo_pct, count(*) AS n " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey"),
    "q10_returned_items" ->
      (s"SELECT c_custkey, c_name, n_name, CAST(sum($decRev) AS DOUBLE) AS revenue " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "WHERE l_returnflag = 'R' GROUP BY c_custkey, c_name, n_name " +
       "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "a7_distinct_agg" ->
      ("SELECT count(DISTINCT o_custkey) AS n_cust, " +
       "count(DISTINCT o_orderpriority) AS n_prio, " +
       "count(DISTINCT year(o_orderdate)) AS n_years, count(*) AS n FROM orders"),
    "w4_order_ranks" ->
      ("WITH W AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
       "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rn, " +
       "CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile, " +
       "lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price, " +
       "lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price " +
       "FROM orders) " +
       "SELECT * FROM W WHERE price_rn <= 3 ORDER BY o_custkey, price_rn"),
  ) ++ Map(
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
       "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base, " +
       s"CAST(sum($decRev) AS DOUBLE) AS sum_disc_price, " +
       "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus " +
       "ORDER BY l_returnflag, l_linestatus"),
    "q3_top_revenue" ->
      (s"SELECT o_orderkey, CAST(sum($decRev) AS DOUBLE) AS revenue " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON l_orderkey = o_orderkey " +
       "WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderkey " +
       "ORDER BY revenue DESC, o_orderkey LIMIT 10"),
    "q5_region_revenue" ->
      (s"SELECT n_name, CAST(sum($decRev) AS DOUBLE) AS revenue, count(*) AS n_items " +
       "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "GROUP BY n_name ORDER BY n_name"),
    "q7_volume" ->
      ("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
       "year(l_shipdate) AS yr, " +
       s"CAST(sum($decRev) AS DOUBLE) AS volume, count(*) AS n " +
       "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
       "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
       "WHERE n1.n_name <> n2.n_name " +
       "GROUP BY supp_nation, cust_nation, yr ORDER BY supp_nation, cust_nation, yr"),
    "q9_profit" ->
      ("SELECT n_name, year(l_shipdate) AS yr, " +
       s"CAST(sum($decRev - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "WHERE p_name LIKE '%widget%' " +
       "GROUP BY n_name, yr ORDER BY n_name, yr"),
    "q18_large_orders" ->
      ("WITH BIG AS (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty " +
       "FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) " +
       "SELECT c_custkey, o_orderkey, CAST(total_qty AS DOUBLE) AS total_qty, o_totalprice " +
       "FROM orders JOIN BIG ON o_orderkey = l_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "ORDER BY total_qty DESC, o_orderkey LIMIT 20"),
    "set_ops" ->
      ("SELECT DISTINCT o_orderkey FROM (" +
       "SELECT o_orderkey FROM (" +
       "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "INTERSECT SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0 " +
       "EXCEPT SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_returnflag = 'R') " +
       "UNION ALL (SELECT o_orderkey FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1)) ORDER BY o_orderkey"),
    "q2_top_acctbal" ->
      ("WITH MX AS (SELECT c_nationkey AS nk, max(c_acctbal) AS max_bal " +
       "FROM customer GROUP BY c_nationkey) " +
       "SELECT n_name, c_custkey, c_name, c_acctbal FROM customer " +
       "JOIN MX ON c_nationkey = nk AND c_acctbal = max_bal " +
       "JOIN nation ON c_nationkey = n_nationkey ORDER BY n_name, c_custkey"),
    "q8_market_share" ->
      ("SELECT year(o_orderdate) AS yr, " +
       s"round(CAST(sum(CASE WHEN n_name = 'NATION_3' THEN $decRev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) / " +
       s"CAST(sum($decRev) AS DOUBLE), 6) AS mkt_share, count(*) AS n " +
       "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE r_name = 'EUROPE' GROUP BY yr ORDER BY yr"),
    "q11_important_parts" ->
      ("WITH LI AS (SELECT l_partkey, " +
       "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem), " +
       "PER AS (SELECT l_partkey, sum(v) AS value FROM LI GROUP BY l_partkey), " +
       "TOT AS (SELECT sum(v) AS total FROM LI) " +
       "SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM PER, TOT " +
       "WHERE value * 2000 > total ORDER BY value DESC, l_partkey"),
    "q12_priority_class" ->
      ("SELECT l_linestatus, " +
       "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY l_linestatus ORDER BY l_linestatus"),
    "q13_order_distribution" ->
      ("WITH PER AS (SELECT c_custkey, count(o_orderkey) AS c_count " +
       "FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) " +
       "SELECT c_count, count(*) AS custdist FROM PER GROUP BY c_count " +
       "ORDER BY custdist DESC, c_count DESC"),
    "q15_top_supplier" ->
      (s"WITH REV AS (SELECT l_suppkey, sum($decRev) AS total_rev FROM lineitem " +
       "WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01' " +
       "GROUP BY l_suppkey), " +
       "MX AS (SELECT max(total_rev) AS mx FROM REV) " +
       "SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev " +
       "FROM supplier JOIN REV ON s_suppkey = l_suppkey, MX " +
       "WHERE total_rev = mx ORDER BY s_suppkey"),
    "q16_supplier_cnt" ->
      ("SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' " +
       "AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
       "AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_acctbal < 0 AND s_suppkey = l_suppkey) " +
       "GROUP BY p_brand, p_type, p_size " +
       "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q17_small_qty_revenue" ->
      ("WITH LI AS (SELECT l_partkey, l_quantity, l_extendedprice " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#3'), " +
       "A AS (SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty, " +
       "count(*) AS cnt FROM LI GROUP BY l_partkey) " +
       "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly, " +
       "count(*) AS n FROM LI JOIN A ON l_partkey = pk " +
       "WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty"),
    "q19_disjunctive" ->
      (s"SELECT CAST(sum($decRev) AS DOUBLE) AS revenue, count(*) AS n " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) " +
       "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) " +
       "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"),
    "q20_recent_concentration" ->
      ("WITH PS AS (SELECT l_suppkey, l_partkey, " +
       "sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty, " +
       "sum(CASE WHEN year(l_shipdate) = 1996 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty96 " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "WHERE p_name LIKE '%widget%' GROUP BY l_suppkey, l_partkey) " +
       "SELECT s_suppkey, s_name, count(*) AS n_conc FROM supplier " +
       "JOIN PS ON l_suppkey = s_suppkey WHERE qty96 * 2 > total_qty " +
       "GROUP BY s_suppkey, s_name ORDER BY s_suppkey"),
    "q21_sole_returner" ->
      ("WITH PAIRS AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem), " +
       "RET AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') " +
       "SELECT s_name, count(*) AS numwait FROM RET r " +
       "JOIN supplier ON r.l_suppkey = s_suppkey " +
       "WHERE EXISTS (SELECT 1 FROM PAIRS p WHERE p.l_orderkey = r.l_orderkey AND p.l_suppkey <> r.l_suppkey) " +
       "AND NOT EXISTS (SELECT 1 FROM RET r2 WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey) " +
       "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"),
    "q22_idle_customers" ->
      ("WITH T AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal, count(*) AS cnt " +
       "FROM customer WHERE c_acctbal > 0) " +
       "SELECT n_name, count(*) AS numcust, " +
       "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal " +
       "FROM customer c JOIN nation ON c_nationkey = n_nationkey, T " +
       "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
       s"AND o.o_orderdate >= DATE '${graft.ops.Relational.IdleCutoff}') " +
       "AND CAST(c_acctbal AS DECIMAL(18,2)) * cnt > sum_bal " +
       "GROUP BY n_name ORDER BY n_name"),
    // BFS over the undirected chain graph as a recursive CTE; UNION (not
    // UNION ALL) dedupes (id, dist) states so the recursion terminates.
  )
}
