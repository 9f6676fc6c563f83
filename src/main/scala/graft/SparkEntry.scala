package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Driver contract — see SURVEY.md §7 and FIXTURES.md §B for the mapping of
  * the reference's operators onto the driver-provided parquet tables.
  *
  * Every query here is deterministic (explicit ORDER BY with full tiebreaks)
  * and every money aggregate goes through DECIMAL so the DuckDB oracle hash
  * matches bit-for-bit.
  */
object SparkEntry {

  /** Flagship: EP2 recommend_people (SURVEY.md §3) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Recommend.recommend(Tables.students(spark, "/root/testdata/sf0.001"), 1L)

  // ---------------------------------------------------------------- oracle SQL helpers

  /** students view as a CTE (kept in lockstep with Tables.students). */
  private def withStudents(rest: String): String =
    s"WITH students AS (${Tables.studentsSql}) $rest"

  /** The 4-rule edge backfill as SQL (kept in lockstep with EdgeRules). */
  private val edgesSql: String =
    Seq("college" -> "SAME_COLLEGE", "board" -> "SAME_BOARD",
        "stream" -> "SAME_STREAM", "address" -> "NEARBY")
      .map { case (a, t) =>
        s"SELECT a.id AS src, b.id AS dst, '$t' AS rel_type " +
        s"FROM students a JOIN students b " +
        s"ON lower(trim(coalesce(a.$a,''))) = lower(trim(coalesce(b.$a,''))) AND a.id < b.id " +
        s"WHERE a.$a IS NOT NULL AND b.$a IS NOT NULL " +
        s"AND lower(trim(coalesce(a.$a,''))) <> ''"
      }.mkString(" UNION ALL ")

  private val decRev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  private val fuzzyQuery = "customer#000000012"
  private def levScoreSql(colName: String) =
    s"round((1.0 - CAST(levenshtein($colName, '$fuzzyQuery') AS DOUBLE) / " +
    s"CAST(greatest(length($colName), length('$fuzzyQuery')) AS DOUBLE)) * 100.0, 4)"

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans
    "s1_students_scan" -> ((s, d) =>
      Tables.students(s, d).orderBy(col("id"))),
    "s2_point_lookup" -> ((s, d) =>
      StudentQueries.byId(Tables.students(s, d), 42L)),
    "p2_ci_name_eq" -> ((s, d) =>
      Tables.students(s, d)
        .filter(lower(col("name")) === lit("Customer#000000013".toLowerCase))),
    // §2.4 aggregations
    "a1_next_id" -> ((s, d) =>
      Tables.students(s, d)
        .agg(coalesce(max(col("id")), lit(0L)).cast("long").as("max_id"))
        .select((col("max_id") + 1).as("next_id"))),
    "a2_count" -> ((s, d) =>
      Tables.customer(s, d).agg(count(lit(1)).as("n"))),
    // §2.5 top-k
    "o3_topk_acctbal" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_acctbal"))
        .orderBy(desc("c_acctbal"), col("id")).limit(10)),
    // §2.3 joins
    "j3_recommend" -> ((s, d) =>
      Recommend.recommend(Tables.students(s, d), 1L).drop("matching_interests")),
    "j6_exists" -> ((s, d) =>
      StudentQueries.existing(
        Tables.students(s, d),
        Tables.orders(s, d).select(col("o_custkey").as("id")))
        .select(col("id")).orderBy(col("id"))),
    "edges_backfill" -> ((s, d) =>
      EdgeRules.backfill(Tables.students(s, d))
        .orderBy(col("rel_type"), col("src"), col("dst"))),
    "j2_shares_interest" -> ((s, d) =>
      EdgeRules.interestRule(Tables.partInterests(s, d))
        .orderBy(col("src"), col("dst"))),
    "j7_merge_anti" -> ((s, d) => {
      val st = Tables.students(s, d)
      EdgeRules.mergeNew(
        EdgeRules.equiRule(st.filter(col("id") < 200), "board", "SAME_BOARD"),
        EdgeRules.equiRule(st.filter(col("id") < 100), "board", "SAME_BOARD"))
        .orderBy(col("src"), col("dst"))
    }),
    "j4_pair_relationship" -> ((s, d) => {
      val st = Tables.students(s, d)
      StudentQueries.pairRelationship(
        st, EdgeRules.backfill(st), "Customer#000000000", "Customer#000000001")
    }),
    // §2.9 fuzzy search
    "fuzzy_search_lev" -> ((s, d) =>
      FuzzySearch.topK(Tables.students(s, d), fuzzyQuery,
        c => FuzzySearch.levRatio(c, lit(fuzzyQuery)))),
    "fuzzy_search_indel" -> ((s, d) => {
      IndelRatio.register(s)
      FuzzySearch.topK(Tables.students(s, d), fuzzyQuery,
        c => round(call_function("indel_ratio", c, lit(fuzzyQuery)), 4))
    }),
    // headline relational pipelines
    "q1_agg" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_top_revenue" -> ((s, d) => Relational.q3TopRevenue(s, d)),
    "q5_region_revenue" -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "set_ops" -> ((s, d) => Relational.setOps(s, d)),
  )

  /** Headline subset timed by Bench (bench runs at sf0.1). */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q3_top_revenue", "q5_region_revenue", "set_ops",
    "edges_backfill", "j2_shares_interest", "j3_recommend", "fuzzy_search_lev")

  // ---------------------------------------------------------------- oracle

  def oracleSql: Map[String, String] = Map(
    "s1_students_scan" -> withStudents("SELECT * FROM students ORDER BY id"),
    "s2_point_lookup" -> withStudents("SELECT * FROM students WHERE id = 42"),
    "p2_ci_name_eq" -> withStudents(
      "SELECT * FROM students WHERE lower(name) = lower('Customer#000000013')"),
    "a1_next_id" -> withStudents(
      "SELECT CAST(coalesce(max(id), 0) AS BIGINT) + 1 AS next_id FROM students"),
    "a2_count" -> "SELECT count(*) AS n FROM customer",
    "o3_topk_acctbal" ->
      ("SELECT c_custkey AS id, c_acctbal FROM customer " +
       "ORDER BY c_acctbal DESC, id LIMIT 10"),
    "j3_recommend" -> withStudents(
      ", s AS (SELECT * FROM students WHERE id = 1), scored AS (" +
      "SELECT o.id, o.name, " +
      "CASE WHEN lower(trim(coalesce(o.board,''))) = lower(trim(coalesce(s.board,''))) THEN 1 ELSE 0 END AS bm, " +
      "CASE WHEN lower(trim(coalesce(o.stream,''))) = lower(trim(coalesce(s.stream,''))) THEN 1 ELSE 0 END AS sm, " +
      "CASE WHEN lower(trim(coalesce(o.college,''))) = lower(trim(coalesce(s.college,''))) THEN 1 ELSE 0 END AS cm, " +
      "CASE WHEN lower(trim(coalesce(o.address,''))) = lower(trim(coalesce(s.address,''))) THEN 1 ELSE 0 END AS am " +
      "FROM students o, s WHERE o.id <> 1) " +
      "SELECT id, name, bm, sm, cm, am, " +
      "list_filter([CASE WHEN bm = 1 THEN 'board' END, CASE WHEN sm = 1 THEN 'stream' END, " +
      "CASE WHEN cm = 1 THEN 'college' END, CASE WHEN am = 1 THEN 'address' END], " +
      "x -> x IS NOT NULL) AS matched_on, " +
      "bm + sm + cm + am AS score FROM scored WHERE bm + sm + cm + am > 0 " +
      "ORDER BY score DESC, id"),
    "j6_exists" -> withStudents(
      "SELECT id FROM students st WHERE EXISTS " +
      "(SELECT 1 FROM orders o WHERE o.o_custkey = st.id) ORDER BY id"),
    "edges_backfill" -> withStudents(
      s", e AS ($edgesSql) SELECT * FROM e ORDER BY rel_type, src, dst"),
    "j2_shares_interest" ->
      ("WITH toks AS (SELECT DISTINCT p_partkey AS id, " +
       "unnest(string_split(lower(p_name), ' ')) AS tok FROM part) " +
       "SELECT a.id AS src, b.id AS dst, 'SHARES_INTEREST' AS rel_type, " +
       "list_sort(list(a.tok)) AS common " +
       "FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id " +
       "GROUP BY a.id, b.id ORDER BY src, dst"),
    "j7_merge_anti" -> withStudents(
      ", cand AS (SELECT a.id AS src, b.id AS dst, 'SAME_BOARD' AS rel_type " +
      "FROM students a JOIN students b ON a.board = b.board AND a.id < b.id " +
      "WHERE a.id < 200 AND b.id < 200) " +
      "SELECT * FROM cand c WHERE NOT EXISTS (SELECT 1 FROM cand e " +
      "WHERE e.src = c.src AND e.dst = c.dst AND e.src < 100 AND e.dst < 100) " +
      "ORDER BY src, dst"),
    "j4_pair_relationship" -> withStudents(
      s", e AS ($edgesSql), " +
      "a AS (SELECT id AS a_id, name AS a_name, college AS a_college, " +
      "board AS a_board, stream AS a_stream FROM students " +
      "WHERE lower(name) = lower('Customer#000000000')), " +
      "b AS (SELECT id AS b_id, name AS b_name, college AS b_college, " +
      "board AS b_board, stream AS b_stream FROM students " +
      "WHERE lower(name) = lower('Customer#000000001')) " +
      "SELECT a_id, a_name, b_id, b_name, e.rel_type, " +
      "CAST(a_college = b_college AS INT) AS same_college, " +
      "CAST(a_board = b_board AS INT) AS same_board, " +
      "CAST(a_stream = b_stream AS INT) AS same_stream " +
      "FROM a CROSS JOIN b LEFT JOIN e ON (e.src = a_id AND e.dst = b_id) " +
      "OR (e.src = b_id AND e.dst = a_id) ORDER BY rel_type LIMIT 25"),
    "fuzzy_search_lev" -> withStudents(
      s"SELECT id, name, ${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
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
    "set_ops" ->
      ("SELECT DISTINCT o_orderkey FROM (" +
       "SELECT o_orderkey FROM (" +
       "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "INTERSECT SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0 " +
       "EXCEPT SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_returnflag = 'R') " +
       "UNION ALL (SELECT o_orderkey FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1)) ORDER BY o_orderkey"),
  )
}
