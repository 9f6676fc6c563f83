package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Window functions, pivots, graph algorithms, streaming windows/joins.
  * Rows split verbatim from SparkEntry (round 17); composed back in
  * [[graft.SparkEntry.queries]] / [[graft.SparkEntry.oracleSql]]. */
object WindowsGraphEntry {
  import EntryFixtures._
  import OracleCtes._

  /** Weighted-SSSP fixpoint oracle (shared by the hop-bounded and the
    * convergence-detected rows — both reach the same fixpoint on this
    * fixture): (node, dist) STATES recurse under UNION (set semantics
    * dedups, so the state space is |block| × bounded dists), min per node
    * at the end = the unbounded weighted fixpoint. The bounded engine
    * form equals it because 4 hops cover the block's weighted-shortest
    * diameter from anchor 1; the converged form equals it by definition. */
  private val sspFixpointOracleSql: String = {
    val cb = chainBlock
    "WITH RECURSIVE E AS (" +
    "SELECT a.c_custkey AS src, b.c_custkey AS dst, CAST(2 AS BIGINT) AS w " +
    s"FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1 " +
    s"WHERE a.c_custkey % $cb <> ${cb - 1} " +
    "UNION ALL SELECT b.c_custkey, a.c_custkey, CAST(2 AS BIGINT) " +
    s"FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1 " +
    s"WHERE a.c_custkey % $cb <> ${cb - 1} " +
    "UNION ALL SELECT a.c_custkey, b.c_custkey, CAST(5 AS BIGINT) " +
    s"FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 3 " +
    s"WHERE a.c_custkey % $cb <= ${cb - 4} " +
    "UNION ALL SELECT b.c_custkey, a.c_custkey, CAST(5 AS BIGINT) " +
    s"FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 3 " +
    s"WHERE a.c_custkey % $cb <= ${cb - 4}), " +
    "S AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist " +
    "UNION " +
    "SELECT E.dst AS node, S.dist + E.w AS dist FROM S JOIN E ON E.src = S.node " +
    "WHERE S.dist < 30) " +
    "SELECT node, min(dist) AS dist FROM S GROUP BY node ORDER BY node"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f5_keepcase_intersect" -> ((s, d) => {
      val rawWords = split(
        regexp_replace(trim(col("text")), s"${Dedup.WsClass}+", " "), " ")
      Tables.documents(s, d).select(col("doc_id"),
        array_join(graft.functions.Norm.intersectKeepLeft(
          rawWords, array(lit("THE"), lit("Of"), lit("and"), lit("IS"))), "|").as("kept"))
        .orderBy(col("doc_id"))
    }),
    // S6 batch property update (sync_lowercase) as a pure read query: an
    // upper-cased students view pushed through the real copy-on-write op.
    "s6_sync_lowercase" -> ((s, d) => {
      val shouting = Tables.students(s, d).withColumn("name", upper(col("name")))
      Ingest.syncLowercase(shouting)._1.orderBy(col("id"))
    }),
    "s7_ping" -> ((s, _) => s.sql("SELECT 1 AS ok")),
    "f13_json_shape" -> ((s, d) =>
      Tables.students(s, d)
        .select(col("id"), to_json(struct(col("id"), col("name"))).as("payload"))
        .orderBy(col("id")).limit(20)),
    // time windows / sessionization (batch form of the streaming surface)
    "w1_event_windows" -> ((s, d) => Windows.tumblingCounts(Tables.events(s, d))),
    "w2_sessionize" -> ((s, d) => Windows.sessionize(Tables.events(s, d))),
    "w3_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day"))),
    // unpivot/melt — the inverse relational operator of w3's pivot: the
    // wide per-day table melts back to (day, event_type, n) long form.
    "w7_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("day")), types.map(col).toArray, "event_type", "n")
        .orderBy(col("day"), col("event_type"))
    }),
    "a6_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),
    "a8_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),
    "stream_event_windows" -> ((s, d) =>
      graft.streaming.Streams.windowedEventCounts(Tables.events(s, d))
        .orderBy(col("hour"), col("event_type"))),
    // GraphX analytics
    "graph_cc" -> ((s, d) =>
      graft.graph.GraphOps.connectedComponents(s, Tables.customer(s, d))),
    "graph_degrees" -> ((s, d) =>
      graft.graph.GraphOps.degrees(s, Tables.customer(s, d))),
    "graph_pagerank" -> ((s, d) =>
      graft.graph.GraphOps.pageRank(s, Tables.customer(s, d))),
    "graph_khop" -> ((s, d) =>
      graft.graph.GraphOps.kHop(s, Tables.customer(s, d), 7L)),
    // Chain-shaped k-hop: Pregel genuinely iterates (max dist 7 from anchor
    // 7 in blocks of 10), unlike the star's 0/1/2 closed form.
    "graph_khop_chain" -> ((s, d) =>
      graft.graph.GraphOps.kHopChain(s, Tables.customer(s, d), 7L)),
    // WEIGHTED shortest paths (bounded Bellman-Ford): the chain blocks
    // with an express lane (locals w=2, skips w=5) — relaxation faces
    // real route choices, resolved by the min fold. maxHops=4 covers the
    // block's weighted-shortest diameter from the anchor (spec-pinned),
    // so the bounded result equals the oracle's unbounded fixpoint.
    "graph_shortest_path" -> ((s, d) =>
      graft.graph.GraphOps.shortestPathsBounded(
        graft.graph.GraphOps.weightedChainEdges(Tables.customer(s, d)),
        1L, 4)),
    // The FIXPOINT form: frontier-only relaxation, halting when a round
    // improves no distance (one isEmpty action per round — the Pregel
    // halt). Same fixture, same oracle, NO hop bound: exact on any
    // diameter, where the bounded form is exact only to its k.
    "graph_shortest_path_converged" -> ((s, d) =>
      graft.graph.GraphOps.shortestPathsConverged(
        graft.graph.GraphOps.weightedChainEdges(Tables.customer(s, d)), 1L)),
    // Synchronous label propagation (k = 3 mode-of-neighbor folds, ties
    // to the smallest label) over the chain+express fixture — fixed k is
    // the contract (sync LPA 2-colors a path and oscillates; no fixpoint)
    "graph_label_prop" -> ((s, d) =>
      graft.graph.GraphOps.labelPropagation(s, Tables.customer(s, d))),
    // Bounded k-core peeling (3 synchronous remove-below-k rounds) over
    // the same fixture — monotone upper bound, exact if converged
    "graph_kcore" -> ((s, d) =>
      graft.graph.GraphOps.kCore(s, Tables.customer(s, d))),
    // Path reconstruction (relationships(p), llm_cypher.py:211-216): the
    // ordered edge list of each shortest path, serialized src->dst|... for
    // the driver gate.
    "graph_khop_paths" -> ((s, d) =>
      graft.graph.GraphOps.kHopChainPaths(s, Tables.customer(s, d), 7L)
        .withColumn("path", array_join(
          transform(col("path"), e =>
            concat(e("src").cast("string"), lit("->"), e("dst").cast("string"))),
          "|"))),
    // Stream-stream interval join, batch form (stream==batch parity is
    // spec-proven in StreamingSpec; this registers the attribution shape
    // under the DuckDB oracle).
    "stream_attribution" -> ((s, d) => {
      val e = Tables.events(s, d)
      graft.streaming.Streams.purchasesAfterClicks(e, e)
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),
    // Native session_window (batch form; stream==batch parity in
    // StreamingSpec) — the streaming-native sessionization next to the
    // window-function form w2_sessionize.
    "stream_session_window" -> ((s, d) =>
      graft.streaming.Streams.sessionWindows(Tables.events(s, d))
        .orderBy(col("user_id"), col("session_start"))),
    // Unattributed-clicks variant: the left-outer interval join (distinct
    // streaming operator — null-padded rows emit on watermark expiry).
    "stream_attribution_outer" -> ((s, d) => {
      val e = Tables.events(s, d)
      graft.streaming.Streams.purchasesAfterClicks(e, e, "left_outer")
        .orderBy(asc_nulls_first("user_id"), asc_nulls_first("click_id"),
          asc_nulls_first("purchase_id"))
    }),
    // Stream-static enrichment join, batch form (stream==batch parity in
    // StreamingSpec): the zero-state streaming join type, dim side static.
    "stream_enrich" -> ((s, d) =>
      graft.streaming.Streams.enrichedEventCounts(
        Tables.events(s, d), Tables.customer(s, d))
        .orderBy(col("hour"), col("nation"))),
    // Sliding windows (the remaining §2.8 window type next to tumbling/
    // session): 1h length, 15min slide.
    "w5_sliding_counts" -> ((s, d) =>
      graft.streaming.Streams.slidingEventCounts(Tables.events(s, d))
        .orderBy(col("win_start"), col("event_type"))),
    // multimodal plumbing (stubbed decode)
  )

  def oracleSql: Map[String, String] = Map(
    "f5_keepcase_intersect" ->
      (s"SELECT doc_id, coalesce(array_to_string(list_filter(" +
       "string_split(regexp_replace(trim(coalesce(text, '')), '[ \\t\\n\\f\\r]+', ' ', 'g'), ' '), " +
       "x -> list_contains(['the','of','and','is'], lower(trim(x)))), '|'), '') AS kept " +
       "FROM documents ORDER BY doc_id"),
    "s6_sync_lowercase" -> withStudents(
      "SELECT id, lower(upper(name)) AS name, lower(college) AS college, " +
      "lower(board) AS board, lower(stream) AS stream, address " +
      "FROM students ORDER BY id"),
    "s7_ping" -> "SELECT 1 AS ok",
    "f13_json_shape" -> withStudents(
      "SELECT id, CAST(to_json(struct_pack(id := id, name := name)) AS VARCHAR) AS payload " +
      "FROM students ORDER BY id LIMIT 20"),
    "w1_event_windows" -> eventWindowsSql,
    "stream_event_windows" -> eventWindowsSql,
    "w3_pivot" ->
      ("SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, " +
       "count(*) FILTER (event_type = 'click') AS click, " +
       "count(*) FILTER (event_type = 'error') AS error, " +
       "count(*) FILTER (event_type = 'purchase') AS purchase, " +
       "count(*) FILTER (event_type = 'signup') AS signup, " +
       "count(*) FILTER (event_type = 'view') AS view " +
       "FROM events GROUP BY day ORDER BY day"),
    "w7_unpivot" ->
      ("WITH D AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, " +
       "event_type, count(*) AS c FROM events GROUP BY 1, 2), " +
       "DAYS AS (SELECT DISTINCT day FROM D), " +
       "T AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type) " +
       "SELECT d.day, t.event_type, CAST(coalesce(c.c, 0) AS BIGINT) AS n " +
       "FROM DAYS d CROSS JOIN T t " +
       "LEFT JOIN D c ON c.day = d.day AND c.event_type = t.event_type " +
       "ORDER BY d.day, t.event_type"),
    "a8_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
       "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "a6_rollup" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
       "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
       "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),
    "w2_sessionize" ->
      ("WITH S AS (SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec, " +
       "lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_sec " +
       "FROM events), " +
       "N AS (SELECT user_id, ts, sec, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session FROM S), " +
       "X AS (SELECT user_id, ts, sec, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM N) " +
       "SELECT user_id, session_idx, count(*) AS n_events, " +
       "strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start, " +
       "max(sec) - min(sec) AS duration_sec " +
       "FROM X GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),
    "graph_cc" ->
      ("SELECT c_custkey AS id, min(c_custkey) OVER " +
       "(PARTITION BY c_nationkey, c_mktsegment) AS component " +
       "FROM customer ORDER BY id"),
    "graph_khop" ->
      ("WITH G AS (SELECT c_custkey AS id, min(c_custkey) OVER " +
       "(PARTITION BY c_nationkey, c_mktsegment) AS hub FROM customer), " +
       "A AS (SELECT id, hub FROM G WHERE id = 7) " +
       "SELECT g.id, CAST(CASE WHEN g.id = a.id THEN 0 " +
       "WHEN g.id = g.hub OR a.id = a.hub THEN 1 ELSE 2 END AS INT) AS dist " +
       "FROM G g CROSS JOIN A a WHERE g.hub = a.hub ORDER BY g.id"),
    // Closed form for static PageRank(resetProb 0.15) on the star
    // construction: leaves/isolated vertices converge to 0.15 after one
    // iteration (no in-edges), hubs to 0.15 + 0.85*0.15*(n-1) after two
    // (each of the n-1 leaves sends rank/outDeg = 0.15); GraphX then
    // normalizes so ranks sum to the vertex count. Verified value-for-value
    // against GraphX output at sf0.001.
    "graph_pagerank" ->
      ("WITH G AS (SELECT c_custkey AS id, min(c_custkey) OVER " +
       "(PARTITION BY c_nationkey, c_mktsegment) AS hub, " +
       "count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n FROM customer), " +
       "U AS (SELECT id, CASE WHEN id = hub THEN 0.15 + 0.85 * 0.15 * (n - 1) " +
       "ELSE 0.15 END AS u FROM G), " +
       "F AS (SELECT count(*) / sum(u) AS f FROM U) " +
       "SELECT id, round(u * f, 4) AS rank FROM U, F ORDER BY id"),
    "graph_degrees" ->
      ("WITH G AS (SELECT c_custkey AS id, " +
       "min(c_custkey) OVER (PARTITION BY c_nationkey, c_mktsegment) AS hub, " +
       "count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n FROM customer) " +
       "SELECT id, CAST(CASE WHEN id = hub THEN n - 1 ELSE 1 END AS INT) AS degree " +
       "FROM G WHERE n > 1 ORDER BY id"),
    // image rows are REAL 24-bit BMPs decoded by ImageIO, so width/height
    // are the synthesized dims (id%7+1, id%5+1) and byte_len the BMP
    // closed form 54 + padded-row-len * h; audio/video stay stub-decoded
    // from the leading md5 bytes
  ) ++ Map(
    "graph_khop_chain" ->
      ("WITH RECURSIVE E AS (" +
       "SELECT a.c_custkey AS src, b.c_custkey AS dst FROM customer a " +
       s"JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % $chainBlock <> ${chainBlock - 1} " +
       "UNION ALL " +
       "SELECT b.c_custkey AS src, a.c_custkey AS dst FROM customer a " +
       s"JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % $chainBlock <> ${chainBlock - 1}), " +
       "BFS AS (SELECT CAST(7 AS BIGINT) AS id, 0 AS dist " +
       "UNION " +
       "SELECT E.dst AS id, BFS.dist + 1 AS dist FROM BFS JOIN E ON E.src = BFS.id " +
       "WHERE BFS.dist < 30) " +
       "SELECT id, CAST(min(dist) AS INT) AS dist FROM BFS GROUP BY id ORDER BY id"),
    // synchronous LPA: 3 mode-of-neighbor rounds unrolled (DuckDB
    // recursive CTEs forbid the per-round aggregate); MATERIALIZED stops
    // the L-chain from inlining exponentially
    "graph_label_prop" -> {
      val rounds = (1 to 3).map { i =>
        s"C$i AS MATERIALIZED (SELECT u.src AS n, l.label, count(*) AS c " +
        s"FROM U u JOIN L${i - 1} l ON l.node = u.dst GROUP BY u.src, l.label), " +
        s"P$i AS MATERIALIZED (SELECT n AS node, label FROM " +
        s"(SELECT n, label, row_number() OVER (PARTITION BY n ORDER BY c DESC, label) AS rk FROM C$i) " +
        "WHERE rk = 1), " +
        s"L$i AS MATERIALIZED (SELECT node, label FROM P$i UNION ALL " +
        s"SELECT node, label FROM L${i - 1} WHERE node NOT IN (SELECT node FROM P$i))"
      }.mkString(", ")
      "WITH E0 AS MATERIALIZED (" +
      "SELECT a.c_custkey AS src, b.c_custkey AS dst FROM customer a " +
      s"JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % $chainBlock <> ${chainBlock - 1} " +
      "UNION ALL " +
      "SELECT a.c_custkey AS src, b.c_custkey AS dst FROM customer a " +
      s"JOIN customer b ON b.c_custkey = a.c_custkey + 3 WHERE a.c_custkey % $chainBlock <= ${chainBlock - 4}), " +
      "U AS MATERIALIZED (SELECT src, dst FROM E0 UNION ALL SELECT dst AS src, src AS dst FROM E0), " +
      "L0 AS MATERIALIZED (SELECT c_custkey AS node, c_custkey AS label FROM customer), " +
      rounds +
      " SELECT node, label FROM L3 ORDER BY node"
    },
    // k-core peeling: 3 unrolled degree-filter-restrict rounds over the
    // same chain+express undirected view
    "graph_kcore" -> {
      val rounds = (1 to 3).map { i =>
        s"D$i AS MATERIALIZED (SELECT src, count(*) AS deg FROM U${i - 1} GROUP BY src), " +
        s"S$i AS MATERIALIZED (SELECT src AS node FROM D$i WHERE deg >= 3), " +
        s"U$i AS MATERIALIZED (SELECT u.src, u.dst FROM U${i - 1} u " +
        s"JOIN S$i a ON a.node = u.src JOIN S$i b ON b.node = u.dst)"
      }.mkString(", ")
      "WITH E0 AS MATERIALIZED (" +
      "SELECT a.c_custkey AS src, b.c_custkey AS dst FROM customer a " +
      s"JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % $chainBlock <> ${chainBlock - 1} " +
      "UNION ALL " +
      "SELECT a.c_custkey AS src, b.c_custkey AS dst FROM customer a " +
      s"JOIN customer b ON b.c_custkey = a.c_custkey + 3 WHERE a.c_custkey % $chainBlock <= ${chainBlock - 4}), " +
      "U0 AS MATERIALIZED (SELECT src, dst FROM E0 UNION ALL SELECT dst AS src, src AS dst FROM E0), " +
      rounds +
      " SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM U3 GROUP BY src ORDER BY id"
    },
    // weighted SSSP: (node, dist) STATES recurse under UNION (set
    // semantics dedups, so the state space is |block| x bounded dists),
    // min per node at the end = the unbounded weighted fixpoint — equal
    // to the engine's 4-round bounded fold because 4 covers the block's
    // weighted-shortest diameter from anchor 1
    "graph_shortest_path" -> sspFixpointOracleSql,
    // the converged engine form reaches the SAME unbounded fixpoint the
    // recursive-CTE oracle computes — identical SQL by construction
    "graph_shortest_path_converged" -> sspFixpointOracleSql,
    // Path-accumulating BFS: walks (not states) are enumerated, so UNION ALL
    // is correct and the dist bound terminates the recursion — on the chain
    // graph walks of length <= 9 from one anchor are a few hundred rows.
    // arg_min picks the (unique) shortest walk's edge list per node.
    "graph_khop_paths" ->
      ("WITH RECURSIVE E AS (" +
       "SELECT a.c_custkey AS src, b.c_custkey AS dst FROM customer a " +
       s"JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % $chainBlock <> ${chainBlock - 1} " +
       "UNION ALL " +
       "SELECT b.c_custkey AS src, a.c_custkey AS dst FROM customer a " +
       s"JOIN customer b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % $chainBlock <> ${chainBlock - 1}), " +
       "BFS AS (SELECT CAST(7 AS BIGINT) AS id, 0 AS dist, CAST('' AS VARCHAR) AS path " +
       "UNION ALL " +
       "SELECT E.dst AS id, BFS.dist + 1 AS dist, " +
       "path || (CASE WHEN path = '' THEN '' ELSE '|' END) || " +
       "CAST(BFS.id AS VARCHAR) || '->' || CAST(E.dst AS VARCHAR) AS path " +
       "FROM BFS JOIN E ON E.src = BFS.id " +
       s"WHERE BFS.dist < ${chainBlock - 1}) " +
       "SELECT id, CAST(min(dist) AS INT) AS dist, arg_min(path, dist) AS path " +
       "FROM BFS GROUP BY id ORDER BY id"),
    // Sliding-window membership via k-range expansion: window starts are
    // the 900s multiples in ((sec-3600)/900, sec/900]; boundaries are
    // integral seconds, so floored-sec membership is exact even for
    // fractional event times.
    "w5_sliding_counts" ->
      ("WITH E AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
       "W AS (SELECT event_type, unnest(range(CAST(floor((sec - 3600) / 900.0) AS BIGINT) + 1, " +
       "CAST(floor(sec / 900.0) AS BIGINT) + 1)) AS k FROM E) " +
       "SELECT strftime(make_timestamp(k * 900 * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start, " +
       "event_type, count(*) AS n FROM W GROUP BY 1, 2 ORDER BY win_start, event_type"),
    // Gap computed on raw timestamps (not floored seconds): session_window
    // merges at microsecond precision, so the oracle must too.
    "stream_session_window" ->
      ("WITH S AS (SELECT user_id, ts, " +
       "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), " +
       "N AS (SELECT user_id, ts, CASE WHEN prev_ts IS NULL OR " +
       "ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session FROM S), " +
       "X AS (SELECT user_id, ts, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM N) " +
       "SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start, " +
       "strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end, " +
       "count(*) AS n_events FROM X GROUP BY user_id, session_idx " +
       "ORDER BY user_id, session_start"),
    "stream_attribution" ->
      ("WITH C AS (SELECT user_id, event_id AS click_id, ts AS click_ts " +
       "FROM events WHERE event_type = 'click'), " +
       "P AS (SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts " +
       "FROM events WHERE event_type = 'purchase') " +
       "SELECT user_id, click_id, purchase_id FROM C JOIN P ON user_id = p_user " +
       "AND purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 1 HOUR " +
       "ORDER BY user_id, click_id, purchase_id"),
    "stream_attribution_outer" ->
      ("WITH C AS (SELECT user_id, event_id AS click_id, ts AS click_ts " +
       "FROM events WHERE event_type = 'click'), " +
       "P AS (SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts " +
       "FROM events WHERE event_type = 'purchase') " +
       "SELECT user_id, click_id, purchase_id FROM C LEFT JOIN P ON user_id = p_user " +
       "AND purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 1 HOUR " +
       "ORDER BY user_id, click_id, purchase_id"),
    "stream_enrich" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, " +
       "c_nationkey AS nation, count(*) AS n " +
       "FROM events e JOIN customer c ON c.c_custkey = e.user_id " +
       "GROUP BY 1, 2 ORDER BY hour, nation"),
    // Markup construction mirrored verbatim; \n and \t are real characters
    // in both engines' literals (DuckDB standard strings don't interpret
    // backslashes, so the Scala-level escape is what lands in the SQL).
  )
}
