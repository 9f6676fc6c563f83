package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Query-side shared fixtures (oracle CTE helpers live in [[OracleCtes]]).
  * Split verbatim from SparkEntry (round 17) so per-family entry files can
  * share them; members are package-public for graft.entry only by
  * convention — nothing outside the entry registration uses them. */
object EntryFixtures {
  // ---------------------------------------------------------------- oracle SQL helpers

  /** students view as a CTE (kept in lockstep with Tables.students). */
  def withStudents(rest: String): String =
    s"WITH students AS (${Tables.studentsSql}) $rest"

  /** Edge-backfill SQL over a subset of the equi rules (kept in lockstep
    * with EdgeRules.AllEquiRules / EdgeRules.backfill's toggles), over an
    * arbitrary students-shaped relation `tbl`. */
  def edgesSqlFromOn(rules: Seq[(String, String)], tbl: String): String =
    rules.map { case (a, t) =>
        s"SELECT a.id AS src, b.id AS dst, '$t' AS rel_type " +
        s"FROM $tbl a JOIN $tbl b " +
        s"ON lower(trim(coalesce(a.$a,''))) = lower(trim(coalesce(b.$a,''))) AND a.id < b.id " +
        s"WHERE a.$a IS NOT NULL AND b.$a IS NOT NULL " +
        s"AND lower(trim(coalesce(a.$a,''))) <> ''"
      }.mkString(" UNION ALL ")

  def edgesSqlFrom(rules: Seq[(String, String)]): String =
    edgesSqlFromOn(rules, "students")

  /** The full 4-rule edge backfill as SQL. */
  val edgesSql: String = edgesSqlFrom(EdgeRules.AllEquiRules)

  /** users view as a CTE (kept in lockstep with Tables.users), plus the
    * literal new-User row — MIXED case name on purpose: the oracle proves
    * User ingest does NOT lowercase (graphdb.py:32-40 has no
    * normalization, unlike the Student route). */
  def withUsers(rest: String): String =
    s"WITH users AS (${Tables.usersSql}) $rest"
  def newUserDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("Ada Lovelace", 36L)).toDF("name", "age")
  }
  val newUserSql: String =
    ", n AS (SELECT (SELECT CAST(coalesce(max(id), 0) + 1 AS BIGINT) FROM users) AS id, " +
    "'Ada Lovelace' AS name, CAST(36 AS BIGINT) AS age)"

  val decRev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  // ------------------------------------------------------------ EP1 fixtures
  // Literal new-student row for the onboarding queries — MIXED case on
  // purpose so the gate proves the F10 ingest lowercasing.
  def newStudentDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("New Student", "5", "BUILDING", "7", "3"))
      .toDF("name", "address", "college", "board", "stream")
  }
  def emptyEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel_type")
  }
  /** The same literal row as a DuckDB CTE (normalized + id assigned). */
  val newStudentSql: String =
    ", n AS (SELECT (SELECT CAST(coalesce(max(id), 0) + 1 AS BIGINT) FROM students) AS id, " +
    "lower('New Student') AS name, lower('BUILDING') AS college, lower('7') AS board, " +
    "lower('3') AS stream, lower('5') AS address)"

  // ------------------------------------------------------- skew-bench fixture
  /** Zipfian-keyed slice for the skew bench: a fixed 12000-student window
    * whose `board` is remapped to 3 values split 80/10/10 — the hot key
    * alone yields ~46M unordered pairs through the salted equi-join. */
  def skewStudents(s: SparkSession, d: String): DataFrame =
    Tables.students(s, d).filter(col("id") < 12000)
      .withColumn("board",
        when(col("id") % 10 < 8, "hot")
          .when(col("id") % 10 === 8, "warm").otherwise("cold"))

  def skewPairsChecksum(s: SparkSession, d: String): DataFrame =
    skewPairsChecksumFrom(skewStudents(s, d))

  def skewPairsChecksumFrom(students: DataFrame): DataFrame =
    EdgeRules.equiRule(students, "board", "SKEW")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("src") + col("dst")).as("checksum"))

  val skewOracleSql: String =
    ", sk AS (SELECT id, CASE WHEN id % 10 < 8 THEN 'hot' " +
    "WHEN id % 10 = 8 THEN 'warm' ELSE 'cold' END AS board " +
    "FROM students WHERE id < 12000) " +
    "SELECT count(*) AS n_pairs, CAST(sum(a.id + b.id) AS BIGINT) AS checksum " +
    "FROM sk a JOIN sk b ON a.board = b.board AND a.id < b.id"

  /** Personalized-PageRank oracle tail (appended to `withStudents`): the
    * engine's 3 scaled-integer power-iteration rounds unrolled as CTEs —
    * DuckDB forbids aggregates in a recursive term, and 3 fixed rounds
    * unroll exactly. Numbers (10^12 scale, 15/85 α split, anchor 1)
    * interpolate from [[graft.graph.GraphOps.PprScale]] and the entry's
    * literals — one derivation site per the repo rule. */
  /** Batch-PPR anchor fixture: the flagship anchor, two others, and a
    * MISSING id (degenerates to its teleport row — the negative case). */
  val pprBatchAnchors: Seq[Long] = Seq(1L, 7L, 42L, 9999999L)

  /** The (qid, node)-keyed walk chain, unrolled for `anchors` — one
    * derivation site for the single-anchor, recommend, batch, and
    * converged tails. `nRounds`/`scale` default to the fixed-k walk's
    * contract; the converged tail passes its own (and MATERIALIZED round
    * CTEs — at `PprConvMaxRounds` unrolled rounds DuckDB must not
    * re-inline the chain). */
  private def pprChain(anchors: Seq[Long], nRounds: Int = 3,
      scale: Long = graft.graph.GraphOps.PprScale,
      materialized: Boolean = false): String = {
    val tele = scale * 15 / 100
    val mat = if (materialized) "MATERIALIZED " else ""
    val rounds = (1 to nRounds).map { i =>
      s"C$i AS $mat(SELECT r.qid, u.dst AS node, " +
      "CAST(sum(((r.r // u.deg) * 85) // 100) AS BIGINT) AS r " +
      s"FROM R${i - 1} r JOIN UD u ON u.src = r.node GROUP BY r.qid, u.dst), " +
      s"R$i AS $mat(SELECT qid, node, CAST(sum(r) AS BIGINT) AS r FROM " +
      s"(SELECT qid, qid AS node, CAST($tele AS BIGINT) AS r FROM A0 " +
      s"UNION ALL SELECT qid, node, r FROM C$i) GROUP BY qid, node)"
    }.mkString(", ")
    s", e AS ($edgesSql), P AS (SELECT DISTINCT src, dst FROM e), " +
    "U0 AS (SELECT src, dst FROM P UNION ALL SELECT dst AS src, src AS dst FROM P), " +
    // the 32-smallest-dst capped adjacency — the nodeSimilarity bounded-
    // degree slice (the walk's graph, mirrored exactly)
    "U AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst, " +
    "row_number() OVER (PARTITION BY src ORDER BY dst) AS rn FROM U0) WHERE rn <= 32), " +
    "D AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM U GROUP BY src), " +
    "UD AS MATERIALIZED (SELECT u.src, u.dst, d.deg FROM U u JOIN D d ON d.src = u.src), " +
    s"A0 AS (SELECT CAST(unnest([${anchors.mkString(", ")}]) AS BIGINT) AS qid), " +
    s"R0 AS (SELECT qid, qid AS node, CAST($scale AS BIGINT) AS r FROM A0), " +
    rounds
  }

  val pprOracleTail: String = pprChain(Seq(1L)) +
    " SELECT node, r AS rank_scaled FROM R3 WHERE r > 0 " +
    "ORDER BY rank_scaled DESC, node"

  val pprBatchOracleTail: String = pprChain(pprBatchAnchors) +
    " SELECT qid, node, r AS rank_scaled FROM R3 WHERE r > 0 " +
    "ORDER BY qid, rank_scaled DESC, node"

  /** The recommend tail: same walk, minus the anchor and its TRUE 1-hop
    * neighbors (uncapped edge view — an existing edge is never
    * recommended), top-10 with the node tiebreak. */
  val pprRecommendOracleTail: String = pprChain(Seq(1L)) +
    " SELECT node, r AS rank_scaled FROM R3 WHERE r > 0 AND node <> 1 " +
    "AND node NOT IN (SELECT dst FROM e WHERE src = 1 " +
    "UNION SELECT src FROM e WHERE dst = 1) " +
    "ORDER BY rank_scaled DESC, node LIMIT 10"

  /** Converged-walk oracle: the SAME chain unrolled to the engine's
    * [[graft.graph.GraphOps.PprConvMaxRounds]] bound at
    * [[graft.graph.GraphOps.PprConvScale]] — past the exact fixpoint
    * every round is a no-op, so this equals the engine's halt state
    * whether it converged early or ran the bound out. */
  val pprConvergedOracleTail: String = {
    val n = graft.graph.GraphOps.PprConvMaxRounds
    pprChain(Seq(1L), n, graft.graph.GraphOps.PprConvScale,
      materialized = true) +
      s" SELECT node, r AS rank_scaled FROM R$n WHERE r > 0 " +
      "ORDER BY rank_scaled DESC, node"
  }

  /** Batch fixpoint-walk oracle: the SAME qid-keyed chain unrolled to the
    * bound for ALL batch anchors at once — per qid the rounds past that
    * anchor's fixpoint are no-ops, so this equals the engine's halt state
    * whether the batch halted on the slowest anchor or ran the bound out
    * (and the missing-anchor qid stays at its bare teleport row). */
  val pprConvergedBatchOracleTail: String = {
    val n = graft.graph.GraphOps.PprConvMaxRounds
    pprChain(pprBatchAnchors, n, graft.graph.GraphOps.PprConvScale,
      materialized = true) +
      s" SELECT qid, node, r AS rank_scaled FROM R$n WHERE r > 0 " +
      "ORDER BY qid, rank_scaled DESC, node"
  }

  /** Student-graph LPA oracle: 3 sync mode-of-neighbor rounds unrolled
    * over the capped equi-rule adjacency (ties to the smallest label;
    * nodes with no update keep theirs) — the chain-fixture LPA oracle's
    * rounds over the walk family's U view. MATERIALIZED stops the
    * L-chain from inlining exponentially. */
  val lpaStudentsOracleTail: String = {
    val rounds = (1 to 3).map { i =>
      s"C$i AS MATERIALIZED (SELECT u.src AS n, l.label, count(*) AS c " +
      s"FROM U u JOIN L${i - 1} l ON l.node = u.dst GROUP BY u.src, l.label), " +
      s"P$i AS MATERIALIZED (SELECT n AS node, label FROM " +
      s"(SELECT n, label, row_number() OVER (PARTITION BY n ORDER BY c DESC, label) AS rk FROM C$i) " +
      "WHERE rk = 1), " +
      s"L$i AS MATERIALIZED (SELECT node, label FROM P$i UNION ALL " +
      s"SELECT node, label FROM L${i - 1} WHERE node NOT IN (SELECT node FROM P$i))"
    }.mkString(", ")
    cappedAdjSqlOn(edgesSql) +
      ", L0 AS MATERIALIZED (SELECT id AS node, id AS label FROM students), " +
      rounds +
      " SELECT node, label FROM L3 ORDER BY node"
  }

  /** Student-graph k-core oracle: 3 unrolled degree-filter-restrict
    * rounds at k = 30 over the same capped adjacency. */
  val kcoreStudentsOracleTail: String = {
    val rounds = (1 to 3).map { i =>
      s"D$i AS MATERIALIZED (SELECT src, count(*) AS deg FROM UK${i - 1} GROUP BY src), " +
      s"S$i AS MATERIALIZED (SELECT src AS node FROM D$i WHERE deg >= 30), " +
      s"UK$i AS MATERIALIZED (SELECT u.src, u.dst FROM UK${i - 1} u " +
      s"JOIN S$i a ON a.node = u.src JOIN S$i b ON b.node = u.dst)"
    }.mkString(", ")
    cappedAdjSqlOn(edgesSql) +
      ", UK0 AS MATERIALIZED (SELECT src, dst FROM U), " +
      rounds +
      " SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM UK3 GROUP BY src ORDER BY id"
  }

  /** Capped-adjacency CTE block (e → P → U0 → U, 32-smallest slices) over
    * an edge-CTE body — the walk family's graph, shared by the PPR,
    * feature-aggregation, and stream-maintenance oracles. */
  def cappedAdjSqlOn(eBody: String): String =
    s", e AS ($eBody), P AS (SELECT DISTINCT src, dst FROM e), " +
    "U0 AS (SELECT src, dst FROM P UNION ALL SELECT dst AS src, src AS dst FROM P), " +
    "U AS (SELECT src, dst FROM (SELECT src, dst, " +
    "row_number() OVER (PARTITION BY src ORDER BY dst) AS rn FROM U0) WHERE rn <= 32)"

  /** GraphSAGE mean-aggregation oracle: two unrolled floor-division mean
    * folds over the capped adjacency — contributions = slice neighbors'
    * features + the node's own (so count = deg+1 and isolated nodes keep
    * their own feature), mirroring
    * [[graft.graph.GraphOps.featureAggregate]] exactly. */
  val featureAggOracleTail: String =
    cappedAdjSqlOn(edgesSql) +
    s", F0 AS (SELECT id AS node, CAST(length(name) AS BIGINT) * ${graft.graph.GraphOps.FeatScale} AS f FROM students), " +
    "C1 AS (SELECT u.src AS node, f.f FROM U u JOIN F0 f ON f.node = u.dst " +
    "UNION ALL SELECT node, f FROM F0), " +
    "H1 AS (SELECT node, CAST(sum(f) // count(f) AS BIGINT) AS f FROM C1 GROUP BY node), " +
    "C2 AS (SELECT u.src AS node, h.f FROM U u JOIN H1 h ON h.node = u.dst " +
    "UNION ALL SELECT node, f FROM H1), " +
    "H2 AS (SELECT node, CAST(sum(f) // count(f) AS BIGINT) AS f FROM C2 GROUP BY node) " +
    "SELECT f0.node, f0.f AS f0, h1.f AS h1, h2.f AS h2 " +
    "FROM F0 f0 JOIN H1 h1 ON h1.node = f0.node " +
    "JOIN H2 h2 ON h2.node = f0.node ORDER BY f0.node"

  /** The two streamed students for `stream_adj_ingest`, ids assigned
    * MAX+1/MAX+2 at run time. n1 carries only the fixture-unique college,
    * so its ONLY possible edge is to n2; n2 additionally shares address
    * '5' with the corpus. The n1–n2 edge therefore exists iff batch 2 saw
    * a corpus that batch 1 had already grown — the stream==batch proof. */
  def newStreamStudents(s: SparkSession, n1: Long, n2: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("name", StringType, false),
      StructField("college", StringType, true),
      StructField("board", StringType, true),
      StructField("stream", StringType, true),
      StructField("address", StringType, true)))
    s.createDataFrame(Seq(
      Row(n1, "new one", "zzonlyus", null, null, null),
      Row(n2, "new two", "zzonlyus", null, null, "5")).asJava, schema)
  }

  /** `stream_adj_ingest` oracle: the post-ingest capped adjacency
    * recomputed FROM SCRATCH over students + the two streamed rows
    * (literals kept in lockstep with [[newStreamStudents]]), restricted
    * to the slices the engine emits — the new nodes' own + every slice
    * that holds a new id. */
  val streamAdjOracleTail: String =
    ", mx AS (SELECT CAST(max(id) AS BIGINT) AS m FROM students), " +
    "n1 AS (SELECT m + 1 AS id, 'new one' AS name, 'zzonlyus' AS college, " +
    "CAST(NULL AS VARCHAR) AS board, CAST(NULL AS VARCHAR) AS stream, " +
    "CAST(NULL AS VARCHAR) AS address FROM mx), " +
    "n2 AS (SELECT m + 2 AS id, 'new two' AS name, 'zzonlyus' AS college, " +
    "CAST(NULL AS VARCHAR) AS board, CAST(NULL AS VARCHAR) AS stream, " +
    "'5' AS address FROM mx), " +
    "s2 AS (SELECT id, name, college, board, stream, address FROM students " +
    "UNION ALL SELECT * FROM n1 UNION ALL SELECT * FROM n2)" +
    cappedAdjSqlOn(edgesSqlFromOn(EdgeRules.AllEquiRules, "s2")) +
    ", NW AS (SELECT id FROM n1 UNION ALL SELECT id FROM n2) " +
    "SELECT DISTINCT u.src, u.dst FROM U u " +
    "WHERE u.src IN (SELECT id FROM NW) " +
    "OR u.src IN (SELECT src FROM U WHERE dst IN (SELECT id FROM NW)) " +
    "ORDER BY src, dst"

  /** Rule-count-WEIGHTED PPR oracle tail: the capped adjacency carries
    * w = |rules connecting the pair| (P keeps rel_type, so U0 has one
    * row per rule per direction and WA's count is the rule multiset);
    * each unrolled round mirrors the engine's
    * (((r·w) div Σw)·85) div 100 exactly. */
  val pprWeightedOracleTail: String = {
    val scale = graft.graph.GraphOps.PprScale
    val tele = scale * 15 / 100
    val rounds = (1 to 3).map { i =>
      s"C$i AS (SELECT u.dst AS node, " +
      "CAST(sum((((r.r * u.w) // u.sumw) * 85) // 100) AS BIGINT) AS r " +
      s"FROM R${i - 1} r JOIN UD u ON u.src = r.node GROUP BY u.dst), " +
      s"R$i AS (SELECT node, CAST(sum(r) AS BIGINT) AS r FROM " +
      s"(SELECT CAST(1 AS BIGINT) AS node, CAST($tele AS BIGINT) AS r " +
      s"UNION ALL SELECT node, r FROM C$i) GROUP BY node)"
    }.mkString(", ")
    s", e AS ($edgesSql), P AS (SELECT DISTINCT src, dst, rel_type FROM e), " +
    "U0 AS (SELECT src, dst FROM P UNION ALL SELECT dst AS src, src AS dst FROM P), " +
    "WA AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM U0 GROUP BY src, dst), " +
    "U AS (SELECT src, dst, w FROM (SELECT src, dst, w, " +
    "row_number() OVER (PARTITION BY src ORDER BY dst) AS rn FROM WA) WHERE rn <= 32), " +
    "D AS (SELECT src, CAST(sum(w) AS BIGINT) AS sumw FROM U GROUP BY src), " +
    "UD AS (SELECT u.src, u.dst, u.w, d.sumw FROM U u JOIN D d ON d.src = u.src), " +
    s"R0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST($scale AS BIGINT) AS r), " +
    rounds +
    " SELECT node, r AS rank_scaled FROM R3 WHERE r > 0 " +
    "ORDER BY rank_scaled DESC, node"
  }

  val fuzzyQuery = "customer#000000012"
  /** Batch fuzzy fixture: an exact name, a typo'd name, and garbage
    * (must return zero rows for qid 2 — the negative case rides along). */
  val batchFuzzyQueries: Seq[(Long, String)] = Seq(
    0L -> "customer#000000012", 1L -> "custoner#000000011",
    2L -> "xyzzy#0000")
  val tokenQuestion =
    "who is customr#000000042 nearby custoner#000000011 and friends"
  /** Batch BM25 fixture: the QueryTerms anchor, a disjoint term set, a
    * no-hit query (zero rows ride along), and a duplicate-term query
    * (per-query terms dedup — each term scores once). */
  val batchBm25Queries: Seq[(Long, String)] = Seq(
    0L -> "spark shuffle hash", 1L -> "vector join merge",
    2L -> "zzznope", 3L -> "scan scan filter")
  /** Filtered-ANN fixture knobs — ONE derivation site for the query
    * entries AND their oracle SQL (the entries pass these explicitly and
    * the oracles interpolate them, so changing a knob cannot silently
    * desynchronize the two sides). ~10% selectivity at the fixture's 10
    * labels. */
  val FiltNQ = 8
  val FiltK = 3
  val FiltNprobe = 2
  val FiltWiden = 3
  val filtPredSql = "ec.label = 3"
  /** Selectivity-sweep predicates (tag, engine Column, oracle SQL) —
    * one site so the engine sweep and its oracle cannot diverge:
    * ~10% (one of 10 labels) and ~3.3% (label ∧ vec_id mod 3). */
  val filtSweep: Seq[(String, org.apache.spark.sql.Column, String)] =
    Seq(("sel10", col("label") === 3, "ec.label = 3"),
      ("sel03", col("label") === 3 && col("vec_id") % 3 === 0,
        "ec.label = 3 AND ec.vec_id % 3 = 0"))
  /** Epoch targets for the upsampling-mixture row: >1 (repeat), clean
    * fractional (2.25 → whole 2 + 64/256; 0.5 → 128/256), drop (0.0),
    * and every unlisted source passes at exactly 1 epoch. ONE derivation
    * site: the oracle's (whole, extra256) integers are computed from
    * THIS map below, never restated. */
  val epochFixture: Seq[(String, Double)] =
    Seq("src1" -> 2.25, "src2" -> 0.5, "src4" -> 0.0)
  /** The same map as DuckDB VALUES rows of exact integers. */
  val epochDimSql: String = epochFixture.map { case (s, e) =>
    val whole = math.floor(e).toLong
    s"('$s', $whole, ${math.round((e - whole) * 256)})"
  }.mkString("(VALUES ", ", ", ") AS W(source, whole, extra256)")

  def levScoreSql(colName: String) =
    s"round((1.0 - CAST(levenshtein($colName, '$fuzzyQuery') AS DOUBLE) / " +
    s"CAST(greatest(length($colName), length('$fuzzyQuery')) AS DOUBLE)) * 100.0, 4)"

}
