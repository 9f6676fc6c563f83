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

  // ------------------------------------------------------------ EP1 fixtures
  // Literal new-student row for the onboarding queries — MIXED case on
  // purpose so the gate proves the F10 ingest lowercasing.
  private def newStudentDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("New Student", "5", "BUILDING", "7", "3"))
      .toDF("name", "address", "college", "board", "stream")
  }
  private def emptyEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel_type")
  }
  /** The same literal row as a DuckDB CTE (normalized + id assigned). */
  private val newStudentSql: String =
    ", n AS (SELECT (SELECT CAST(coalesce(max(id), 0) + 1 AS BIGINT) FROM students) AS id, " +
    "lower('New Student') AS name, lower('BUILDING') AS college, lower('7') AS board, " +
    "lower('3') AS stream, lower('5') AS address)"

  // ------------------------------------------------------- skew-bench fixture
  /** Zipfian-keyed slice for the skew bench: a fixed 12000-student window
    * whose `board` is remapped to 3 values split 80/10/10 — the hot key
    * alone yields ~46M unordered pairs through the salted equi-join. */
  private def skewStudents(s: SparkSession, d: String): DataFrame =
    Tables.students(s, d).filter(col("id") < 12000)
      .withColumn("board",
        when(col("id") % 10 < 8, "hot")
          .when(col("id") % 10 === 8, "warm").otherwise("cold"))

  private def skewPairsChecksum(s: SparkSession, d: String): DataFrame =
    skewPairsChecksumFrom(skewStudents(s, d))

  private def skewPairsChecksumFrom(students: DataFrame): DataFrame =
    EdgeRules.equiRule(students, "board", "SKEW")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("src") + col("dst")).as("checksum"))

  private val skewOracleSql: String =
    ", sk AS (SELECT id, CASE WHEN id % 10 < 8 THEN 'hot' " +
    "WHEN id % 10 = 8 THEN 'warm' ELSE 'cold' END AS board " +
    "FROM students WHERE id < 12000) " +
    "SELECT count(*) AS n_pairs, CAST(sum(a.id + b.id) AS BIGINT) AS checksum " +
    "FROM sk a JOIN sk b ON a.board = b.board AND a.id < b.id"

  private val fuzzyQuery = "customer#000000012"
  /** Batch fuzzy fixture: an exact name, a typo'd name, and garbage
    * (must return zero rows for qid 2 — the negative case rides along). */
  private val batchFuzzyQueries: Seq[(Long, String)] = Seq(
    0L -> "customer#000000012", 1L -> "custoner#000000011",
    2L -> "xyzzy#0000")
  private val tokenQuestion =
    "who is customr#000000042 nearby custoner#000000011 and friends"
  /** Batch BM25 fixture: the QueryTerms anchor, a disjoint term set, a
    * no-hit query (zero rows ride along), and a duplicate-term query
    * (per-query terms dedup — each term scores once). */
  private val batchBm25Queries: Seq[(Long, String)] = Seq(
    0L -> "spark shuffle hash", 1L -> "vector join merge",
    2L -> "zzznope", 3L -> "scan scan filter")
  /** Filtered-ANN fixture knobs — ONE derivation site for the query
    * entries AND their oracle SQL (the entries pass these explicitly and
    * the oracles interpolate them, so changing a knob cannot silently
    * desynchronize the two sides). ~10% selectivity at the fixture's 10
    * labels. */
  private val FiltNQ = 8
  private val FiltK = 3
  private val FiltNprobe = 2
  private val FiltWiden = 3
  private val filtPredSql = "ec.label = 3"
  /** Selectivity-sweep predicates (tag, engine Column, oracle SQL) —
    * one site so the engine sweep and its oracle cannot diverge:
    * ~10% (one of 10 labels) and ~3.3% (label ∧ vec_id mod 3). */
  private val filtSweep: Seq[(String, org.apache.spark.sql.Column, String)] =
    Seq(("sel10", col("label") === 3, "ec.label = 3"),
      ("sel03", col("label") === 3 && col("vec_id") % 3 === 0,
        "ec.label = 3 AND ec.vec_id % 3 = 0"))
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
    // ARRAY outputs are serialized to '|'-joined strings for the driver's
    // oracle gate (pandas sort_values can't hash numpy arrays); the array
    // forms stay covered by GoldenFixtureSpec.
    "j3_recommend" -> ((s, d) =>
      Recommend.recommend(Tables.students(s, d), 1L)
        .withColumn("matched_on", array_join(col("matched_on"), "|"))
        .withColumn("interests", array_join(col("interests"), "|"))
        .drop("matching_interests")),
    // The endpoint's response envelope (student_routes.py:46-62),
    // assembled engine-side; the 0/1/2-name grammar branches (vacuous at
    // oracle SF) are golden-tested on the fixture in GoldenFixtureSpec.
    "recommend_message" -> ((s, d) =>
      Recommend.responseMessage(Recommend.recommend(Tables.students(s, d), 1L))),
    // U4's deterministic renderer over a small detail result, and its
    // single-count fast-path (llm_cypher.py:258-261) — the non-LLM half of
    // result-to-text, engine-side.
    "u4_explain_students" -> ((s, d) =>
      StudentQueries.explainStudents(Tables.students(s, d).filter(col("id") < 5))),
    "u4_explain_count" -> ((s, d) =>
      Tables.students(s, d).agg(count(lit(1)).as("n"))
        .select(concat(lit("There are "), col("n"),
          lit(" students matching your query in the database.")).as("response"))),
    "j6_exists" -> ((s, d) =>
      StudentQueries.existing(
        Tables.students(s, d),
        Tables.orders(s, d).select(col("o_custkey").as("id")))
        .select(col("id")).orderBy(col("id"))),
    // No final orderBy on the pair-explosion queries: the driver's gate
    // canonicalizes row order itself (its pandas sort_values is what crashed
    // on arrays in round 1), and a global total-order over tens of millions
    // of edge rows is pure overhead nobody would run at 100 TB.
    "edges_backfill" -> ((s, d) => EdgeRules.backfill(Tables.students(s, d))),
    // DETACH DELETE (beyond-reference: the reference has no delete
    // endpoint) — node removal takes every incident edge with it in one
    // pushed-predicate pass over the edge table; output = the surviving
    // edges, the part a dangling-edge bug would corrupt
    "ingest_detach_delete" -> ((s, d) => {
      val st = Tables.students(s, d)
      val (_, edges) = Ingest.detachDelete(st, EdgeRules.backfill(st), 3L)
      edges.orderBy(col("rel_type"), col("src"), col("dst"))
    }),
    // Skew-resilience evidence (round-4 verdict item 8): the same salted
    // pair join driven by a deliberately Zipfian 3-value key (80/10/10 over
    // a FIXED 12k-student slice — a controlled workload, identical at every
    // SF, so salted vs salt=1 is an apples-to-apples recorded number in the
    // bench). Output is a 1-row count+checksum: the ~46M-pair explosion is
    // fully produced and map-side-aggregated, while the oracle compare
    // stays one row.
    "edges_skew_salted" -> ((s, d) => skewPairsChecksum(s, d)),
    "edges_skew_unsalted" -> ((s, d) => {
      // salt=1 is read at plan-construction time (the salt is baked into
      // literals), so the conf can be restored before returning.
      val prev = s.conf.getOption(EdgeRules.PairSaltConf)
      s.conf.set(EdgeRules.PairSaltConf, "1")
      try skewPairsChecksum(s, d)
      finally prev.fold(s.conf.unset(EdgeRules.PairSaltConf))(v =>
        s.conf.set(EdgeRules.PairSaltConf, v))
    }),
    // third skew variant: NO structural salt (salt=1, the control), but
    // AQE's skew-join allowed to split the hot partition — forced SMJ
    // (broadcast off) because skew split only applies to shuffle joins,
    // thresholds lowered to sf0.1 byte sizes (the 256MB defaults are
    // cluster-scale). Execution-time confs ride scopedConf: restored at
    // the driver's query boundary, AFTER the plan actually runs.
    "edges_skew_aqe" -> ((s, d) => {
      graft.CacheScope.scopedConf(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB")
      // both are plan-construction confs (baked into the returned plan as
      // literals/shape), so restoring them immediately is safe
      val prevSalt = s.conf.getOption(EdgeRules.PairSaltConf)
      val prevMan = s.conf.getOption(EdgeRules.PairManualShuffleConf)
      s.conf.set(EdgeRules.PairSaltConf, "1")
      s.conf.set(EdgeRules.PairManualShuffleConf, "false")
      // round-robin the input across 32 mappers first: AQE splits a skewed
      // reduce partition at MAP-OUTPUT-BLOCK granularity, and this
      // fixture's single 300KB parquet scans as ONE map task — an
      // unsplittable single block. A real cluster has thousands of
      // mappers; the pre-shuffle stands in for that.
      try skewPairsChecksumFrom(skewStudents(s, d).repartition(32))
      finally {
        prevSalt.fold(s.conf.unset(EdgeRules.PairSaltConf))(v =>
          s.conf.set(EdgeRules.PairSaltConf, v))
        prevMan.fold(s.conf.unset(EdgeRules.PairManualShuffleConf))(v =>
          s.conf.set(EdgeRules.PairManualShuffleConf, v))
      }
    }),
    "j2_shares_interest" -> ((s, d) =>
      EdgeRules.interestRule(Tables.partInterests(s, d))
        .withColumn("common", array_join(col("common"), "|"))), // see j3 note
    // Scale-bounded J2 variant (the one benched at sf0.1): df-capped token
    // pairs over documents words. The uncapped all-pairs form above keeps
    // the reference's exact semantics for the sf0.01 oracle.
    "j2_rare_token_pairs" -> ((s, d) =>
      EdgeRules.interestRuleCapped(
        Tables.documents(s, d)
          .select(col("doc_id").as("id"), Dedup.words(col("text")).as("interests")),
        maxDf = 250L)
        .withColumn("common", array_join(col("common"), "|"))),
    "j7_merge_anti" -> ((s, d) => {
      val st = Tables.students(s, d)
      EdgeRules.mergeNew(
        EdgeRules.equiRule(st.filter(col("id") < 200), "board", "SAME_BOARD"),
        EdgeRules.equiRule(st.filter(col("id") < 100), "board", "SAME_BOARD"))
        .orderBy(col("src"), col("dst"))
    }),
    "j4_pair_relationship" -> ((s, d) => {
      val st = Tables.students(s, d)
      // Edge table carries SHARES_INTEREST edges (with their `common`
      // property) alongside the 4-rule backfill, so properties(rel)
      // parity is non-trivially exercised (F9): the named pair (ids 0, 1)
      // shares the synthetic interest token p0. The student side carries
      // interests too, so the template's common_interests projection
      // (llm_cypher.py:99) is exercised as well.
      //
      // Pushdown: a point template only needs edges INCIDENT TO THE TWO
      // NAMED STUDENTS, and every edge rule is pairwise-local (attr
      // equality / interest overlap read nothing but the two rows), so
      // running the rules on the name-filtered 2-row subset yields
      // byte-identical edges to filtering the full backfill — without
      // materializing the corpus-wide pair explosion per probe (a stored
      // graph's index lookup, expressed as rule-input pruning; the full
      // backfill keeps its own bench rows). Oracle unchanged: it still
      // derives the edge from the full SQL backfill.
      val names = Seq("Customer#000000000", "Customer#000000001")
      val stPair = st.filter(lower(col("name")).isin(names.map(_.toLowerCase): _*))
      // the pair-explosion machinery (salt fan-out + manual repartition)
      // is pure stage overhead on a 2-row rule input — plan-construction
      // confs, baked into the built plan, restored before returning
      val prevSalt = s.conf.getOption(EdgeRules.PairSaltConf)
      val prevMan = s.conf.getOption(EdgeRules.PairManualShuffleConf)
      s.conf.set(EdgeRules.PairSaltConf, "1")
      s.conf.set(EdgeRules.PairManualShuffleConf, "false")
      val edges =
        try EdgeRules.backfill(stPair)
          .withColumn("common", lit(null).cast("array<string>"))
          .unionByName(EdgeRules.interestRule(
            Tables.studentInterests(s, d).join(
              broadcast(stPair.select(col("id"))), Seq("id"), "left_semi")))
        finally {
          prevSalt.fold(s.conf.unset(EdgeRules.PairSaltConf))(v =>
            s.conf.set(EdgeRules.PairSaltConf, v))
          prevMan.fold(s.conf.unset(EdgeRules.PairManualShuffleConf))(v =>
            s.conf.set(EdgeRules.PairManualShuffleConf, v))
        }
      StudentQueries.pairRelationship(
        st.join(Tables.studentInterests(s, d), Seq("id")),
        edges, names.head, names(1))
        .withColumn("common", array_join(col("common"), "|"))
        .withColumn("common_interests", array_join(col("common_interests"), "|"))
    }),
    // EP1 onboarding (S4 node create + F10 ingest lowercasing + J5
    // incremental edges + J7 MERGE) exercised through Ingest.onboard as pure
    // read queries — the write path's exact outputs under the oracle gate.
    "ingest_onboard_row" -> ((s, d) => {
      val (appended, id, _) =
        Ingest.onboard(Tables.students(s, d), emptyEdges(s), newStudentDf(s))
      appended.filter(col("id") === lit(id))
    }),
    "ingest_onboard_delta" -> ((s, d) => {
      val (_, _, delta) =
        Ingest.onboard(Tables.students(s, d), emptyEdges(s), newStudentDf(s))
      delta.drop("common").orderBy(col("rel_type"), col("src"), col("dst"))
    }),
    // J5's interest variant under the oracle: one new member's interests
    // (mixed case + an unknown token, exercising normArr) broadcast against
    // the existing token table — never an all-pairs join.
    "ingest_interest_delta" -> ((s, d) => {
      import s.implicits._
      val newcomer = Seq((10000000L, Seq("Burnished ", "GIZMO", "red", "unobtainium")))
        .toDF("id", "interests")
      EdgeRules.incrementalInterestEdges(Tables.partInterests(s, d), newcomer)
        .withColumn("common", array_join(col("common"), "|"))
        .orderBy(col("src"), col("dst"))
    }),
    "j9_range_join" -> ((s, d) =>
      RangeJoin.eventPairsWithin(Tables.events(s, d), 600L)),
    "j8_asof_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      AsOfJoin.asofLeft(
          Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
          o, key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),
    // §2.9 fuzzy search
    "fuzzy_search_lev" -> ((s, d) =>
      FuzzySearch.topK(Tables.students(s, d), fuzzyQuery,
        c => FuzzySearch.levRatio(c, lit(fuzzyQuery)))),
    "u2_token_correct" -> ((s, d) =>
      FuzzySearch.correctTokens(Tables.students(s, d), tokenQuestion)),
    // U2's SCALE PATH: the same token correction served from the
    // standing q-gram index (one shared DPP-pruned postings probe for
    // all tokens, per-token min_by) — row-identical to the scan form,
    // same oracle
    "u2_token_correct_indexed" -> ((s, d) =>
      FuzzySearch.correctTokensIndexed(s, WarmIndex.fuzzy(s, d),
        tokenQuestion)),
    "fuzzy_search_indel" -> ((s, d) => {
      IndelRatio.register(s)
      FuzzySearch.topK(Tables.students(s, d), fuzzyQuery,
        c => round(call_function("indel_ratio", c, lit(fuzzyQuery)), 4))
    }),
    // fuzzy search off a materialized q-gram index (Gravano et al.,
    // VLDB 2001 count filtering): bucket-pruned gram postings generate
    // candidates, exact levRatio rescores — must equal fuzzy_search_lev
    // row-for-row (same oracle). The fixture's uniform customer# names
    // are the measured WORST case for gram selectivity, like the
    // near-uniform corpus is for PQ
    "fuzzy_search_indexed" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      FuzzySearch.buildIndex(Tables.students(s, d), "graft_idx.fuzzy")
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzy", fuzzyQuery)
    }),
    // BATCH fuzzy search off the index: three query strings (exact hit,
    // typo, garbage) served in ONE postings probe — the bulk
    // spell-correction shape; per-query top-5 via the bounded heaps
    "fuzzy_search_batch" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzyb-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      FuzzySearch.buildIndex(Tables.students(s, d), "graft_idx.fuzzyb")
      FuzzySearch.topKIndexedBatch(s, "graft_idx.fuzzyb", batchFuzzyQueries,
        k = 5)
    }),
    // incremental maintenance of the fuzzy index: base build on 80%,
    // the rest delta-ingested (postings derived from the delta alone,
    // appended bucketed; guard-sidecar disjointness) — must still equal
    // the full-corpus scan row-for-row
    "fuzzy_index_delta" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-delta")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val st = Tables.students(s, d)
      FuzzySearch.buildIndex(st.filter(col("id") % 5 =!= 0), "graft_idx.fuzzyd")
      FuzzySearch.indexDelta("graft_idx.fuzzyd", st.filter(col("id") % 5 === 0))
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzyd", fuzzyQuery)
    }),
    // lifecycle capstone: build -> delta -> COMPACT (postings rewritten
    // one-file-per-bucket through the crash-recoverable swap, guard
    // folded) -> query; compaction is layout-only, same oracle
    "fuzzy_index_compact" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-compact")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val st = Tables.students(s, d)
      FuzzySearch.buildIndex(st.filter(col("id") % 5 =!= 0), "graft_idx.fuzzyc")
      FuzzySearch.indexDelta("graft_idx.fuzzyc", st.filter(col("id") % 5 === 0))
      FuzzySearch.compactIndex(s, "graft_idx.fuzzyc")
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzyc", fuzzyQuery)
    }),
    // DELETION from the standing q-gram index — the tombstone lifecycle
    // completing the contract across all five index families: delete =
    // broadcast sidecar append (never a postings or names rewrite), every
    // candidate arm anti-joins the sidecar, compaction folds physically.
    // The oracle recomputes the scan chain over the surviving names
    "fuzzy_index_delete" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-del")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val st = Tables.students(s, d)
      FuzzySearch.buildIndex(st, "graft_idx.fuzzydel")
      FuzzySearch.indexDelete("graft_idx.fuzzydel",
        st.filter(col("id") % 7 === 3).select(col("id")))
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzydel", fuzzyQuery)
    }),
    // full-CRUD fuzzy capstone: build 80% -> delta 20% -> delete every
    // 7th name (victims span both generations) -> compact (folds grams
    // AND names physically, gramdf-less here so the advisory path stays
    // out of the priced chain) -> query; rebuild-without-victims oracle
    "fuzzy_index_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-life")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val st = Tables.students(s, d)
      FuzzySearch.buildIndex(st.filter(col("id") % 5 =!= 0),
        "graft_idx.fuzzylife")
      FuzzySearch.indexDelta("graft_idx.fuzzylife",
        st.filter(col("id") % 5 === 0))
      FuzzySearch.indexDelete("graft_idx.fuzzylife",
        st.filter(col("id") % 7 === 3).select(col("id")))
      FuzzySearch.compactIndex(s, "graft_idx.fuzzylife")
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzylife", fuzzyQuery)
    }),
    // PREFIX-FILTERED fuzzy probe (Chaudhuri et al., ICDE 2006 composed
    // with the Gravano bound): the advisory _gramdf sidecar orders the
    // query's gram occurrences by posting-list length and the probe
    // SKIPS the min-positive-bound−1 hottest — those lists are never
    // read (spec-measured 16× less posting mass on a hot-prefix
    // corpus); count filter weakens to shared >= bound − s, exact
    // rescore unchanged. Same oracle as fuzzy_search_indexed
    "fuzzy_search_skip" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-skip")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      FuzzySearch.buildIndex(Tables.students(s, d), "graft_idx.fuzzysk")
      FuzzySearch.writeGramDf(s, "graft_idx.fuzzysk")
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzysk", fuzzyQuery,
        prefixSkip = true)
    }),
    // query-only twin of the PREFIX-FILTERED probe off a warm index
    // carrying the gram-df sidecar: isolates the claim that the skip
    // PROBE is cheaper than the plain probe (fuzzy_search_skip's
    // build+sidecar+probe number cannot). Same oracle as the family
    "fuzzy_skip_query" -> ((s, d) =>
      FuzzySearch.topKIndexed(s, WarmIndex.fuzzySkip(s, d), fuzzyQuery,
        prefixSkip = true)),
    // QUERY-ONLY fuzzy twin off the session-prebuilt index (WarmIndex):
    // times the gram probe + count filter + rescore alone — the
    // bm25_query/sim_ann_*_query regime separation applied to the fuzzy
    // family. Same oracle as the build+query row
    "fuzzy_search_query" -> ((s, d) =>
      FuzzySearch.topKIndexed(s, WarmIndex.fuzzy(s, d), fuzzyQuery)),
    // query-only BATCH twin: the DF-native multi-query probe (DPP
    // bucket pruning, shared-count aggregate, per-query heaps) priced
    // without the build — fuzzy_search_batch's build+probe number can't
    // isolate a probe-plan regression. Same oracle as the batch row
    "fuzzy_batch_query" -> ((s, d) =>
      FuzzySearch.topKIndexedBatch(s, WarmIndex.fuzzy(s, d),
        batchFuzzyQueries, k = 5)),
    // per-GRAM posting-list skew stats off the standing fuzzy index —
    // the probe-skew predictor (hot shared-prefix grams ARE this
    // fixture's worst case), the annIvfIndexStats shape
    "fuzzy_index_stats" -> ((s, d) =>
      FuzzySearch.indexStats(s, WarmIndex.fuzzy(s, d))),
    // headline relational pipelines
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
    "dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "dedup_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignature(Tables.documents(s, d)).orderBy(col("doc_id"))),
    // canonical selection: per exact-dup cluster, keep the copy from the
    // highest-priority source (broadcast weights dim), ties -> min id.
    // The raw table has no exact dups, so the contract derives a mirror
    // slice: every 7th doc re-hosted under src3 (weight 256 — outranks
    // most origins; same-weight collisions fall to the id tie-break).
    "dedup_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("source", lit("src3"))
      Dedup.canonicalKeepers(docs.unionByName(mirrored))
    }),
    "dedup_lsh_pairs" -> ((s, d) => Dedup.lshCandidatePairs(Tables.documents(s, d))),
    // EXACT Jaccard>=0.5 similarity join via prefix filtering — the
    // no-false-negative complement to the probabilistic LSH path
    "dedup_prefix_pairs" -> ((s, d) => Dedup.prefixFilterPairs(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables.documents(s, d))),
    // threshold sensitivity audit: surviving pairs + affected docs per
    // candidate Jaccard threshold — price the knob before the corpus run
    "dedup_threshold_sweep" -> ((s, d) =>
      Dedup.thresholdSweep(Tables.documents(s, d))),
    // the same exact-verify chain with the 100-TB side of the trade ON:
    // candidate pairs materialized, verify shingles semi-joined down to
    // the collided sliver (conf read at plan time, so set-build-restore)
    "dedup_jaccard_sliver" -> ((s, d) => {
      s.conf.set("spark.graft.verifySliver", "true")
      try Dedup.ngramJaccard(Tables.documents(s, d))
      finally s.conf.unset("spark.graft.verifySliver")
    }),
    "dedup_simhash" -> ((s, d) => {
      graft.functions.SimHash32.register(s)
      Tables.documents(s, d).select(col("doc_id"),
        call_function("simhash32", Dedup.words(col("text"))).as("simhash"))
        .orderBy(col("doc_id"))
    }),
    "dedup_keepset" -> ((s, d) => Dedup.keepSet(Tables.documents(s, d))),
    // substring-level duplication (word-anchored K-gram windows, WITH
    // multiplicity): the duplicated-passage table and the per-doc
    // duplicated-span fraction it feeds
    "dedup_substring" -> ((s, d) => Dedup.substringDups(Tables.documents(s, d))),
    // sketch-level corpus health: per-band bucket/hot-key/collision-mass
    // stats that size the pair job BEFORE running it
    "dedup_band_stats" -> ((s, d) => Dedup.bandStats(Tables.documents(s, d))),
    // asymmetric containment (quote detection) + its sketch-only estimate
    "dedup_containment" -> ((s, d) => Dedup.containment(Tables.documents(s, d))),
    "dedup_doc_spans" -> ((s, d) => Dedup.docDupSpans(Tables.documents(s, d))),
    // CAPSTONE composition — the corpus build end to end: quality gate ->
    // exact-dup keepers -> near-dup drop (keepSet) -> hash split -> pack
    // the train shard. One DAG, every stage the already-oracled operator.
    "corpus_build" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Dedup.keepSet(docs).select("doc_id")
      val train = Sampling.hashSplit(docs)
        .filter(col("split") === "train").select("doc_id")
      Packing.packSequences(
        docs.join(kept, Seq("doc_id"), "left_semi")
          .join(train, Seq("doc_id"), "left_semi"))
    }),
    // CAPSTONE v2 — the full curation recipe with the round-8 gates:
    // keepSet -> substring-span gate (residual duplication measured on
    // the KEPT subset; <8-word docs pass vacuously) -> per-source token
    // budget -> train split -> pack. Every stage an already-oracled op.
    "corpus_curate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Dedup.keepSet(docs).select("doc_id")
      // three consumers re-derive the whole LSH keep-set chain without
      // this cache (spans, the short-doc pass, the gated semi-join)
      val keptDocs = graft.CacheScope.track(
        docs.join(kept, Seq("doc_id"), "left_semi"))
      val lowDup = Dedup.docDupSpans(keptDocs)
        .filter(col("dup_frac") < 0.5).select("doc_id")
      val short = keptDocs
        .filter(size(Dedup.words(col("text"))) < Dedup.SubstrK).select("doc_id")
      val gated = graft.CacheScope.track(
        keptDocs.join(lowDup.unionByName(short), Seq("doc_id"), "left_semi"))
      val admitted = Sampling.tokenBudget(gated).select("doc_id")
      val train = Sampling.hashSplit(docs)
        .filter(col("split") === "train").select("doc_id")
      Packing.packSequences(
        gated.join(admitted, Seq("doc_id"), "left_semi")
          .join(train, Seq("doc_id"), "left_semi"))
    }),
    // continuous-ingest shape: a 20% delta batch checked against the
    // remaining 80% as the standing index
    "dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalNearDup(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0))
    }),
    // DELETION from the standing band index — right-to-erasure reaches
    // DERIVED state: an erased doc's minhash signatures must stop
    // matching future deltas or the pipeline keeps naming it as a
    // near-dup partner. Build on 80%, tombstone every 7th doc, probe
    // with the 20% delta; candidates anti-join the broadcast sidecar
    // ABOVE the bucketed scan (co-located join untouched)
    "dedup_index_delete" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-lshdel")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      DedupIndex.build(docs.filter(col("doc_id") % 5 =!= 0),
        "graft_idx.lshdel")
      DedupIndex.indexDelete(s, "graft_idx.lshdel",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      DedupIndex.candidates(s, "graft_idx.lshdel",
        docs.filter(col("doc_id") % 5 === 0))
    }),
    // full-CRUD band-index capstone: build on the odd half of the index
    // docs -> delta-append the even half (bands derive from the delta
    // alone into the bucketed layout; guarded) -> delete every 7th doc
    // -> compact (fold + guard rebuild + sidecar retire) -> probe
    "dedup_index_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-lshlife")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      val idx = docs.filter(col("doc_id") % 5 =!= 0)
      DedupIndex.build(idx.filter(col("doc_id") % 2 === 1),
        "graft_idx.lshlife")
      DedupIndex.delta(s, "graft_idx.lshlife",
        idx.filter(col("doc_id") % 2 === 0))
      DedupIndex.indexDelete(s, "graft_idx.lshlife",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      DedupIndex.compact(s, "graft_idx.lshlife")
      DedupIndex.candidates(s, "graft_idx.lshlife",
        docs.filter(col("doc_id") % 5 === 0))
    }),
    // INCREMENTALLY-MAINTAINED MATERIALIZED AGGREGATE (IVM): the
    // additive-stats discipline as a user-facing view — build folds the
    // base once, read folds the additive generations; bit-exact DECIMAL
    // sums (the money-math discipline)
    "mv_orders_build" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mv")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      MatView.build(o, "graft_idx.mvo", Seq("o_custkey"), Seq("price"),
        "o_orderkey")
      MatView.read(s, "graft_idx.mvo", Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("o_custkey"))
    }),
    // the IVM lifecycle: build 80% -> delta 20% (delta-sized refresh,
    // base never re-read) -> delete every 7th order (negated partials)
    // -> compact (fold to one row per key) -> read == GROUP BY over the
    // survivors, bit-exact
    "mv_orders_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvl")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      MatView.build(o.filter(col("o_orderkey") % 5 =!= 0),
        "graft_idx.mvol", Seq("o_custkey"), Seq("price"), "o_orderkey")
      MatView.delta("graft_idx.mvol",
        o.filter(col("o_orderkey") % 5 === 0),
        Seq("o_custkey"), Seq("price"), "o_orderkey")
      MatView.deleteRows("graft_idx.mvol",
        o.filter(col("o_orderkey") % 7 === 3),
        Seq("o_custkey"), Seq("price"))
      MatView.compact(s, "graft_idx.mvol", Seq("o_custkey"), Seq("price"))
      MatView.read(s, "graft_idx.mvol", Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("o_custkey"))
    }),
    // MIN/MAX IVM (the `_mm` structure): inserts stay delta-sized
    // (min/max ARE insert-associative partials), deletes RECOMPUTE the
    // affected groups from the surviving base (broadcast-semi-join
    // key-pruned — the honest non-additive cost model the additive
    // view's scaladoc names); read folds generations under the
    // latest-recompute-wins window, UNCOMPACTED here so the novel fold
    // path is what the oracle checks
    "mv_minmax_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvmm")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      MatView.buildMinMax(o.filter(col("o_orderkey") % 5 =!= 0),
        "graft_idx.mvmm", Seq("o_custkey"), Seq("price"), "o_orderkey")
      MatView.deltaMinMax("graft_idx.mvmm",
        o.filter(col("o_orderkey") % 5 === 0),
        Seq("o_custkey"), Seq("price"), "o_orderkey")
      MatView.deleteRowsMinMax("graft_idx.mvmm",
        o.filter(col("o_orderkey") % 7 === 3),
        o.filter(col("o_orderkey") % 7 =!= 3),
        Seq("o_custkey"), Seq("price"))
      MatView.readMinMax(s, "graft_idx.mvmm",
        Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("min_price").cast("double").as("min_price"),
          col("max_price").cast("double").as("max_price"))
        .orderBy(col("o_custkey"))
    }),
    // TOP-K IVM (the `_tk` structure): min/max generalized from k=1 —
    // per-generation top-k partials are a guaranteed superset of the
    // folded top-k (any union-top-k row is in its own generation's
    // top-k), so inserts append ≤ k rows per touched key; deletes
    // recompute affected groups (evicting rank 1 must surface rank k+1,
    // which only the base knows); UNCOMPACTED read
    "mv_topk_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvtk")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      MatView.buildTopK(o.filter(col("o_orderkey") % 5 =!= 0),
        "graft_idx.mvtk", Seq("o_orderpriority"), "price", "o_orderkey", 3)
      MatView.deltaTopK("graft_idx.mvtk",
        o.filter(col("o_orderkey") % 5 === 0),
        Seq("o_orderpriority"), "price", "o_orderkey", 3)
      MatView.deleteRowsTopK("graft_idx.mvtk",
        o.filter(col("o_orderkey") % 7 === 3),
        o.filter(col("o_orderkey") % 7 =!= 3),
        Seq("o_orderpriority"), "price", "o_orderkey", 3)
      MatView.readTopK(s, "graft_idx.mvtk",
        Seq("o_orderpriority"), "price", "o_orderkey", 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("price").cast("double").as("price"), col("rk"))
        .orderBy(col("o_orderpriority"), col("rk"))
    }),
    // JOIN-VIEW IVM: the additive view pushed through a broadcast
    // fact⋈dim join — revenue per nation maintained under fact inserts
    // (delta probes the broadcast dim, |delta|-sized) and deletes
    // (negated joined partials), the standing fact and dim never
    // re-read; storage/read/compact are the plain `_mv` machinery
    "mv_join_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvj")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
        .withColumnRenamed("o_custkey", "c_custkey")
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      MatView.buildJoin(o.filter(col("o_orderkey") % 5 =!= 0), dim,
        "graft_idx.mvj", Seq("c_custkey"), Seq("c_nationkey"),
        Seq("price"), "o_orderkey")
      MatView.deltaJoin("graft_idx.mvj",
        o.filter(col("o_orderkey") % 5 === 0), dim,
        Seq("c_custkey"), Seq("c_nationkey"), Seq("price"), "o_orderkey")
      MatView.deleteJoinRows("graft_idx.mvj",
        o.filter(col("o_orderkey") % 7 === 3), dim,
        Seq("c_custkey"), Seq("c_nationkey"), Seq("price"))
      MatView.compact(s, "graft_idx.mvj",
        Seq("c_nationkey"), Seq("price"))
      MatView.read(s, "graft_idx.mvj", Seq("c_nationkey"), Seq("price"))
        .select(col("c_nationkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("c_nationkey"))
    }),
    // EXACT COUNT DISTINCT IVM (the `_dv` refcounted support set):
    // distinct customers per order priority maintained under inserts
    // AND deletes — refcounts are additive where naive ndv storage is
    // not (a delete can't know whether its value still has supporters;
    // the refcount can); UNCOMPACTED read so the two-stage fold is what
    // the oracle checks
    "mv_distinct_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvd")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
      MatView.buildDistinct(o.filter(col("o_orderkey") % 5 =!= 0),
        "graft_idx.mvd", Seq("o_orderpriority"), "o_custkey", "o_orderkey")
      MatView.deltaDistinct("graft_idx.mvd",
        o.filter(col("o_orderkey") % 5 === 0),
        Seq("o_orderpriority"), "o_custkey", "o_orderkey")
      MatView.deleteRowsDistinct("graft_idx.mvd",
        o.filter(col("o_orderkey") % 7 === 3),
        Seq("o_orderpriority"), "o_custkey")
      MatView.readDistinct(s, "graft_idx.mvd",
        Seq("o_orderpriority"), "o_custkey")
        .select(col("o_orderpriority"), col("ndv"), col("cnt"))
        .orderBy(col("o_orderpriority"))
    }),
    // CDC through the JOIN VIEW: the change batch's fact images enrich
    // through the broadcast dim and fold as one applyCdc generation —
    // the dim probe commutes with the I/D split under immutability
    "mv_join_cdc" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvjcdc")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
        .withColumnRenamed("o_custkey", "c_custkey")
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      MatView.buildJoin(o.filter(col("o_orderkey") % 5 =!= 0), dim,
        "graft_idx.mvjcdc", Seq("c_custkey"), Seq("c_nationkey"),
        Seq("price"), "o_orderkey")
      val changes = o.filter(col("o_orderkey") % 5 === 0)
        .withColumn("op", lit("I"))
        .unionByName(o.filter(col("o_orderkey") % 5 =!= 0 &&
          col("o_orderkey") % 7 === 3).withColumn("op", lit("D")))
      MatView.applyCdcJoin("graft_idx.mvjcdc", 0L, changes, dim,
        Seq("c_custkey"), Seq("c_nationkey"), Seq("price"))
      MatView.read(s, "graft_idx.mvjcdc", Seq("c_nationkey"), Seq("price"))
        .select(col("c_nationkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("c_nationkey"))
    }),
    // STREAMING distinct-view maintenance: exact ndv kept fresh from a
    // real bounded feed (refcount partials per micro-batch, ledgered)
    "stream_mv_distinct" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvds")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
      val feed = java.nio.file.Files.createTempDirectory("graft-mvd-feed")
        .toFile.getAbsolutePath + "/in"
      o.filter(col("o_orderkey") % 2 === 1).repartition(1).write.parquet(feed)
      o.filter(col("o_orderkey") % 2 === 0).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalDistinctMaintenance(
        s.readStream.schema(o.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.mvds", Seq("o_orderpriority"), "o_custkey", "o_orderkey")
      q.processAllAvailable(); q.stop()
      MatView.readDistinct(s, "graft_idx.mvds",
        Seq("o_orderpriority"), "o_custkey")
        .select(col("o_orderpriority"), col("ndv"), col("cnt"))
        .orderBy(col("o_orderpriority"))
    }),
    // STREAMING min/max-view maintenance: insert generations per
    // micro-batch (the insert-associative half; deletes are the
    // takedown-feed recompute, not a streaming fold)
    "stream_mv_minmax" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvms")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      val feed = java.nio.file.Files.createTempDirectory("graft-mvm-feed")
        .toFile.getAbsolutePath + "/in"
      o.filter(col("o_orderkey") % 2 === 1).repartition(1).write.parquet(feed)
      o.filter(col("o_orderkey") % 2 === 0).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalMinMaxMaintenance(
        s.readStream.schema(o.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.mvms", Seq("o_custkey"), Seq("price"), "o_orderkey")
      q.processAllAvailable(); q.stop()
      MatView.readMinMax(s, "graft_idx.mvms", Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("min_price").cast("double").as("min_price"),
          col("max_price").cast("double").as("max_price"))
        .orderBy(col("o_custkey"))
    }),
    // CDC-APPLIED view: one Debezium-shaped change batch (op = I/D with
    // full row images) folds as ONE appended generation — inserts'
    // partials + deletes' negated partials, batch-id idempotent; read
    // == GROUP BY over (base + inserts − deletes), bit-exact
    "mv_orders_cdc" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvcdc")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      MatView.build(o.filter(col("o_orderkey") % 5 =!= 0),
        "graft_idx.mvcdc", Seq("o_custkey"), Seq("price"), "o_orderkey")
      val changes = o.filter(col("o_orderkey") % 5 === 0)
        .withColumn("op", lit("I"))
        .unionByName(o.filter(col("o_orderkey") % 5 =!= 0 &&
          col("o_orderkey") % 7 === 3).withColumn("op", lit("D")))
      MatView.applyCdc("graft_idx.mvcdc", 0L, changes,
        Seq("o_custkey"), Seq("price"))
      MatView.read(s, "graft_idx.mvcdc", Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("o_custkey"))
    }),
    // STREAMING CDC: the change feed arrives as a real bounded stream —
    // an insert batch, then a mixed insert+delete batch; the drained
    // view answers the survivors' GROUP BY
    "stream_mv_cdc" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvscdc")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      MatView.build(o.filter(col("o_orderkey") % 5 =!= 0),
        "graft_idx.mvscdc", Seq("o_custkey"), Seq("price"), "o_orderkey")
      val feed = java.nio.file.Files.createTempDirectory("graft-cdc-feed")
        .toFile.getAbsolutePath + "/in"
      o.filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 2 === 1)
        .withColumn("op", lit("I")).repartition(1).write.parquet(feed)
      o.filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 2 === 0)
        .withColumn("op", lit("I"))
        .unionByName(o.filter(col("o_orderkey") % 5 =!= 0 &&
          col("o_orderkey") % 7 === 3).withColumn("op", lit("D")))
        .repartition(1).write.mode("append").parquet(feed)
      val schema = o.withColumn("op", lit("I")).schema
      val q = graft.streaming.Streams.incrementalCdcMaintenance(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.mvscdc", Seq("o_custkey"), Seq("price"))
      q.processAllAvailable(); q.stop()
      MatView.read(s, "graft_idx.mvscdc", Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("o_custkey"))
    }),
    // STREAMING view maintenance: order rows arrive as a real bounded
    // stream, each micro-batch folds its delta-sized partials under the
    // batch-id ledger (same-bid crash redelivery is a no-op — spec-gated
    // directly, since a file feed can't replay a committed batch id);
    // the drained view answers the one-shot GROUP BY oracle
    "stream_mv_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-mvs")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
      val feed = java.nio.file.Files.createTempDirectory("graft-mv-feed")
        .toFile.getAbsolutePath + "/in"
      o.filter(col("o_orderkey") % 2 === 1).repartition(1).write.parquet(feed)
      o.filter(col("o_orderkey") % 2 === 0).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalViewMaintenance(
        s.readStream.schema(o.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.mvs", Seq("o_custkey"), Seq("price"), "o_orderkey")
      q.processAllAvailable(); q.stop()
      MatView.read(s, "graft_idx.mvs", Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy(col("o_custkey"))
    }),
    // STREAMING SCD2 maintenance: the observation feed arrives as a
    // real bounded stream (two date-split files — batch 0 bootstraps
    // the dimension, batch 1 folds as an affected-keys-only apply);
    // the drained dimension answers the full-rebuild oracle verbatim
    "stream_scd2_apply" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-scd2s")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val o = Tables.orders(s, d)
      val cut = to_date(lit("1996-01-01"))
      val feed = java.nio.file.Files.createTempDirectory("graft-scd2-feed")
        .toFile.getAbsolutePath + "/in"
      o.filter(col("o_orderdate") <= cut).repartition(1).write.parquet(feed)
      o.filter(col("o_orderdate") > cut).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalScd2Maintenance(
        s.readStream.schema(o.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.scd2s", "o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority")
      q.processAllAvailable(); q.stop()
      s.table("graft_idx.scd2s_scd2")
        .select(col("o_custkey"), col("version"), col("valid_from"),
          col("valid_to"), col("o_orderpriority").as("priority"),
          col("is_current"))
        .orderBy(col("o_custkey"), col("version"))
    }),
    // streaming band-index ingest: index docs arrive as a REAL bounded
    // stream (two files, the second overlapping the first — replay in
    // the benched row); after the drain, candidates must equal the
    // build-at-once collisions
    "stream_dedup_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-lsh-stream")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      val idx = docs.filter(col("doc_id") % 5 =!= 0)
      val feed = java.nio.file.Files.createTempDirectory("graft-lsh-feed")
        .toFile.getAbsolutePath + "/in"
      idx.filter(col("doc_id") % 2 === 1).repartition(1).write.parquet(feed)
      idx.repartition(1).write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalDedupIndexing(
        s.readStream.schema(idx.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.lshstream")
      q.processAllAvailable(); q.stop()
      DedupIndex.candidates(s, "graft_idx.lshstream",
        docs.filter(col("doc_id") % 5 === 0))
    }),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashNearDup(Tables.documents(s, d))),
    "a5_stats" -> ((s, d) =>
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"))),
    // training-data pipeline: text analysis
    "text_tokens" -> ((s, d) => TextAnalysis.tokens(Tables.documents(s, d))),
    // dataset-version diff: v2 simulated deterministically (every 11th
    // doc removed, every 7th's text changed, every 13th re-added under a
    // shifted id) — the 4-row added/removed/changed/unchanged audit
    "corpus_diff" -> ((s, d) => {
      val v1 = Tables.documents(s, d)
      val v2 = v1.filter(col("doc_id") % 11 =!= 5)
        .withColumn("text", when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionByName(v1.filter(col("doc_id") % 13 === 1)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      TextAnalysis.corpusDiff(v1, v2)
    }),
    // the pre-training dashboard: per (source, lang) docs/tokens/quality
    // keep-rate/exact-dup rate/langid agreement — one scan, one hash
    // shuffle, a |sources|x|langs|-row aggregate
    "corpus_report" -> ((s, d) => TextAnalysis.corpusReport(Tables.documents(s, d))),
    // tokenizer induction: 5 BPE merges trained on the word histogram in
    // ONE declarative DAG (each winner = 1-row aggregate broadcast into a
    // boundary-anchored replace; no driver loop)
    "bpe_merges" -> ((s, d) => Bpe.merges(Tables.documents(s, d))),
    // encode under the trained vocab: replace chain runs once per
    // DISTINCT word; documents join the vocab-sized encode table
    "bpe_encode" -> ((s, d) => Bpe.encode(Tables.documents(s, d))),
    "text_quality" -> ((s, d) => TextAnalysis.quality(Tables.documents(s, d))),
    "text_langid" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    // code-switching detector: per-chunk langid vote -> per-doc majority
    // (doc-level langid averages away embedded foreign passages)
    "text_langid_mixed" -> ((s, d) =>
      TextAnalysis.langIdMixed(Tables.documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),
    // corpus heavy hitters: boilerplate phrases by document frequency
    "text_ngram_topk" -> ((s, d) => TextAnalysis.ngramTopK(Tables.documents(s, d))),
    // training-data pipeline: similarity search
    "sim_topk_bruteforce" -> ((s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d))),
    "sim_near_dup" -> ((s, d) => Similarity.nearDupPairs(Tables.embeddings(s, d))),
    "sim_ann_lsh" -> ((s, d) => Similarity.annTopK(Tables.embeddings(s, d))),
    // contrastive-training curation: per-query top-k in-bucket NEAR
    // MISSES (below the positive threshold) — hard negatives
    "sim_hard_negatives" -> ((s, d) => Similarity.hardNegatives(Tables.embeddings(s, d))),
    "sim_ann_multiprobe" -> ((s, d) => Similarity.annMultiProbeTopK(Tables.embeddings(s, d))),
    "sim_ann_ivf" -> ((s, d) => Similarity.annIvfTopK(Tables.embeddings(s, d))),
    // IVF with a TRAINED coarse quantizer (label-seeded integer-space
    // centroids), nprobe=2 — the production tuning lever the fixed
    // lattice lacks; cells + probes + cut all engine-reproducible
    "sim_ann_ivf_trained" -> ((s, d) => Similarity.annIvfTrainedTopK(Tables.embeddings(s, d))),
    // recall@k of the trained-IVF path vs brute force — prices nprobe
    // pruning the way sim_ann_recall prices bucket pruning
    "sim_ann_ivf_trained_recall" -> ((s, d) => Similarity.annIvfTrainedRecall(Tables.embeddings(s, d))),
    // the materialized inverted lists: cell-partitioned index built once,
    // probes DPP-prune the candidate read to the probed cells — same
    // result as sim_ann_ivf_trained, corpus never re-assigned at query
    "sim_ann_ivf_indexed" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfIndex(Tables.embeddings(s, d), "graft_idx.ivf")
      Similarity.annIvfIndexedTopK(s, "graft_idx.ivf")
    }),
    // frozen-quantizer incremental ingest: base build on 80%, the rest
    // delta-ingested against the STORED centroids (corpus never re-read),
    // then the same index-served query — the bm25_index_delta discipline
    // for ANN
    "sim_ann_ivf_index_delta" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-delta")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), "graft_idx.ivfd")
      Similarity.ivfIndexDelta("graft_idx.ivfd", emb.filter(col("vec_id") % 5 === 0))
      Similarity.annIvfIndexedTopK(s, "graft_idx.ivfd")
    }),
    // index-lifecycle capstone: build -> delta ingest -> COMPACT (cell
    // partitions rewritten to one file each, guard bloom collapsed; the
    // frozen quantizer untouched) -> query. Same oracle as the delta row:
    // compaction is layout-only and must not move a single result
    "sim_ann_ivf_index_compact" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-compact")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), "graft_idx.ivfc")
      Similarity.ivfIndexDelta("graft_idx.ivfc", emb.filter(col("vec_id") % 5 === 0))
      Similarity.compactIvfIndex(s, "graft_idx.ivfc")
      Similarity.annIvfIndexedTopK(s, "graft_idx.ivfc")
    }),
    // DELETION from the standing lists — the tombstone lifecycle
    // (takedown/right-to-erasure at 100 TB cannot be a rebuild): delete
    // appends the victim vec_ids to a broadcast-sized sidecar, the probe
    // anti-joins it (DPP cell pruning untouched), and compaction folds
    // the victims away physically. Victims = every 7th vector outside
    // the fixture query anchors; the quantizer stays frozen on the FULL
    // corpus (build-then-delete), so the oracle trains C on everything
    // and excludes the victims from candidates only
    "sim_ann_ivf_index_delete" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-del")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb, "graft_idx.ivfdel")
      Similarity.ivfIndexDelete("graft_idx.ivfdel",
        emb.filter(col("vec_id") % 7 === 3 && col("vec_id") >= 8)
          .select(col("vec_id")))
      Similarity.annIvfIndexedTopK(s, "graft_idx.ivfdel")
    }),
    // full-CRUD IVF capstone: frozen-quantizer build on 80% -> delta
    // 20% -> delete every 7th non-anchor vector (victims span both
    // generations) -> compact (folds delta files AND tombstones, guard
    // to one bloom) -> query; the quantizer stays frozen on the base
    // split throughout, so the oracle trains C on the base and excludes
    // victims from candidates only
    "sim_ann_ivf_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-life")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "graft_idx.ivflife")
      Similarity.ivfIndexDelta("graft_idx.ivflife",
        emb.filter(col("vec_id") % 5 === 0))
      Similarity.ivfIndexDelete("graft_idx.ivflife",
        emb.filter(col("vec_id") % 7 === 3 && col("vec_id") >= 8)
          .select(col("vec_id")))
      Similarity.compactIvfIndex(s, "graft_idx.ivflife")
      Similarity.annIvfIndexedTopK(s, "graft_idx.ivflife")
    }),
    // ATTRIBUTE-FILTERED ANN — the production retrieval shape ("nearest
    // within label = 3"): the lists carry the attribute column, the
    // predicate is PUSHED into the DPP-pruned candidate scan
    // (pre-filter), and within the probed cells the result is exact
    // under the predicate. ~10% selectivity at the fixture's 10 labels
    "sim_ann_filtered" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-filt")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfIndex(Tables.embeddings(s, d), "graft_idx.ivff")
      Similarity.annIvfFilteredTopK(s, "graft_idx.ivff", col("label") === 3,
        FiltNQ, FiltK, FiltNprobe)
    }),
    // the pre-vs-post adjudication, measured: recall@k of BOTH filtered
    // probe modes against the exact filtered brute force — pre-filter
    // ranks the predicate's survivors, post-filter cuts a widened
    // UNFILTERED shortlist first and loses whatever the cut starved out
    // (the recorded reason pre-filter is the default; BASELINE.md r15)
    "sim_ann_filtered_recall" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-frec")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb, "graft_idx.ivffr")
      Similarity.annFilteredRecall(s, "graft_idx.ivffr", emb,
        col("label") === 3, FiltNQ, FiltK, FiltNprobe, FiltWiden)
    }),
    // ATTRIBUTE-FILTERED FUSED (IVF-PQ) ANN — the 100 TB filtered query
    // actually runs against the compressed rungs: the predicate applies
    // to the codes-only DPP-pruned scan BEFORE the lossy ADC shortlist
    // cut, so the shortlist competes among survivors only and needs no
    // 1/selectivity correction (the post-filter trade the fused recall
    // row measures)
    "sim_ann_filtered_fused" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pq-filt")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfPqIndex(Tables.embeddings(s, d), "graft_idx.pqf")
      Similarity.annIvfPqFilteredTopK(s, "graft_idx.pqf",
        col("label") === 3, FiltNQ, FiltK, FiltNprobe)
    }),
    // the SQ8 rung's filtered probe — same contract at 8× compression
    "sim_ann_filtered_sq" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-sq-filt")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfSqIndex(Tables.embeddings(s, d), "graft_idx.sqf")
      Similarity.annIvfSqFilteredTopK(s, "graft_idx.sqf",
        col("label") === 3, FiltNQ, FiltK, FiltNprobe)
    }),
    // PER-QUERY label-matched ANN — the multi-tenant shape a global
    // predicate can't express: each fixture query retrieves within its
    // OWN label, the constraint a broadcast join condition above the
    // DPP-pruned scan (no shuffle, no per-query scan)
    "sim_ann_label_matched" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-lbl")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfIndex(Tables.embeddings(s, d), "graft_idx.ivflm")
      Similarity.annIvfLabelMatchedTopK(s, "graft_idx.ivflm",
        FiltNQ, FiltK, FiltNprobe)
    }),
    // query-only filtered twin off the warm standing IVF index: the
    // benched number is the filtered DPP-pruned probe + rescore alone
    // (the bm25_query regime separation for the filtered family — a
    // filtered-probe plan regression can't hide in build noise). Same
    // oracle as the build+query filtered row
    "sim_ann_filtered_query" -> ((s, d) =>
      Similarity.annIvfFilteredTopK(s, WarmIndex.ivf(s, d),
        col("label") === 3, FiltNQ, FiltK, FiltNprobe)),
    // the residual (IVFADC) rung's filtered probe — completes the
    // filtered contract across the WHOLE compression ladder (raw / SQ8
    // / PQ / residual-PQ): predicate before the per-cell-rebased ADC
    // shortlist cut
    "sim_ann_filtered_residual" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pqr-filt")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfPqResidualIndex(Tables.embeddings(s, d),
        "graft_idx.pqrf")
      Similarity.annIvfPqResidualFilteredTopK(s, "graft_idx.pqrf",
        col("label") === 3, FiltNQ, FiltK, FiltNprobe)
    }),
    // the measured recall-vs-SELECTIVITY sweep on the fused rung (the
    // nprobe-sweep methodology applied to the filtered knob): pre/post
    // recall at ~10% and ~3.3% selectivity — the number that prices the
    // post-mode's 1/selectivity widen requirement instead of asserting it
    "sim_ann_filtered_selectivity" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pq-fsel")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfPqIndex(emb, "graft_idx.pqsel")
      Similarity.annFusedFilteredSelectivitySweep(s, "graft_idx.pqsel",
        emb, filtSweep.map { case (tag, p, _) => (tag, p) },
        FiltNQ, FiltK, FiltNprobe, FiltWiden)
    }),
    // the fused pre-vs-post adjudication, measured: on the compressed
    // rung BOTH lossy cuts (ADC shortlist + widened rank cut) precede
    // the predicate in post mode, so its recall collapses with
    // selectivity unless widen and shortlist scale by ~1/selectivity —
    // pre mode filters before the cut and needs neither
    "sim_ann_filtered_fused_recall" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pq-frec")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfPqIndex(emb, "graft_idx.pqfr")
      Similarity.annFusedFilteredRecall(s, "graft_idx.pqfr", emb,
        col("label") === 3, FiltNQ, FiltK, FiltNprobe, FiltWiden)
    }),
    // the PQ-FUSED index: inverted lists carry per-vector PQ codes, the
    // probe scores candidates in the compressed domain (ADC lookup table
    // + 8 code lookups per candidate, v never read in the scan) and only
    // the shortlist survivors are rescored on raw vectors — the
    // composition that makes 100 TB ANN IO-feasible
    "sim_ann_ivfpq_indexed" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfPqIndex(Tables.embeddings(s, d), "graft_idx.ivfpq")
      Similarity.annIvfPqIndexedTopK(s, "graft_idx.ivfpq")
    }),
    // fused-index incremental ingest: base build freezes BOTH quantizers
    // (coarse cells + PQ codebook); the delta is assigned AND encoded
    // against the stored artifacts, appended into the cell partitions,
    // then the same ADC-shortlist-rescore query serves the merged lists
    "sim_ann_ivfpq_index_delta" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq-delta")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "graft_idx.ivfpqd")
      Similarity.ivfPqIndexDelta("graft_idx.ivfpqd",
        emb.filter(col("vec_id") % 5 === 0))
      Similarity.annIvfPqIndexedTopK(s, "graft_idx.ivfpqd")
    }),
    // SCALAR-quantized (SQ8) IVF index — the middle rung of the ANN
    // compression ladder (raw 1× / SQ8 8× / PQ 32×): every dim
    // compresses to a byte-range code against a per-dim trained
    // [min, max]; candidates are scored on exact-integer dequantized
    // codes (sq read instead of v), shortlist rescored on raw vectors
    "sim_ann_ivfsq_indexed" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfsq-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfSqIndex(Tables.embeddings(s, d), "graft_idx.ivfsq")
      Similarity.annIvfSqIndexedTopK(s, "graft_idx.ivfsq")
    }),
    // SQ8 incremental ingest: delta assigned against the stored
    // centroids and coded against the stored [min, max] trainer
    // (out-of-range delta values saturate to the byte boundaries).
    // Oracle-only: cost shape already priced by the indexed row
    "sim_ann_ivfsq_index_delta" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfsq-delta")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfSqIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "graft_idx.ivfsqd")
      Similarity.ivfSqIndexDelta("graft_idx.ivfsqd",
        emb.filter(col("vec_id") % 5 === 0))
      Similarity.annIvfSqIndexedTopK(s, "graft_idx.ivfsqd")
    }),
    // RESIDUAL-encoded fused index (IVFADC, Jégou et al. TPAMI 2011):
    // PQ encodes r = x − centroid(cell(x)) instead of x — the coarse
    // quantizer already explains cell geometry, so the same 8 codes
    // describe the tighter residual distribution; the ADC lookup table
    // rebases per probed cell (qid, cell, sub, code). Same table
    // layout, same codes-only candidate scan
    "sim_ann_ivfpq_residual" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfpqr-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Similarity.buildIvfPqResidualIndex(Tables.embeddings(s, d),
        "graft_idx.ivfpqr")
      Similarity.annIvfPqResidualTopK(s, "graft_idx.ivfpqr")
    }),
    // residual-index incremental ingest: the delta is assigned AND
    // residual-encoded against the stored artifacts (ivfPqIndexDelta
    // branches on the recorded 'enc' provenance — mixing encodings
    // would silently mis-score every ADC candidate). Oracle-only (not
    // benched): its cost shape is already priced by the
    // sim_ann_ivfpq_index_delta and sim_ann_ivfpq_residual rows
    "sim_ann_ivfpq_residual_delta" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfpqr-delta")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfPqResidualIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "graft_idx.ivfpqrd")
      Similarity.ivfPqIndexDelta("graft_idx.ivfpqrd",
        emb.filter(col("vec_id") % 5 === 0))
      Similarity.annIvfPqResidualTopK(s, "graft_idx.ivfpqrd")
    }),
    // QUERY-ONLY twins: the same index-served queries off a
    // session-prebuilt standing index (WarmIndex, the q15 warm-view
    // precedent) — the build runs once per JVM, so these rows time
    // probe + ADC + rescore alone; a query-path plan regression can no
    // longer hide inside build-cost noise. Same oracles as the
    // build+query rows (the result must not depend on who built)
    "sim_ann_ivf_query" -> ((s, d) =>
      Similarity.annIvfIndexedTopK(s, WarmIndex.ivf(s, d))),
    "sim_ann_ivfpq_query" -> ((s, d) =>
      Similarity.annIvfPqIndexedTopK(s, WarmIndex.ivfPq(s, d))),
    "sim_ann_ivfsq_query" -> ((s, d) =>
      Similarity.annIvfSqIndexedTopK(s, WarmIndex.ivfSq(s, d))),
    "sim_ann_ivfpqr_query" -> ((s, d) =>
      Similarity.annIvfPqResidualTopK(s, WarmIndex.ivfPqResidual(s, d))),
    // probe-bounded cosine RANGE search off the standing index: every
    // probed-cell candidate at exact cos >= t survives (no heap cut, no
    // lossy ADC prefilter — a range query can't tolerate silent drops);
    // the indexed counterpart of sim_near_dup's blocked pair listing
    "sim_ann_range_search" -> ((s, d) =>
      Similarity.annIvfRangeSearch(s, WarmIndex.ivf(s, d))),
    // standing-index maintenance stats: inverted-list size distribution
    // + the max/avg imbalance factor (the probe-skew predictor a
    // maintenance job reads before scheduling retrain/splits)
    "sim_ann_index_stats" -> ((s, d) =>
      Similarity.annIvfIndexStats(s, WarmIndex.ivf(s, d))),
    // nprobe/recall sensitivity sweep across the compression ladder
    // (the dedup_threshold_sweep pattern): recall@3 vs the brute-force
    // truth for nprobe in {1,2,4,8} x {pq, residual, sq8}, all served
    // from the session-prebuilt standing indexes at the DERIVED
    // shortlist = ShortlistPerProbe x nprobe defaults — recall is
    // monotone in nprobe on every rung (the r13 fixed-shortlist
    // dilution is codified away; spec-asserted). Oracle-only: 12 ADC
    // query plans; the per-rung cost shape is already priced by the
    // *_indexed and *_query rows
    "sim_ann_nprobe_sweep" -> ((s, d) =>
      Similarity.annNprobeSweep(s, Tables.embeddings(s, d),
        WarmIndex.ivfPq(s, d), WarmIndex.ivfPqResidual(s, d),
        WarmIndex.ivfSq(s, d))),
    // the sweep turned into a DECISION: per rung the smallest nprobe
    // meeting the recall target, or the widest with met=false (the
    // fixture exercises all three outcomes: sq8 meets cheaply,
    // residual at the edge, pq honestly fails)
    "sim_ann_nprobe_autotune" -> ((s, d) =>
      Similarity.annNprobeAutoTune(s, Tables.embeddings(s, d),
        WarmIndex.ivfPq(s, d), WarmIndex.ivfPqResidual(s, d),
        WarmIndex.ivfSq(s, d), target = NprobeTarget)),
    // EXTERNAL-query-vector entry points: query vectors arrive as a
    // caller-supplied (qid, v) frame — the 100 TB shape — instead of the
    // fixture's point-scan of the standing index; rows must be identical
    // to the fixture form for identical vectors (same oracle)
    "sim_ann_ivf_external" -> ((s, d) =>
      Similarity.annIvfIndexedTopK(s, WarmIndex.ivf(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("v")),
        3, 2)),
    "sim_ann_ivfpq_external" -> ((s, d) =>
      Similarity.annIvfPqIndexedTopK(s, WarmIndex.ivfPq(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("v")),
        3, 2, 10)),
    // quantizer-drift audit: vectors whose cell differs between the
    // frozen base-trained quantizer and full retraining — the number
    // that schedules re-training in the ingest-vs-retrain trade
    "sim_ann_ivf_drift" -> ((s, d) => Similarity.annIvfDrift(Tables.embeddings(s, d))),
    // the drift-triggered RETRAIN policy: base-built index + delta ingest
    // (frozen quantizer), then two decisions against the live index —
    // threshold 1.0 (no-op; the frozen quantizer survives) and 0.0
    // (fires; quantizer retrained on the full corpus, lists rebuilt).
    // Both decision rows carry the SAME pre-retrain drift (measured
    // before any rebuild), so the pair is oracle-reproducible
    "sim_ann_ivf_retrain" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-retrain")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), "graft_idx.ivfr")
      Similarity.ivfIndexDelta("graft_idx.ivfr", emb.filter(col("vec_id") % 5 === 0))
      val below = Similarity.retrainIfNeeded(s, "graft_idx.ivfr", emb, 1.0)
      val above = Similarity.retrainIfNeeded(s, "graft_idx.ivfr", emb, 0.0)
      below.unionByName(above).orderBy(col("threshold"))
    }),
    // SemDeDup semantic dedup: trained-quantizer cells, within-cell
    // cosine, keep the lowest-centroid-similarity member of each
    // duplicate group (arXiv:2303.09540's keep rule, vec_id-tiebroken)
    "dedup_semantic" -> ((s, d) => Similarity.semanticDedup(Tables.embeddings(s, d))),
    // ANN quality gate: recall@3 of the multi-probe ANN vs brute force —
    // the price of the candidate pruning, per query id.
    "sim_ann_recall" -> ((s, d) => Similarity.annRecall(Tables.embeddings(s, d))),
    // custom TopKPerKey physical operator (partial/final heap split); same
    // semantics as the window form, k rows shuffled per key per partition
    "sim_topk_custom" -> ((s, d) => {
      graft.functions.DotProduct.register(s) // cosine's native kernel
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosine(col("v"), col("qv")), 6).as("cos"))
      graft.plans.TopK.perKey(scored, Seq("qid"), "cos", "vec_id", 5)
        .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cos"))
        .orderBy(col("qid"), desc("cos"), col("vec_id"))
    }),
    // misc surface: ping (S7), JSON shaping (F13)
    // F5's exact quirk under the gate: case-insensitive intersection that
    // KEEPS the left argument's original casing (student_service.py:155) —
    // raw-cased document words vs a mixed-case probe list.
    "f5_keepcase_intersect" -> ((s, d) => {
      val rawWords = split(
        regexp_replace(trim(col("text")), s"${Dedup.WsClass}+", " "), " ")
      Tables.documents(s, d).select(col("doc_id"),
        array_join(functions.Norm.intersectKeepLeft(
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
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(s, Multimodal.mediaTable(Tables.documents(s, d)))),
    "mm_frames" -> ((s, d) =>
      Multimodal.frameSample(Multimodal.mediaTable(Tables.documents(s, d)))),
    // audio analog: PCM frame windows with integer-exact features
    // (energy/peak/zero-crossings); decode stubbed, plumbing real
    "mm_audio_frames" -> ((s, d) =>
      Multimodal.audioFrames(Multimodal.mediaTable(Tables.documents(s, d)))),
    // REAL decode -> nearest-neighbor resample; the resized corner pixel
    // value-checks the pipeline against closed-form md5 arithmetic
    "mm_resize" -> ((s, d) =>
      Multimodal.resizeImages(s, Multimodal.mediaTable(Tables.documents(s, d)))),
    // training-data pipeline: text cleaning (markup/URL strip + ws collapse;
    // the corpus is synthetic-clean, so the gate wraps docs in deterministic
    // markup first — see TextAnalysis.withMarkup)
    "text_clean" -> ((s, d) => TextAnalysis.textClean(Tables.documents(s, d))),
    // training-data pipeline: stateless reproducible train/val/test split
    // (hash-keyed, no RNG — the only split semantics that survive retries
    // and repartitioning at 100 TB)
    "sample_split" -> ((s, d) => Sampling.hashSplit(Tables.documents(s, d))),
    // leakage-safe split: near-dup COMPONENTS are the split unit (a
    // near-copy of a test doc can never land in train); singletons keep
    // their hashSplit assignment exactly
    "sample_split_safe" -> ((s, d) =>
      Sampling.leakageSafeSplit(Tables.documents(s, d))),
    // grouped exact percentiles (sort-based agg next to a5's global form)
    "a9_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
        .orderBy(col("l_returnflag"))),
    // EXACT quantiles by histogram bisection — the scale path the exact
    // `percentile` aggregate (a9) lacks: log_B(domain) map-side-combined
    // count passes with O(B) driver state, vs a value->count map per agg
    // buffer (memory ∝ distinct values — the thing that OOMs at 100 TB)
    "a14_exact_quantile" -> ((s, d) =>
      Quantiles.priceQuantiles(Tables.lineitem(s, d))),
    // per-group lockstep: one (lo, hi, k) cell per (group, q), the join
    // gains a group-equality conjunct — still ONE scan per pass total
    "a15_quantile_grouped" -> ((s, d) =>
      Quantiles.priceQuantilesByFlag(Tables.lineitem(s, d))),
    // time-series gap-fill: dense per-user daily counts, zero-filled
    "w6_gapfill" -> ((s, d) => Windows.gapfillDaily(Tables.events(s, d))),
    // JSON path extraction over event props (the parse direction of F13's
    // to_json shaping) + per-type aggregate
    "f14_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),
    // training-data pipeline: Gopher-style per-doc repetition signals
    // (dup-word / top-word / top-bigram fractions + flag)
    "text_repetition" -> ((s, d) => TextAnalysis.repetition(Tables.documents(s, d))),
    // training-data pipeline: benchmark decontamination — 3-shingle overlap
    // of every training doc against the held-out src0 eval slice
    "decontam_overlap" -> ((s, d) => Decontam.overlap(Tables.documents(s, d))),
    // decontamination, sketch-pruned: eval side compressed to a broadcast
    // bloom filter probed at scan time (native expression), exact verify
    // on the collided sliver only — same result, ~20x smaller exchange
    "decontam_bloom" -> ((s, d) => Decontam.overlapBloom(Tables.documents(s, d))),
    // training-data pipeline: PII redaction (emails/IPv4/phones) with a
    // zero-residual certificate; corpus is synthetic-clean so the gate
    // injects deterministic PII first — see TextAnalysis.withPii
    "text_pii" -> ((s, d) => TextAnalysis.piiRedact(Tables.documents(s, d))),
    // training-data pipeline: per-source hash quota sample through the
    // custom TopKPerKey operator (bounded map-side heaps, no per-source
    // single-reducer window)
    "sample_stratified" -> ((s, d) => Sampling.stratifiedQuota(Tables.documents(s, d))),
    // training-data pipeline: context-window chunking (32-token sequences,
    // ragged tail; chunks reassemble to the normalized doc — spec-certified)
    "text_chunks" -> ((s, d) => TextAnalysis.chunks(Tables.documents(s, d))),
    // overlapping sliding-window chunking (32-token windows every 24) —
    // the retrieval-embedding prep twin; boundary-spanning facts stay
    // inside at least one chunk
    "text_chunks_overlap" -> ((s, d) =>
      TextAnalysis.chunksOverlap(Tables.documents(s, d))),
    // training-data pipeline: weighted source mixing (per-domain hash
    // thresholds against a broadcast weights dim — the mixture recipe step)
    "sample_mix" -> ((s, d) => Sampling.weightedMix(Tables.documents(s, d))),
    // temperature-scaled mixture (α = 0.5 — the sqrt special case,
    // chosen because IEEE sqrt is correctly rounded and pow is not):
    // source share ∝ √n_s, exact-integer targets, md5-ranked keep prefix
    "sample_mix_temperature" -> ((s, d) =>
      Sampling.temperatureMix(Tables.documents(s, d))),
    // weighted sampling without replacement (A-ES keys, hash-uniform u,
    // TakeOrderedAndProject cut)
    "sample_weighted" -> ((s, d) => Sampling.weightedSample(Tables.documents(s, d))),
    // token-budgeted mixture: per-source TOKEN quotas (recipes are
    // specified in tokens), admission by source-local running sum
    "sample_token_budget" -> ((s, d) => Sampling.tokenBudget(Tables.documents(s, d))),
    // KMV cardinality sketch (the oracle-able approx-distinct; estimate is
    // a pure function of the k-th smallest md5, maintained by TopKPerKey's
    // bounded heaps) with the exact count alongside
    "a10_kmv_distinct" -> ((s, d) =>
      Sketches.kmvDistinct(Tables.lineitem(s, d), "l_returnflag", "l_orderkey")),
    // Count-Min heavy-hitter audit: exact top-20 terms vs their CMS
    // estimate; map-side partial agg IS the sketch merge
    // EXACT heavy hitters (every term with freq > n/(k+1)) in two passes:
    // per-partition Misra-Gries summaries (O(k) task state — no
    // vocabulary-sized agg state) -> broadcast candidate superset ->
    // exact counts of candidates only; the threshold applies to EXACT
    // counts, so MG internals never touch the result
    "sketch_mg_heavy" -> ((s, d) =>
      Sketches.mgHeavyHitters(Tables.documents(s, d))),
    "sketch_cms_topterms" -> ((s, d) =>
      Sketches.cmsHeavyHitters(Tables.documents(s, d))),
    // near-dup clustering: GraphX connected components over the verified
    // Jaccard pairs; oracle = recursive-CTE reachability closure
    "dedup_components" -> ((s, d) =>
      Dedup.nearDupComponents(Tables.documents(s, d))),
    // near-dup cluster density: per-doc triangle counts (clique vs chain)
    "graph_triangles" -> ((s, d) =>
      Dedup.nearDupTriangles(Tables.documents(s, d))),
    // link prediction: neighbor-set jaccard per anchor edge (wedge join,
    // never all-pairs), top-3 partners per anchor
    "graph_node_similarity" -> ((s, d) =>
      graft.graph.GraphOps.nodeSimilarity(Tables.students(s, d))),
    // training-data pipeline: sequence packing — concat-then-chunk slot
    // assignment over (lang, shard) prefix sums; shard = portable md5
    // bucket so the only shuffle's cardinality is a config knob
    "pack_sequences" -> ((s, d) => Packing.packSequences(Tables.documents(s, d))),
    // packing-efficiency inventory: sequences + pad tokens per shard
    "pack_stats" -> ((s, d) => Packing.packingStats(Tables.documents(s, d))),
    // lexical retrieval: BM25 top-k for a fixed term set — per-doc tfs in
    // the scan, corpus stats as one broadcast row, TakeOrderedAndProject
    "bm25_search" -> ((s, d) => Search.bm25TopK(Tables.documents(s, d))),
    // positional lexical retrieval: exact-phrase match computed IN the
    // scan (filter over token-start offsets — no explode, no per-token
    // rows) ranked by occurrence count, and proximity search ranked by
    // the closest (a, b) pair within the token window
    "bm25_phrase" -> ((s, d) => Phrase.phraseTopK(Tables.documents(s, d))),
    "bm25_proximity" -> ((s, d) =>
      Phrase.proximityTopK(Tables.documents(s, d))),
    // phrase probe off the MATERIALIZED positional index (term-bucketed
    // (term, doc_id, positions[]) rows): `term IN (phrase)` prunes the
    // scan to the phrase's postings, one df-bounded groupBy pivots to a
    // term->positions map, shifted sorted-array intersection yields the
    // match starts — must equal bm25_phrase row-for-row (PhraseSpec)
    "bm25_phrase_indexed" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pos-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Phrase.buildPositional(Tables.documents(s, d), "graft_idx.pos")
      Phrase.phraseIndexedTopK(s, "graft_idx.pos")
    }),
    // QUERY-ONLY twin off the session-prebuilt positional index: times
    // the pruned-probe + intersection path alone (the repeated-query
    // regime the positional index exists for)
    "bm25_phrase_query" -> ((s, d) =>
      Phrase.phraseIndexedTopK(s, WarmIndex.positional(s, d))),
    // BATCH phrase probe off the warm index: union-of-terms pruned scan,
    // one shared term->positions pivot, per-phrase guarded cuts
    "bm25_phrase_batch" -> ((s, d) =>
      Phrase.phraseIndexedBatch(s, WarmIndex.positional(s, d))),
    // tombstone deletion for the positional family: delete IS the
    // sidecar append (no corpus-stats sidecar to correct), the probe's
    // broadcast anti-join hides victims immediately — same rebuild-
    // without-victims oracle discipline as bm25_index_delete
    "bm25_phrase_delete" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pos-del")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Phrase.buildPositional(docs, "graft_idx.posdel")
      Phrase.positionalDelete("graft_idx.posdel",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      Phrase.phraseIndexedTopK(s, "graft_idx.posdel")
    }),
    // FULL-CRUD lifecycle for the positional family: build 80% ->
    // delta-ingest 20% (guarded) -> delete every 7th doc (victims span
    // both generations) -> compact (folds generations + tombstones,
    // one guard bloom) -> query
    "bm25_phrase_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pos-life")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Phrase.buildPositional(docs.filter(col("doc_id") % 5 =!= 0),
        "graft_idx.poslife")
      Phrase.positionalDelta("graft_idx.poslife",
        docs.filter(col("doc_id") % 5 === 0))
      Phrase.positionalDelete("graft_idx.poslife",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      Phrase.positionalCompact(s, "graft_idx.poslife")
      Phrase.phraseIndexedTopK(s, "graft_idx.poslife")
    }),
    // hybrid retrieval: BM25 + tf-idf rankings off ONE shared projection,
    // fused by reciprocal rank (RRF) — bounded top-k cuts, 2k-row fusion
    "search_hybrid_rrf" -> ((s, d) => Search.hybridRrf(Tables.documents(s, d))),
    // TRUE lexical+dense hybrid: BM25 fused (RRF) with the cosine ranking
    // over bridge-pooled doc embeddings (vec_id -> doc_id, integer-sum
    // pooling) — two bounded cuts, <=2k-row full-outer fuse
    "search_hybrid_dense" -> ((s, d) =>
      Search.hybridRrfDense(Tables.documents(s, d), Tables.embeddings(s, d))),
    // scale-path dense half: the query probes its sign-sketch bucket +
    // Hamming-1 neighbors over the pooled doc vectors instead of scanning
    // them all — candidates ~(1+planes)/2^planes of the corpus
    "search_hybrid_dense_ann" -> ((s, d) =>
      Search.hybridRrfDenseAnn(Tables.documents(s, d), Tables.embeddings(s, d))),
    // BATCH hybrid off the STANDING indexes: one (qid, q, v) frame — text
    // + its embedding, the production query-service shape — through the
    // shared-postings batch BM25 leg and the DPP-pruned external ANN leg,
    // bridged to doc space and RRF-fused per qid. Both warm indexes are
    // session-prebuilt, so the row prices the two query paths + fuse
    "search_hybrid_batch" -> ((s, d) => {
      import s.implicits._
      val qv = Tables.embeddings(s, d).filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("v"))
      Search.hybridRrfBatch(s, WarmIndex.bm25(s, d), WarmIndex.ivf(s, d),
        batchBm25Queries.toDF("qid", "q").join(qv, "qid"))
    }),
    // BM25 off the MATERIALIZED inverted index (term-bucketed postings +
    // 1-row stats): build once, query without a corpus scan — must equal
    // bm25_search row-for-row (same score expression, same doubles)
    "bm25_indexed" -> ((s, d) => {
      // fresh temp location per session: a stale warehouse dir from an
      // earlier JVM would otherwise collide with the fresh catalog
      // (locationAlreadyExists); within a session IF NOT EXISTS + the
      // known table make rebuilds plain overwrites
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-idx")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      Search.buildIndex(Tables.documents(s, d), "graft_idx.bm25")
      Search.bm25Indexed(s, "graft_idx.bm25")
    }),
    // QUERY-ONLY twin off the session-prebuilt index (WarmIndex): times
    // the postings probe + score alone — bm25_indexed prices build +
    // query together, so a query-path regression could hide in build
    // noise. Same oracle as the scan-time and build+query rows
    "bm25_query" -> ((s, d) => Search.bm25Indexed(s, WarmIndex.bm25(s, d))),
    // BATCH BM25 off the standing index: a (qid, q) DataFrame served in
    // ONE shared postings pass — tokenization, df, and scoring all
    // in-engine (the DataFrame-native batch contract shared with
    // fuzzy_search_batch); per-(query, doc) scores fold in sorted term
    // order so the doubles are engine-reproducible. Covers an exact-term
    // anchor, a disjoint term set, a no-hit query, and a duplicate-term
    // query (dedup semantics)
    "bm25_search_batch" -> ((s, d) => {
      import s.implicits._
      Search.bm25TopKBatch(s, WarmIndex.bm25(s, d),
        batchBm25Queries.toDF("qid", "q"), 10)
    }),
    // per-TERM posting-list skew stats off the standing index — the
    // probe-skew predictor for the lexical family (a query's cost is
    // the df of its terms), the annIvfIndexStats shape
    "bm25_index_stats" -> ((s, d) => Search.indexStats(s, WarmIndex.bm25(s, d))),
    // positional-family twin of bm25_index_stats, + the positions
    // dimension (largest single position list = in-row intersection cost)
    "phrase_index_stats" -> ((s, d) =>
      Phrase.positionalStats(s, WarmIndex.positional(s, d))),
    // incremental maintenance of the standing index: base build on 80% of
    // the corpus, delta-ingest the rest (postings derived from the DELTA
    // ALONE, appended bucketed; stats merge additively), then query — must
    // STILL equal the full-corpus scan-time bm25 row-for-row
    "bm25_index_delta" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-delta")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Search.buildIndex(docs.filter(col("doc_id") % 5 =!= 0), "graft_idx.bm25d")
      Search.indexDelta("graft_idx.bm25d", docs.filter(col("doc_id") % 5 === 0))
      Search.bm25Indexed(s, "graft_idx.bm25d")
    }),
    // index-lifecycle capstone: build -> delta ingest -> COMPACT (postings
    // rewritten to build-fresh bucket layout, additive stats folded to one
    // row, one guard bloom) -> query. Same oracle as the delta row:
    // compaction is layout-only and must not move a single result
    "bm25_index_compact" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-compact")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Search.buildIndex(docs.filter(col("doc_id") % 5 =!= 0), "graft_idx.bm25c")
      Search.indexDelta("graft_idx.bm25c", docs.filter(col("doc_id") % 5 === 0))
      Search.compactIndex(s, "graft_idx.bm25c")
      Search.bm25Indexed(s, "graft_idx.bm25c")
    }),
    // DELETION from the standing postings — the tombstone lifecycle for
    // the lexical family: delete = sidecar append + ONE negative additive
    // stats row (never a postings rewrite); the probe anti-joins the
    // broadcast sidecar BEFORE the df aggregate, so the scores are
    // EXACTLY the rebuild-without-victims scores (df, n_docs, avgdl all
    // reflect the surviving corpus — spec-gated row identity, and this
    // oracle recomputes the whole chain over the surviving docs)
    "bm25_index_delete" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-del")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Search.buildIndex(docs, "graft_idx.bm25del")
      Search.indexDelete("graft_idx.bm25del",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      Search.bm25Indexed(s, "graft_idx.bm25del")
    }),
    // COMPACTION ADVICE: the tombstone dead-fraction (the probe tax
    // every query pays until the rewrite) turned into a maintenance
    // decision — the fixture's ~31% dead postings cross the threshold
    "bm25_compaction_advice" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-adv")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Search.buildIndex(docs, "graft_idx.bm25adv")
      Search.indexDelete("graft_idx.bm25adv",
        docs.filter(col("doc_id") % 7 === 3 || col("doc_id") % 5 === 0)
          .select(col("doc_id")))
      Tombstones.compactionAdvice(s, "graft_idx.bm25adv",
        s.table("graft_idx.bm25adv_postings"), "doc_id", CompactThreshold)
    }),
    // FULL-CRUD lifecycle capstone: build 80% -> delta-ingest 20% ->
    // delete every 7th doc (victims span BOTH generations) -> compact
    // (folds the delta generations AND the tombstones physically, stats
    // to one row, guard to one bloom) -> query. The one row that prices
    // the whole maintenance story end-to-end; same rebuild-without-
    // victims oracle as the delete rows
    "bm25_index_lifecycle" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-life")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Search.buildIndex(docs.filter(col("doc_id") % 5 =!= 0),
        "graft_idx.bm25life")
      Search.indexDelta("graft_idx.bm25life",
        docs.filter(col("doc_id") % 5 === 0))
      Search.indexDelete("graft_idx.bm25life",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      Search.compactIndex(s, "graft_idx.bm25life")
      Search.bm25Indexed(s, "graft_idx.bm25life")
    }),
    // STREAMING deletion: the takedown feed as a real bounded stream —
    // two micro-batches whose victim sets OVERLAP (the second file
    // redelivers every id of the first plus the rest), so the benched
    // row itself proves at-least-once replay safety: freshOnly makes
    // the re-delivered ids no-ops (no double-subtracted stats). After
    // the drain, probes answer the same rebuild-without-victims oracle
    // as the batch delete row
    "stream_index_delete" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-sdel")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      Search.buildIndex(docs, "graft_idx.bm25sdel")
      val victims = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"))
      val feed = java.nio.file.Files.createTempDirectory("graft-del-feed")
        .toFile.getAbsolutePath + "/in"
      victims.filter(col("doc_id") % 2 === 1).repartition(1)
        .write.parquet(feed)
      victims.repartition(1).write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalDeletion(
        s.readStream.schema(victims.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        Search.indexDelete("graft_idx.bm25sdel", _))
      q.processAllAvailable(); q.stop()
      Search.bm25Indexed(s, "graft_idx.bm25sdel")
    }),
    // streaming ANN ingest: base-built IVF index (frozen quantizer),
    // the remaining vectors arrive as a REAL bounded stream ingested via
    // the idempotent guard path — after the drain, index-served ANN must
    // answer the same oracle as the batch delta/compact rows
    "stream_ann_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivf-stream")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), "graft_idx.ivfs")
      val feed = java.nio.file.Files.createTempDirectory("graft-emb-feed")
        .toFile.getAbsolutePath + "/in"
      val delta = emb.filter(col("vec_id") % 5 === 0)
      delta.filter(col("vec_id") % 2 === 0).repartition(1).write.parquet(feed)
      delta.filter(col("vec_id") % 2 === 1).repartition(1)
        .write.mode("append").parquet(feed)
      val q = s.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.ivfIndexDeltaIdempotent("graft_idx.ivfs", batch)
          // scheduled maintenance, default bounds (generations + sidecar
          // bytes) — a no-op at this scale, wired so the streaming path
          // exercises the same policy the bm25 ingest runs
          Similarity.compactIvfIfNeeded(s, "graft_idx.ivfs")
          ()
        }
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      Similarity.annIvfIndexedTopK(s, "graft_idx.ivfs")
    }),
    // streaming ingest into the PQ-FUSED index: base build freezes BOTH
    // quantizers, the remaining vectors stream through the idempotent
    // fused path (assigned + PQ-encoded per micro-batch against the
    // stored artifacts). After the drain, the ADC-shortlist-rescore
    // query must answer the same oracle as the batch fused-delta row —
    // the full 100 TB ANN lifecycle (build → stream → maintain → query)
    // now exists for the compressed-domain index too
    "stream_ivfpq_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq-stream")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val emb = Tables.embeddings(s, d)
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "graft_idx.ivfpqs")
      val feed = java.nio.file.Files.createTempDirectory("graft-pq-feed")
        .toFile.getAbsolutePath + "/in"
      val delta = emb.filter(col("vec_id") % 5 === 0)
      delta.filter(col("vec_id") % 2 === 0).repartition(1).write.parquet(feed)
      delta.filter(col("vec_id") % 2 === 1).repartition(1)
        .write.mode("append").parquet(feed)
      val q = s.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.ivfPqIndexDeltaIdempotent("graft_idx.ivfpqs", batch)
          Similarity.compactIvfIfNeeded(s, "graft_idx.ivfpqs")
          ()
        }
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      Similarity.annIvfPqIndexedTopK(s, "graft_idx.ivfpqs")
    }),
    // streaming ingest into the standing index — a REAL bounded stream
    // (file source, one file per micro-batch, foreachBatch -> idempotent
    // delta ingest; batch 0 bootstraps the empty catalog). After the
    // stream drains, the index must answer the full-corpus BM25 oracle —
    // the same SQL every other bm25 path is gated on.
    "stream_index_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bm25-stream")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      val feed = java.nio.file.Files.createTempDirectory("graft-docs-feed")
        .toFile.getAbsolutePath + "/in"
      docs.filter(col("doc_id") % 2 === 0).repartition(1)
        .write.parquet(feed)
      docs.filter(col("doc_id") % 2 === 1).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalIndexing(
        s.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.bm25s")
      q.processAllAvailable(); q.stop()
      Search.bm25Indexed(s, "graft_idx.bm25s")
    }),
    // streaming ingest into the standing FUZZY index: file-source
    // micro-batches through the idempotent gram-posting path (batch 0
    // bootstraps the empty catalog; compaction policy runs per batch);
    // the drained index must answer the scan-path fuzzy oracle
    // streaming ingest into the positional index: two micro-batches
    // through the idempotent delta; a drained stream answers the same
    // phrase oracle as a one-shot build (7th-family streaming symmetry)
    "stream_phrase_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-pos-stream")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val docs = Tables.documents(s, d)
      val feed = java.nio.file.Files.createTempDirectory("graft-pos-feed")
        .toFile.getAbsolutePath + "/in"
      docs.filter(col("doc_id") % 2 === 0).repartition(1).write.parquet(feed)
      docs.filter(col("doc_id") % 2 === 1).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalPositionalIndexing(
        s.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.poss")
      q.processAllAvailable(); q.stop()
      Phrase.phraseIndexedTopK(s, "graft_idx.poss")
    }),
    "stream_fuzzy_ingest" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-fuzzy-stream")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val st = Tables.students(s, d)
      val feed = java.nio.file.Files.createTempDirectory("graft-st-feed")
        .toFile.getAbsolutePath + "/in"
      st.filter(col("id") % 2 === 0).repartition(1).write.parquet(feed)
      st.filter(col("id") % 2 === 1).repartition(1)
        .write.mode("append").parquet(feed)
      val q = graft.streaming.Streams.incrementalFuzzyIndexing(
        s.readStream.schema(st.schema).option("maxFilesPerTrigger", 1)
          .parquet(feed),
        "graft_idx.fuzzys")
      q.processAllAvailable(); q.stop()
      FuzzySearch.topKIndexed(s, "graft_idx.fuzzys", fuzzyQuery)
    }),
    // keyword extraction: full-vocab tf-idf, min-df pruned before the
    // join back, per-doc top-3 through the bounded TopKPerKey heaps
    "text_keywords" -> ((s, d) => Search.keywords(Tables.documents(s, d))),
    // corpus-trained bigram LM fluency score (quantized logprobs ->
    // exact integer sums, the order-free mean discipline)
    "text_lm_score" -> ((s, d) => TextAnalysis.lmScore(Tables.documents(s, d))),
    // ordered funnel: per-user strictly-increasing view->click->purchase
    // stage times via shrinking min-agg joins, no sequence explode
    "w8_funnel" -> ((s, d) => Windows.funnel(Tables.events(s, d))),
    // retention triangle: first-day cohorts x activity-day offsets
    "w9_retention" -> ((s, d) => Windows.retentionCohorts(Tables.events(s, d))),
    // SCD2 dimension build: effective-dated customer-priority versions,
    // run-length-merged, all windows sharing one o_custkey exchange
    "scd2_priority" -> ((s, d) => Scd.customerPriorityScd2(Tables.orders(s, d))),
    // SCD2 consumption: point-in-time lookup (custkey equi-join, interval
    // residual) — the no-future-leakage attribute resolution
    "scd2_asof_lookup" -> ((s, d) => Scd.asOfLookup(Tables.orders(s, d))),
    // SCD2 INCREMENTAL maintenance: build the dimension from history up
    // to a cutoff, then APPLY the rest as a delta feed — only affected
    // keys re-windowed (current rows + delta; closed history and
    // unaffected keys pass through verbatim), result row-identical to
    // the full rebuild (the scd2_priority oracle, verbatim)
    "scd2_apply" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cut = to_date(lit("1996-01-01"))
      // the standing dim is materialized (in real use it IS a table;
      // an unmaterialized build would re-run its windows per consumer)
      val dim = Scd.scd2Build(o.filter(col("o_orderdate") <= cut),
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .localCheckpoint()
      Scd.scd2Apply(dim, o.filter(col("o_orderdate") > cut),
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .select(col("o_custkey"), col("version"), col("valid_from"),
          col("valid_to"), col("o_orderpriority").as("priority"),
          col("is_current"))
        .orderBy(col("o_custkey"), col("version"))
    }),
    // ANALYZE-style profiling: all columns in one scan, long-form stats
    "profile_orders" -> ((s, d) => Profile.ordersProfile(Tables.orders(s, d))),
    // equi-depth histogram: exact ntile deciles, but distributed — global
    // rank from a range-partitioned sort + per-partition offsets instead
    // of the single-task global window (see Histograms.equiDepth)
    "a12_equidepth" -> ((s, d) =>
      Histograms.equiDepth(Tables.orders(s, d),
        col("o_totalprice"), col("o_orderkey"))),
    // 3-sigma outlier counts: exact integer moments (cents), identically-
    // spelled IEEE mean/std in both engines
    "a13_outliers" -> ((s, d) => Histograms.outliers(Tables.events(s, d))),
    // equi-width histogram: global [min,max] edges as a 1-row broadcast,
    // bucket index per-row in the scan, one small groupBy — the
    // distribution profile behind skew diagnosis and range layout
    "a11_histogram" -> ((s, d) =>
      Histograms.equiWidth(Tables.orders(s, d), col("o_totalprice"))),
    // IVF-training building block: per-label quantized centroids via the
    // typed vector-sum Aggregator (fixed-size partial buffers, exact
    // integer sums — layout-independent, hence oracle-able)
    "sim_centroids" -> ((s, d) => Centroids.labelCentroids(Tables.embeddings(s, d))),
    // one k-means assignment step vs those centroids: broadcast k·dims
    // literals, integer-space distances (exact, order-free), argmin with
    // label tie-break
    "sim_kmeans_assign" -> ((s, d) => Centroids.kmeansAssign(Tables.embeddings(s, d))),
    // PQ encode: 8 codes per vector from subspace-restricted codebooks —
    // the 32x compression step of the ANN ladder, exact integer argmins
    "sim_pq_codes" -> ((s, d) => Centroids.pqCodes(Tables.embeddings(s, d))),
    // PQ quality gate: recall@3 of LUT-based ADC search vs exact L2 —
    // prices the compression the way sim_ann_recall prices the pruning
    "sim_pq_recall" -> ((s, d) => Centroids.pqRecall(Tables.embeddings(s, d))),
    // full IVF-PQ ladder: sign-sketch bucket pruning + ADC compression,
    // recall priced together
    "sim_ivfpq_recall" -> ((s, d) =>
      Centroids.pqRecall(Tables.embeddings(s, d), bucketPrune = true)),
    // relative quality gate: per-source p25 stopword-ratio threshold
    // (broadcast dim of |sources| rows), not a global constant
    "text_quality_gate" -> ((s, d) =>
      TextAnalysis.qualityGate(Tables.documents(s, d))),
    // per-source quality CALIBRATION: the whole distribution as ranks
    // (comparable across sources), not just one fixed percentile cut
    "text_quality_rank" -> ((s, d) =>
      TextAnalysis.qualityRank(Tables.documents(s, d))),
    // SymSpell fuzzy join: deletion-neighborhood blocking (bounded len+1
    // fan-out, hash-equi join) -> exact levenshtein verify on candidates
    "fuzzy_join_sym" -> ((s, d) => FuzzyJoin.matchTokens(Tables.documents(s, d))),
    // snapshot diff: |Δ|-sized changelog between two corpus versions via
    // full-outer id join on content fingerprints
    "snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Snapshot.diff(Snapshot.oldSnapshot(docs), Snapshot.newSnapshot(docs))
    }),
    // changelog apply: roll the old snapshot forward (anti-join + union);
    // diff∘apply == identity, oracled against the new snapshot itself
    "snapshot_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = Snapshot.oldSnapshot(docs)
      Snapshot.applyChangelog(old,
        Snapshot.diff(old, Snapshot.newSnapshot(docs)))
    }),
    // write-layout key: the 62-bit Z-curve interleave of (user_id, day) —
    // the sort key Layout.writeZOrdered files by (native codegen expr)
    "layout_zvalue" -> ((s, d) => {
      graft.functions.ZValue.register(s)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
        .withColumn("z", call_function("z_value", col("user_id"), col("day")))
        .orderBy(col("z"), col("event_id"))
    }),
    // directory partition pruning: write date-partitioned, read one week
    // back — the scan lists only the 7 matching event_date=… directories
    // (plan-guarded in LayoutSpec)
    "layout_datepart" -> ((s, d) => {
      val dir = sys.props("java.io.tmpdir") + "/graft_datepart_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Layout.writeDatePartitioned(Tables.events(s, d), dir)
      s.read.parquet(dir)
        .filter(col("event_date").between("2024-01-08", "2024-01-14"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
    // DATA-QUALITY GATE: a deterministically-corrupted orders load
    // (dup keys, negated prices, orphan custkeys) through the
    // constraint report — all row rules in ONE scan, uniqueness one
    // aggregate, FK one broadcast anti join
    "quality_report" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val corrupted = o
        .unionByName(o.filter(col("o_orderkey") % 1000 === 1))
        .unionByName(o.filter(col("o_orderkey") % 500 === 2)
          .withColumn("o_totalprice", -col("o_totalprice"))
          .withColumn("o_orderkey", col("o_orderkey") + 50000000L))
        .unionByName(o.filter(col("o_orderkey") % 700 === 3)
          .withColumn("o_custkey", col("o_custkey") + 1000000000L)
          .withColumn("o_orderkey", col("o_orderkey") + 60000000L))
      Quality.checkRows(corrupted, Seq(
          Quality.RowRule("positive(o_totalprice)",
            col("o_totalprice") <= 0),
          Quality.notNull("o_orderdate")))
        .unionByName(Quality.checkUnique(corrupted, Seq("o_orderkey")))
        .unionByName(Quality.checkFk(corrupted, "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy(col("rule"))
    }),
    // PER-GROUP QUALITY TRIAGE: which stratum produces the bad rows —
    // the same single scan as the global gate, stratified by key
    "quality_by_group" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val corrupted = o.unionByName(o.filter(col("o_orderkey") % 500 === 2)
        .withColumn("o_totalprice", -col("o_totalprice"))
        .withColumn("o_orderkey", col("o_orderkey") + 50000000L))
      Quality.checkRowsBy(corrupted, Seq("o_orderpriority"), Seq(
          Quality.RowRule("positive(o_totalprice)",
            col("o_totalprice") <= 0),
          Quality.notNull("o_orderdate")))
        .orderBy(col("o_orderpriority"), col("rule"))
    }),
    // FRESHNESS: newest landed partition vs the expected watermark —
    // metadata only ("is the table stale" must not read the table)
    "quality_freshness" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-qf")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      graft.sources.Layout.writeDatePartitionedTable(
        Tables.events(s, d), "graft_idx.events_fresh")
      Quality.checkFreshness(s, "graft_idx.events_fresh", "2024-01-30")
    }),
    // PARTITION COMPLETENESS: gap detection on a date-partitioned fact
    // as a metadata operation (catalog listing vs the continuous day
    // range — "did yesterday land" without reading yesterday)
    "quality_partitions" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-qp")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val ev = Tables.events(s, d).filter(
        !to_date(col("ts")).isin("2024-01-10", "2024-01-20"))
      graft.sources.Layout.writeDatePartitionedTable(
        ev, "graft_idx.events_gap")
      Quality.checkPartitionGaps(s, "graft_idx.events_gap")
    }),
    // RETENTION via partition drop: expiring data on a date-partitioned
    // fact is |expired partitions| catalog calls — METADATA ONLY (zero
    // scans, zero rewrites; spec-gates zero Spark jobs); the read
    // answers the survivors-only aggregate
    "layout_retention" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-ret")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      graft.sources.Layout.writeDatePartitionedTable(
        Tables.events(s, d), "graft_idx.events_ret")
      graft.sources.Layout.enforceRetention(
        s, "graft_idx.events_ret", "event_date", "2024-01-08")
      s.table("graft_idx.events_ret")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
    // IDEMPOTENT DAILY BACKFILL: one day's partition replaced with a
    // corrected load under dynamic partition overwrite (every other
    // day's files untouched); the SAME backfill re-runs inside the
    // priced row — re-running a daily job converges, never duplicates
    "layout_backfill_day" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-bf")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      val ev = Tables.events(s, d)
      graft.sources.Layout.writeDatePartitionedTable(
        ev, "graft_idx.events_bf")
      val corrected = ev.filter(
        to_date(col("ts")) === to_date(lit("2024-01-15")) &&
          col("user_id") % 10 =!= 7)
      graft.sources.Layout.backfillDay(s, "graft_idx.events_bf", corrected)
      graft.sources.Layout.backfillDay(s, "graft_idx.events_bf", corrected)
      s.table("graft_idx.events_bf")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
    // CO-LOCATED fact-fact join: both facts written bucketed on the
    // join key -> the SortMergeJoin consumes the bucketed scans with
    // ZERO exchange and zero sort on either side (plan-asserted in
    // BucketedJoinSpec) — at 100 TB the single biggest shuffle in the
    // q-series moved to write time, paid once
    "layout_bucketed_join" -> ((s, d) => {
      val wh = java.nio.file.Files.createTempDirectory("graft-buck")
        .toFile.getAbsolutePath
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_idx LOCATION '$wh'")
      graft.sources.Layout.writeBucketed(Tables.orders(s, d),
        "graft_idx.bko", "o_orderkey")
      graft.sources.Layout.writeBucketed(Tables.lineitem(s, d),
        "graft_idx.bkl", "l_orderkey")
      s.table("graft_idx.bko")
        .join(s.table("graft_idx.bkl"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(1 - CAST(l_discount AS DECIMAL(18,2)))"))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),
    // DYNAMIC partition pruning: the filter lives on a joined date dim,
    // not the fact — Spark pushes the dim's surviving keys into the
    // fact scan's partition filters at runtime (star-schema shape;
    // plan-guarded in LayoutSpec)
    "layout_dpp" -> ((s, d) => {
      // own directory: sharing layout_datepart's would let this builder's
      // overwrite invalidate a previously-constructed DataFrame's pinned
      // file listing if both queries are built before either executes
      val dir = sys.props("java.io.tmpdir") + "/graft_dpp_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Layout.writeDatePartitioned(Tables.events(s, d), dir)
      s.read.parquet(dir)
        .join(broadcast(graft.sources.Layout.dateDim(Tables.events(s, d))
          .filter(col("is_weekend"))), Seq("event_date"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
  )

  /** Headline subset timed by Bench (bench runs at sf0.1). */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q3_top_revenue", "q5_region_revenue", "q7_volume", "q9_profit",
    "q10_returned_items", "set_ops",
    "edges_backfill", "edges_skew_salted", "edges_skew_unsalted",
    "edges_skew_aqe",
    "j2_rare_token_pairs", "j3_recommend", "j8_asof_join",
    // both fuzzy scorers: the built-in levenshtein and the custom codegen
    // IndelRatio expression, so the custom path's cost is a recorded number
    "fuzzy_search_lev", "fuzzy_search_indel",
    "dedup_lsh_pairs", "dedup_ngram_jaccard", "dedup_jaccard_sliver",
    "dedup_simhash", "dedup_simhash_pairs",
    "text_quality", "sim_topk_bruteforce", "sim_ann_multiprobe", "mm_features",
    "w1_event_windows", "w2_sessionize", "graph_cc",
    // round-4 additions: the fact⋈fact-heavy q-series shapes
    "q12_priority_class", "q13_order_distribution", "q16_supplier_cnt",
    "q21_sole_returner", "q20_recent_concentration",
    // round-5 corpus-hygiene additions: the two with real shuffle work
    // (decontam's shingle join, repetition's cascaded gram aggregates)
    "decontam_overlap", "text_repetition",
    // near-dup clustering: LSH + verify + GraphX connected components —
    // the full dedup pipeline's cost in one number
    "dedup_components",
    // late round-5 additions with real shuffle/scan work: prefix-sum
    // packing, scan-time BM25, the three-window SCD2 chain, and the
    // full-outer snapshot diff
    "pack_sequences", "bm25_search", "scd2_priority", "snapshot_diff",
    // full-vocab keyword extraction: the explode-heavy text shape
    "text_keywords",
    // exact similarity join: prefix-filter candidates + sliver verify
    "dedup_prefix_pairs",
    // the capstone: gate -> dedup -> split -> pack in ONE DAG — the most
    // production-shaped query in the suite (round-6 verdict stretch item)
    "corpus_build",
    // round-7 additions: sketch-pruned decontam (times the sketch build
    // AND the pruned verify — the recorded price of the bloom path at
    // this fixture's ~39% hit rate) and the hybrid RRF fusion
    "decontam_bloom", "search_hybrid_rrf",
    // ---- round-8 widening: a gate that skips the expensive half of the
    // suite can hide a regression forever — every batch, non-trivial
    // oracle query is timed from here on (point lookups, 1-row ingest
    // rows, and streaming queries stay out: sub-ms or non-batch)
    // the remaining q-series
    "q2_top_acctbal", "q4_priority_exists", "q6_forecast_revenue",
    "q8_market_share", "q11_important_parts", "q14_promo_effect",
    "q15_top_supplier", "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive", "q22_idle_customers",
    // aggregates/sketches/histograms (a12's distributed equi-depth was
    // round 7's headline plan fix and had never been timed)
    "a5_stats", "a6_rollup", "a7_distinct_agg", "a8_cube", "a9_percentiles",
    "a10_kmv_distinct", "a11_histogram", "a12_equidepth",
    // graph family beyond CC
    "graph_degrees", "graph_khop", "graph_khop_paths", "graph_pagerank",
    "graph_triangles",
    // SCD2 consumption + snapshot apply (the diff was already timed)
    "scd2_asof_lookup", "snapshot_apply",
    // round-16: incremental SCD2 maintenance (affected-keys-only apply)
    // + its streaming twin (ledger-idempotent observation feed)
    "scd2_apply", "stream_scd2_apply",
    // similarity/ANN ladder beyond brute-force + multiprobe
    "sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivf_trained",
    "sim_ann_ivf_trained_recall", "sim_ann_ivf_indexed",
    "sim_ann_ivf_index_delta", "sim_ann_ivf_index_compact",
    "sim_ann_ivf_drift", "sim_ann_ivfpq_indexed", "sim_ann_ivfpq_index_delta",
    "sim_ann_ivfpq_residual", "sim_ann_ivfsq_indexed", "sim_ann_ivf_retrain",
    // round-13 query-only twins: the session-prebuilt index makes these
    // time the QUERY path alone (WarmIndex builds once; best-of-2 takes
    // the warm iteration) — the regime the *_indexed rows can't isolate
    "sim_ann_ivf_query", "sim_ann_ivfpq_query", "sim_ann_ivfsq_query",
    "sim_ann_ivfpqr_query", "bm25_query",
    // probe-bounded range search + the 1-row index maintenance stats
    "sim_ann_range_search", "sim_ann_index_stats",
    // q-gram-indexed fuzzy search (build + probe + rescore) + its
    // delta-maintained and compacted twins + the batch probe
    "fuzzy_search_indexed", "fuzzy_index_delta", "fuzzy_index_compact",
    "fuzzy_search_batch",
    // round-14: query-only fuzzy twin, batch BM25 off the warm index,
    // the per-gram/per-term posting-skew stats rows, and U2's
    // index-served token correction
    "fuzzy_search_query", "fuzzy_batch_query", "bm25_search_batch",
    "fuzzy_index_stats", "bm25_index_stats", "u2_token_correct_indexed",
    // the prefix-filtered (hot-gram-skipping) probe + query-only twin
    "fuzzy_search_skip", "fuzzy_skip_query",
    "sim_ann_recall", "sim_centroids",
    "sim_kmeans_assign", "sim_near_dup", "sim_pq_codes", "sim_pq_recall",
    "sim_ivfpq_recall",
    // sampling suite
    "sample_split", "sample_split_safe", "sample_stratified",
    "sample_weighted", "sample_mix", "sample_mix_temperature",
    // text family beyond quality/repetition/keywords
    "text_clean", "text_tokens", "text_langid", "text_langid_mixed",
    "text_fingerprint",
    "text_chunks", "text_chunks_overlap", "text_pii", "text_lm_score",
    "text_ngram_topk", "text_quality_gate", "text_quality_rank",
    // dedup family beyond the pair generators
    "dedup_exact", "dedup_canonical", "dedup_minhash_sig", "dedup_keepset",
    "dedup_incremental", "dedup_semantic",
    // joins/windows/layout/multimodal — j2_shares_interest is EXCLUDED by
    // design: its output is Θ(n²) (53M pairs at sf0.1) and SURVEY §2.3 says
    // "keep as correctness oracle only"; the scale path is the df-capped
    // j2_rare_token_pairs twin, which IS benched
    "fuzzy_join_sym", "j4_pair_relationship",
    "j9_range_join", "o3_topk_acctbal", "u2_token_correct",
    "w3_pivot", "w4_order_ranks", "w5_sliding_counts", "w6_gapfill",
    "w7_unpivot", "w8_funnel", "w9_retention",
    "layout_zvalue", "mm_frames", "mm_audio_frames", "pack_stats",
    // round-8 retrieval additions
    "bm25_indexed", "bm25_index_delta", "bm25_index_compact",
    "search_hybrid_dense", "search_hybrid_dense_ann",
    // the pre-training composition dashboard + tokenizer induction
    "corpus_report", "bpe_merges", "bpe_encode",
    // substring-level dedup: the passage table + per-doc span accounting
    "dedup_substring", "dedup_doc_spans",
    // CMS heavy-hitter audit + the token-budgeted mixture
    "sketch_cms_topterms", "sample_token_budget",
    // directory partition pruning (times the partitioned WRITE + the
    // pruned read, like bm25_indexed times build + query)
    "layout_datepart",
    // contrastive hard-negative mining + runtime (join-driven) pruning
    "sim_hard_negatives", "layout_dpp",
    // sketch-level dedup health (sizes the pair job before running it)
    // + the threshold sensitivity audit (prices the knob)
    "dedup_band_stats", "dedup_threshold_sweep",
    // the full-recipe capstone (keepSet + span gate + token budget + pack)
    "corpus_curate",
    // asymmetric containment + its sketch estimate
    "dedup_containment",
    // engine-portable 3-sigma outlier counts + the real pixel resize
    "a13_outliers", "mm_resize",
    // link prediction over the backfilled graph
    "graph_node_similarity",
    // round-15: tombstone deletion — build + delete + probe for both
    // families (the one lifecycle edge that was missing; prices the
    // sidecar append and the broadcast anti-join the probes now carry)
    "bm25_index_delete", "sim_ann_ivf_index_delete",
    // round-16: the fuzzy family's delete row completes the lifecycle
    "fuzzy_index_delete",
    // round-16: tombstone dead-fraction -> compaction decision
    "bm25_compaction_advice",
    // round-15: attribute-filtered ANN (predicate pushed into the
    // DPP-pruned candidate scan) + the measured pre-vs-post adjudication
    "sim_ann_filtered", "sim_ann_filtered_recall",
    // round-16: the filtered probe on the compressed rungs (predicate
    // BEFORE the lossy ADC shortlist cut) + the fused pre-vs-post
    // adjudication
    "sim_ann_filtered_fused", "sim_ann_filtered_sq",
    "sim_ann_filtered_residual", "sim_ann_filtered_fused_recall",
    "sim_ann_filtered_selectivity", "sim_ann_filtered_query",
    "sim_ann_label_matched",
    // round-16: streaming takedown feed with overlapping redelivery +
    // the full-CRUD lifecycle capstone
    "stream_index_delete", "bm25_index_lifecycle",
    "fuzzy_index_lifecycle", "sim_ann_ivf_lifecycle",
    // round-16: erasure reaches derived dedup state (6th family)
    "dedup_index_delete", "dedup_index_lifecycle", "stream_dedup_ingest",
    // round-16: incrementally-maintained materialized aggregate (IVM) +
    // the co-located fact-fact bucketed join
    "mv_orders_build", "mv_orders_lifecycle", "stream_mv_ingest",
    "mv_orders_cdc", "stream_mv_cdc", "layout_bucketed_join",
    // round-16: metadata-only retention + idempotent daily backfill
    "layout_retention", "layout_backfill_day",
    // round-16: the data-quality gate + metadata-only gap detection,
    // per-group triage, and metadata-only freshness
    "quality_report", "quality_partitions",
    "quality_by_group", "quality_freshness",
    // round-16: min/max IVM — insert-associative deltas + delete-time
    // affected-group recompute (the non-additive honest cost model)
    "mv_minmax_lifecycle",
    // round-16: the join-view (broadcast fact⋈dim delta maintenance)
    // and exact-count-distinct (refcounted support) IVM members, their
    // streaming twins, and CDC through the join view
    "mv_join_lifecycle", "mv_distinct_lifecycle",
    "mv_join_cdc", "stream_mv_distinct", "stream_mv_minmax",
    // round-16: top-k IVM (order statistics beyond extremes)
    "mv_topk_lifecycle",
    // round-16: dataset-version diff audit
    "corpus_diff",
    // round-16: positional lexical retrieval — scan-time phrase +
    // proximity, the positional-index build+probe row, and its warm
    // query-only twin (prices the pruned probe + intersection alone)
    "bm25_phrase", "bm25_proximity", "bm25_phrase_indexed",
    "bm25_phrase_query", "bm25_phrase_delete", "bm25_phrase_lifecycle",
    // round-16: exact quantiles by histogram bisection (log_B(domain)
    // count passes — the scale path the buffered percentile agg lacks)
    "a14_exact_quantile", "a15_quantile_grouped",
    // round-16: exact heavy hitters via two-pass Misra-Gries
    "sketch_mg_heavy",
    // round-16: streaming positional ingest (7th-family symmetry)
    "stream_phrase_ingest", "phrase_index_stats", "bm25_phrase_batch",
    // round-15: batch hybrid off the two warm standing indexes (shared
    // postings pass + DPP-pruned ANN probes + per-qid RRF fuse)
    "search_hybrid_batch")

  // ---------------------------------------------------------------- oracle

  /** Shared document-shingling CTEs (DuckDB lists are 1-based, Spark SQL
    * arrays 0-based — the index arithmetic differs accordingly but the
    * shingle strings are identical). */
  private val docNorm =
    "regexp_replace(lower(trim(text)), '[ \\t\\n\\f\\r]+', ' ', 'g')"
  private val shingleCtes: String =
    s"W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    "SH AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3 THEN " +
    "list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) " +
    "ELSE [array_to_string(w, ' ')] END)) AS sh FROM W), " +
    "SIG AS (SELECT doc_id, " +
    (0 until Dedup.NumHashes).map(i => s"min(md5('$i|' || sh)) AS h$i").mkString(", ") +
    " FROM SH GROUP BY doc_id), " +
    "BANDS AS (" +
    (0 until Dedup.NumBands).map(j =>
      s"SELECT doc_id, $j AS b, md5(h${2 * j} || h${2 * j + 1}) AS k FROM SIG")
      .mkString(" UNION ALL ") + "), " +
    "PAIRS AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst FROM BANDS a " +
    "JOIN BANDS b ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id)"

  /** SimHash-per-doc CTE chain (ends with SIG(doc_id, simhash)); mirrors
    * functions.SimHash32 bit-for-bit. */
  private val simhashCtes: String =
    s"WD AS (SELECT doc_id, unnest(string_split($docNorm, ' ')) AS wd FROM documents), " +
    "M AS (SELECT doc_id, md5(wd) AS m FROM WD), " +
    "B AS (SELECT doc_id, unnest(range(32)) AS b, m FROM M), " +
    "C AS (SELECT doc_id, b, 2 * (((strpos('0123456789abcdef', substr(m, CAST(b // 4 AS INT) + 1, 1)) - 1) " +
    ">> CAST(b % 4 AS INT)) & 1) - 1 AS contrib FROM B), " +
    "S AS (SELECT doc_id, b, sum(contrib) AS s FROM C GROUP BY doc_id, b), " +
    "SIG AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash " +
    "FROM S GROUP BY doc_id)"

  /** Word-anchored K-gram window CTE for substring-level dedup — windows
    * carry multiplicity (no distinct). Mirrors `Dedup.substringWindows`. */
  private val substrGramCte: String = {
    val k = graft.ops.Dedup.SubstrK
    s"W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    s"G AS (SELECT doc_id, array_to_string(w[i + 1:i + $k], ' ') AS gram " +
    s"FROM (SELECT doc_id, w, unnest(range(len(w) - ${k - 1})) AS i FROM W WHERE len(w) >= $k))"
  }

  private val eventWindowsSql: String =
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, " +
    "event_type, count(*) AS n, " +
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
    "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"

  private val embCtes: String =
    "E AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Shared sign-sketch bucket CTEs (E0 = vectors, E = vectors + bucket);
    * mirrors Similarity.bucketCol's md5-derived hyperplanes bit-for-bit. */
  private val annBucketCtes: String =
    "E0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
    "E AS (SELECT vec_id, v, array_to_string(list_transform(range(6), p -> " +
    "CASE WHEN list_sum(list_transform(range(64), d -> v[d+1] * " +
    "(CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1 " +
    "THEN 1.0 ELSE -1.0 END))) > 0 THEN '1' ELSE '0' END), '') AS bucket FROM E0)"

  /** Multi-probe probe set: the query's own bucket plus every Hamming-1
    * flip (mirrors Similarity.annMultiProbeTopK's probe expansion). */
  private val annMultiProbeQCte: String =
    "Q AS (SELECT vec_id AS qid, v AS qv, unnest([bucket] || list_transform(range(6), p -> " +
    "substr(bucket, 1, CAST(p AS INT)) || (CASE WHEN substr(bucket, CAST(p AS INT) + 1, 1) = '1' THEN '0' ELSE '1' END) || " +
    "substr(bucket, CAST(p AS INT) + 2, 6 - CAST(p AS INT) - 1))) AS bucket " +
    "FROM E WHERE vec_id < 8)"

  /** Trained-IVF CTE chain shared by `sim_ann_ivf_trained` and its recall
    * row: sim_kmeans_assign's quantization/centroid/distance CTEs, the
    * argmin cell per vector (rk = 1), the per-query nprobe=2 probe set
    * (rk <= 2), and cosine-ranked candidates from the cell equi-join.
    * Ends with R (ranked candidates); E0 stays open for the recall row's
    * brute-force side. `basePred` restricts which vectors TRAIN the
    * centroids (the frozen-quantizer delta-ingest oracle trains on the
    * base split only; assignment/probing always cover every vector). */
  private def ivfTrainedCtesFrom(basePred: String): String =
    ivfTrainedCtesFrom(basePred, 2)

  private def ivfTrainedCtesFrom(basePred: String, nprobe: Int): String =
    ivfTrainedCtesFrom(basePred, nprobe, "TRUE")

  /** `basePred` restricts which vectors TRAIN the centroids (frozen-
    * quantizer delta rows); `candPred` restricts which vectors may be
    * CANDIDATES (the tombstone-deletion row: trained on everything,
    * deleted ids excluded from results only). */
  private def ivfTrainedCtesFrom(basePred: String, nprobe: Int,
      candPred: String): String =
    "E0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings), " +
    "Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
    "QQ AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
    "C AS (SELECT label AS c_label, dim, " +
    "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
    s"FROM QQ WHERE $basePred GROUP BY label, dim), " +
    "DIST AS (SELECT x.vec_id, c.c_label, " +
    "sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
    "FROM QQ x JOIN C c ON x.dim = c.dim GROUP BY x.vec_id, c.c_label), " +
    "CELL AS (SELECT vec_id, c_label AS cell FROM " +
    "(SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DIST) WHERE rk = 1), " +
    "PROBE AS (SELECT vec_id AS qid, c_label AS cell FROM " +
    s"(SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DIST WHERE vec_id < 8) WHERE rk <= $nprobe), " +
    "EC AS (SELECT e.vec_id, e.v, e.label, CELL.cell FROM E0 e JOIN CELL ON CELL.vec_id = e.vec_id), " +
    "QV AS (SELECT vec_id AS qid, v AS qv FROM E0 WHERE vec_id < 8), " +
    s"J AS (SELECT p.qid, ec.vec_id, ec.cell, round(${cosSql("ec.v", "QV.qv")}, 6) AS cos " +
    s"FROM PROBE p JOIN EC ec ON ec.cell = p.cell JOIN QV ON QV.qid = p.qid WHERE ec.vec_id <> p.qid AND ($candPred)), " +
    "R AS (SELECT qid, vec_id, cell, cos, row_number() OVER " +
    "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J)"

  private val ivfTrainedCtes: String = ivfTrainedCtesFrom("TRUE")

  /** Full IVF-PQ oracle chain: the trained-IVF CTEs (with `basePred`
    * restricting which vectors train the coarse centroids AND the PQ
    * codebook — both derive from the same C) + per-subspace codes, the
    * per-query ADC lookup table, probed-cell-restricted ADC scoring,
    * the (d2, vec_id) shortlist cut, and the exact-cosine rescore. */
  private def ivfPqSqlFrom(basePred: String): String =
    s"WITH ${ivfPqChain(basePred, 2)} " + annTopkSelect

  /** The oracle chains resolve their SL cut through the engine's OWN
    * sentinel rule — one derivation site for both sides. */
  private def slShortlist(nprobe: Int, shortlist: Int): Int =
    graft.ops.Similarity.resolveShortlist(shortlist, nprobe)

  /** The CTE list only (everything after WITH, ending with RR — the
    * rescored ranked candidates), parameterized by nprobe and the ADC
    * shortlist (default = the entry points' derived ShortlistPerProbe ×
    * nprobe rule) so the sweep row can reuse the identical chain per
    * probe width. */
  private def ivfPqChain(basePred: String, nprobe: Int,
      shortlist: Int = -1, candPred: String = "TRUE"): String =
    s"${ivfTrainedCtesFrom(basePred, nprobe, candPred)}, " +
    "SDIST AS (SELECT x.vec_id, CAST(x.dim // 8 AS INT) AS sub, c.c_label, " +
    "sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
    "FROM QQ x JOIN C c ON x.dim = c.dim GROUP BY x.vec_id, x.dim // 8, c.c_label), " +
    "SCODE AS (SELECT vec_id, sub, c_label AS code FROM " +
    "(SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, c_label) AS rk FROM SDIST) WHERE rk = 1), " +
    "QLUT AS (SELECT v.vec_id AS qid, CAST(v.dim // 8 AS INT) AS sub, c.c_label AS code, " +
    "sum((v.q * 1000 - c.c6) * (v.q * 1000 - c.c6)) AS sd2 " +
    "FROM QQ v JOIN C c ON v.dim = c.dim WHERE v.vec_id < 8 " +
    "GROUP BY v.vec_id, v.dim // 8, c.c_label), " +
    // candPred restricts CANDIDATES before the lossy shortlist cut (the
    // engine's filter-before-cut ordering); `ec` aliases E0 here exactly
    // as it aliases EC in the trained chain's J, so one predicate string
    // drives both restriction sites
    "ADC AS (SELECT l.qid, cd.vec_id, sum(l.sd2) AS d2 FROM SCODE cd " +
    "JOIN QLUT l ON l.sub = cd.sub AND l.code = cd.code " +
    "JOIN CELL cl ON cl.vec_id = cd.vec_id " +
    (if (candPred == "TRUE") ""
     else s"JOIN E0 ec ON ec.vec_id = cd.vec_id ") +
    "JOIN PROBE p ON p.qid = l.qid AND p.cell = cl.cell " +
    s"WHERE cd.vec_id <> l.qid AND ($candPred) GROUP BY l.qid, cd.vec_id), " +
    "SL AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
    "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADC) " +
    s"WHERE rk <= ${slShortlist(nprobe, shortlist)}), " +
    "RR AS (SELECT j.qid, j.vec_id, j.cell, j.cos, row_number() OVER " +
    "(PARTITION BY j.qid ORDER BY j.cos DESC, j.vec_id) AS rank " +
    "FROM J j JOIN SL s ON s.qid = j.qid AND s.vec_id = j.vec_id)"

  /** The fused selectivity-sweep oracle: ONE unfiltered PQ chain shared
    * by every predicate's pre/post/truth block (CTE names suffixed per
    * tag), each block the exact CTE shapes of the single-predicate
    * fused-recall oracle. */
  private lazy val fusedSelectivitySweepSql: String = {
    val blocks = filtSweep.map { case (tag, _, q) =>
      s"ADCF_$tag AS (SELECT a.* FROM ADC a JOIN E0 ec ON ec.vec_id = a.vec_id WHERE $q), " +
      s"SLP_$tag AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
      s"(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADCF_$tag) " +
      s"WHERE rk <= ${slShortlist(FiltNprobe, -1)}), " +
      s"PREC_$tag AS (SELECT j.qid, j.vec_id, row_number() OVER " +
      "(PARTITION BY j.qid ORDER BY j.cos DESC, j.vec_id) AS rk " +
      s"FROM J j JOIN SLP_$tag sl ON sl.qid = j.qid AND sl.vec_id = j.vec_id), " +
      s"PRE_$tag AS (SELECT qid, vec_id FROM PREC_$tag WHERE rk <= $FiltK), " +
      s"POSTC_$tag AS (SELECT r.qid, r.vec_id, row_number() OVER " +
      "(PARTITION BY r.qid ORDER BY round(r.cos, 4) DESC, r.vec_id) AS rk2 " +
      "FROM RR r JOIN E0 ec ON ec.vec_id = r.vec_id " +
      s"WHERE r.rank <= ${FiltWiden * FiltK} AND $q), " +
      s"POST_$tag AS (SELECT qid, vec_id FROM POSTC_$tag WHERE rk2 <= $FiltK), " +
      s"TC_$tag AS (SELECT QV.qid, ec.vec_id, row_number() OVER " +
      s"(PARTITION BY QV.qid ORDER BY round(${cosSql("ec.v", "QV.qv")}, 6) DESC, ec.vec_id) AS rk " +
      s"FROM E0 ec CROSS JOIN QV WHERE $q AND ec.vec_id <> QV.qid), " +
      s"T_$tag AS (SELECT qid, vec_id FROM TC_$tag WHERE rk <= $FiltK)"
    }.mkString(", ")
    val selects = filtSweep.map { case (tag, _, _) =>
      s"SELECT '$tag' AS sel, 'pre' AS mode, round(CAST((SELECT count(*) " +
      s"FROM PRE_$tag p JOIN T_$tag t ON p.qid = t.qid AND p.vec_id = t.vec_id) " +
      s"AS DOUBLE) / ${FiltNQ * FiltK}.0, 4) AS recall " +
      "UNION ALL " +
      s"SELECT '$tag' AS sel, 'post' AS mode, round(CAST((SELECT count(*) " +
      s"FROM POST_$tag p JOIN T_$tag t ON p.qid = t.qid AND p.vec_id = t.vec_id) " +
      s"AS DOUBLE) / ${FiltNQ * FiltK}.0, 4) AS recall"
    }.mkString(" UNION ALL ")
    s"WITH ${ivfPqChain("TRUE", FiltNprobe)}, $blocks $selects " +
    "ORDER BY sel, mode DESC"
  }

  /** The shared top-k projection every rung's ranked-candidate chain
    * (… ending with RR) finishes with. */
  private val annTopkSelect: String =
    "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
    "FROM RR WHERE rank <= 3 ORDER BY qid, rank"

  /** Residual IVF-PQ oracle chain (IVFADC): the trained-IVF CTEs, then
    * exact integer residuals r = q·10³ − c6 per (vector, dim) against
    * the ASSIGNED cell, a residual codebook RC via the same c6 rounding
    * pipeline (6dp unit mean × 10⁶), residual codes, a per-(query,
    * probed-cell) LUT over QUERY residuals, cell-matched ADC sums, the
    * (d2, vec_id) shortlist, and the exact-cosine rescore. The residual
    * codebook RC is sample-seeded (PqK lowest training vec_ids, coded in
    * id order) + one Lloyd round — see Centroids.residualCodebook for
    * why label-mean seeding is degenerate on residuals. `basePred`
    * restricts which vectors train C and RC (both quantizer artifacts);
    * assignment/encoding/probing always cover every vector. */
  private def ivfPqResidualSqlFrom(basePred: String): String =
    s"WITH ${ivfPqResidualChain(basePred, 2)} " + annTopkSelect

  private def ivfPqResidualChain(basePred: String, nprobe: Int,
      shortlist: Int = -1, candPred: String = "TRUE"): String =
    s"${ivfTrainedCtesFrom(basePred, nprobe, candPred)}, " +
    "RES AS (SELECT x.vec_id, x.dim, x.q * 1000 - c.c6 AS r " +
    "FROM QQ x JOIN CELL cl ON cl.vec_id = x.vec_id " +
    "JOIN C c ON c.c_label = cl.cell AND c.dim = x.dim), " +
    s"TRES AS (SELECT * FROM RES WHERE $basePred), " +
    s"RSEED AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c_label " +
    s"FROM (SELECT DISTINCT vec_id FROM TRES ORDER BY vec_id LIMIT ${graft.ops.Centroids.PqK})), " +
    "RSV AS (SELECT s.c_label, r.dim, r.r AS c6 FROM RSEED s JOIN TRES r ON r.vec_id = s.vec_id), " +
    "RA0 AS (SELECT x.vec_id, CAST(x.dim // 8 AS INT) AS sub, v.c_label, " +
    "sum((x.r - v.c6) * (x.r - v.c6)) AS d2 " +
    "FROM TRES x JOIN RSV v ON v.dim = x.dim GROUP BY x.vec_id, x.dim // 8, v.c_label), " +
    "RA AS (SELECT vec_id, sub, c_label FROM (SELECT *, row_number() OVER " +
    "(PARTITION BY vec_id, sub ORDER BY d2, c_label) AS rk FROM RA0) WHERE rk = 1), " +
    "RC AS (SELECT a.c_label, r.dim, " +
    "CAST(round(round(CAST(sum(r.r) AS DOUBLE) / (1000000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
    "FROM TRES r JOIN RA a ON a.vec_id = r.vec_id AND a.sub = r.dim // 8 " +
    "GROUP BY a.c_label, r.dim), " +
    "SDIST AS (SELECT x.vec_id, CAST(x.dim // 8 AS INT) AS sub, c.c_label, " +
    "sum((x.r - c.c6) * (x.r - c.c6)) AS d2 " +
    "FROM RES x JOIN RC c ON x.dim = c.dim GROUP BY x.vec_id, x.dim // 8, c.c_label), " +
    "SCODE AS (SELECT vec_id, sub, c_label AS code FROM " +
    "(SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, c_label) AS rk FROM SDIST) WHERE rk = 1), " +
    "QRES AS (SELECT p.qid, p.cell, x.dim, x.q * 1000 - c.c6 AS r " +
    "FROM PROBE p JOIN QQ x ON x.vec_id = p.qid " +
    "JOIN C c ON c.c_label = p.cell AND c.dim = x.dim), " +
    "QLUT AS (SELECT q.qid, q.cell, CAST(q.dim // 8 AS INT) AS sub, c.c_label AS code, " +
    "sum((q.r - c.c6) * (q.r - c.c6)) AS sd2 " +
    "FROM QRES q JOIN RC c ON q.dim = c.dim " +
    "GROUP BY q.qid, q.cell, q.dim // 8, c.c_label), " +
    // candPred restricts candidates BEFORE the shortlist cut — see
    // ivfPqChain's ADC note (same `ec` aliasing convention)
    "ADC AS (SELECT l.qid, cd.vec_id, sum(l.sd2) AS d2 FROM SCODE cd " +
    "JOIN CELL cl ON cl.vec_id = cd.vec_id " +
    (if (candPred == "TRUE") ""
     else s"JOIN E0 ec ON ec.vec_id = cd.vec_id ") +
    "JOIN QLUT l ON l.sub = cd.sub AND l.code = cd.code AND l.cell = cl.cell " +
    s"WHERE cd.vec_id <> l.qid AND ($candPred) GROUP BY l.qid, cd.vec_id), " +
    "SL AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
    "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADC) " +
    s"WHERE rk <= ${slShortlist(nprobe, shortlist)}), " +
    "RR AS (SELECT j.qid, j.vec_id, j.cell, j.cos, row_number() OVER " +
    "(PARTITION BY j.qid ORDER BY j.cos DESC, j.vec_id) AS rank " +
    "FROM J j JOIN SL s ON s.qid = j.qid AND s.vec_id = j.vec_id)"

  /** SQ8 IVF oracle chain: per-dim [min, max] over the scale-10³
    * integer q, byte-range codes (exact-integer numerator × 255.0, one
    * IEEE divide, HALF_UP round — identical in both engines; degenerate
    * zero-range dims pin to code 0), ADC on the exact-integer
    * dequantization at scale q·255, the (d2, vec_id) shortlist, and the
    * exact-cosine rescore. */
  private def ivfSqSqlFrom(basePred: String): String =
    s"WITH ${ivfSqChain(basePred, 2)} " + annTopkSelect

  private def ivfSqChain(basePred: String, nprobe: Int,
      shortlist: Int = -1, candPred: String = "TRUE"): String =
    s"${ivfTrainedCtesFrom(basePred, nprobe, candPred)}, " +
    s"MM AS (SELECT dim, min(q) AS minq, max(q) AS maxq FROM QQ WHERE $basePred GROUP BY dim), " +
    "SC AS (SELECT x.vec_id, x.dim, CASE WHEN m.maxq = m.minq THEN 0 " +
    "ELSE greatest(0, least(255, CAST(round((x.q - m.minq) * 255.0 / (m.maxq - m.minq)) AS BIGINT))) END AS code " +
    "FROM QQ x JOIN MM m ON m.dim = x.dim), " +
    // candPred before the shortlist cut — see ivfPqChain's ADC note
    "ADC AS (SELECT p.qid, s.vec_id, " +
    "sum((q.q * 255 - (m.minq * 255 + s.code * (m.maxq - m.minq))) * " +
    "(q.q * 255 - (m.minq * 255 + s.code * (m.maxq - m.minq)))) AS d2 " +
    "FROM SC s JOIN CELL cl ON cl.vec_id = s.vec_id " +
    (if (candPred == "TRUE") ""
     else s"JOIN E0 ec ON ec.vec_id = s.vec_id ") +
    "JOIN PROBE p ON p.cell = cl.cell " +
    "JOIN QQ q ON q.vec_id = p.qid AND q.dim = s.dim " +
    "JOIN MM m ON m.dim = s.dim " +
    s"WHERE s.vec_id <> p.qid AND ($candPred) GROUP BY p.qid, s.vec_id), " +
    "SL AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
    "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADC) " +
    s"WHERE rk <= ${slShortlist(nprobe, shortlist)}), " +
    "RR AS (SELECT j.qid, j.vec_id, j.cell, j.cos, row_number() OVER " +
    "(PARTITION BY j.qid ORDER BY j.cos DESC, j.vec_id) AS rank " +
    "FROM J j JOIN SL s ON s.qid = j.qid AND s.vec_id = j.vec_id)"

  /** nprobe/recall sweep oracle: one UNION ALL branch per (rung,
    * nprobe), each an independent WITH-subquery running that rung's
    * full ranked-candidate chain at that probe width plus the
    * brute-force truth (the `sim_ann_recall` BF CTEs), reduced to a
    * single recall value. Mirrors [[graft.ops.Similarity.annNprobeSweep]]. */
  /** The autotune recall target — shared between the engine call and
    * the oracle SQL (the r15 ADVICE rule: interpolate, never restate). */
  private val NprobeTarget = 0.7

  /** The compaction-advice dead-fraction threshold — same sharing rule. */
  private val CompactThreshold = 0.2

  private def nprobeSweepSql: String = {
    val bfCtes =
      "QB AS (SELECT vec_id AS qid, v AS qv FROM E0 WHERE vec_id < 8), " +
      s"JB AS (SELECT QB.qid, E0.vec_id, round(${cosSql("E0.v", "QB.qv")}, 6) AS cos " +
      "FROM E0 CROSS JOIN QB WHERE E0.vec_id <> QB.qid), " +
      "RB AS (SELECT qid, vec_id, row_number() OVER " +
      "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM JB), " +
      "BF AS (SELECT qid, vec_id FROM RB WHERE rank <= 3)"
    def branch(rung: String, np: Int, chain: String): String =
      s"SELECT '$rung' AS rung, $np AS nprobe, recall FROM (WITH $chain, " +
      "TOPK AS (SELECT qid, vec_id FROM RR WHERE rank <= 3), " +
      s"$bfCtes " +
      "SELECT round(CAST(count(t.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS recall " +
      "FROM BF b LEFT JOIN TOPK t ON t.qid = b.qid AND t.vec_id = b.vec_id)"
    (for (np <- Seq(1, 2, 4, 8); (rung, chain) <- Seq(
        "pq" -> ivfPqChain("TRUE", np),
        "residual" -> ivfPqResidualChain("TRUE", np),
        "sq8" -> ivfSqChain("TRUE", np)))
      yield branch(rung, np, chain))
      .mkString("", " UNION ALL ", " ORDER BY rung, nprobe")
  }

  /** The sweep wrapped with the pick rule — same body, same target as
    * the engine ([[NprobeTarget]] interpolated, never restated). */
  private def nprobeAutotuneSql: String = {
    val body = nprobeSweepSql.stripSuffix(" ORDER BY rung, nprobe")
    s"WITH S AS ($body), " +
    s"P AS (SELECT rung, coalesce(min(CASE WHEN recall >= $NprobeTarget " +
    s"THEN nprobe END), max(nprobe)) AS pick FROM S GROUP BY rung) " +
    "SELECT s.rung, s.nprobe, s.recall, " +
    s"s.recall >= $NprobeTarget AS met " +
    "FROM S s JOIN P p ON s.rung = p.rung AND s.nprobe = p.pick " +
    "ORDER BY s.rung"
  }

  private val chainBlock = graft.graph.GraphOps.ChainBlock

  /** BPE merge-chain oracle: the same iteration unrolled as CTE blocks —
    * T0 = char-split word histogram (double-space separator invariant,
    * see ops/Bpe.scala), then per step k: pair counts from T(k-1), the
    * (cnt DESC, l, r) argmax as B(k), and T(k) = the boundary-anchored
    * replace. Result = B1..Bn. */
  private def bpeChainBlocks(steps: Int): Seq[String] =
    Seq(
      s"W AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM " +
        s"(SELECT unnest(string_split($docNorm, ' ')) AS word FROM documents) " +
        "WHERE word <> '' GROUP BY word)",
      "T0 AS (SELECT word, freq, ' ' || array_to_string(" +
        "list_transform(range(length(word)), i -> substr(word, CAST(i + 1 AS INT), 1)), '  ') || ' ' AS s FROM W)") ++
      (1 to steps).flatMap { k =>
        Seq(
          s"P$k AS (SELECT tk[i + 1] AS l, tk[i + 2] AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM " +
            s"(SELECT freq, string_split(trim(s), '  ') AS tk, " +
            s"unnest(range(len(string_split(trim(s), '  ')) - 1)) AS i FROM T${k - 1}) GROUP BY l, r)",
          s"B$k AS (SELECT $k AS step, l, r, cnt FROM P$k ORDER BY cnt DESC, l, r LIMIT 1)",
          s"T$k AS (SELECT word, freq, replace(s, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS s " +
            s"FROM T${k - 1} CROSS JOIN B$k b)")
      }

  private val bpeOracleSql: String = {
    val steps = graft.ops.Bpe.Steps
    "WITH " + bpeChainBlocks(steps).mkString(", ") +
      " SELECT CAST(step AS INT) AS step, l, r, cnt FROM (" +
      (1 to steps).map(k => s"SELECT * FROM B$k").mkString(" UNION ALL ") +
      ") ORDER BY step"
  }

  /** Encode oracle: the same chain, then per-word token counts from the
    * final state joined back to the document word explosion. */
  private val bpeEncodeOracleSql: String = {
    val steps = graft.ops.Bpe.Steps
    "WITH " + bpeChainBlocks(steps).mkString(", ") + ", " +
      s"V AS (SELECT word, CAST(len(string_split(trim(s), '  ')) AS INT) AS word_tokens, " +
      s"CAST(length(word) AS INT) AS word_chars FROM T$steps), " +
      s"DW AS (SELECT doc_id, unnest(string_split($docNorm, ' ')) AS word FROM documents) " +
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(word_chars) AS BIGINT) AS n_chars, " +
      "CAST(sum(word_tokens) AS BIGINT) AS n_tokens, " +
      "round(CAST(sum(word_chars) AS DOUBLE) / sum(word_tokens), 4) AS compression " +
      "FROM DW JOIN V USING (word) WHERE word <> '' " +
      "GROUP BY doc_id ORDER BY doc_id"
  }

  /** Corpus-capstone shared SQL — the keep chain (quality gate → exact
    * keepers → near-dup drops → KEEP; requires `shingleCtes`' SH/PAIRS in
    * scope) and the split+pack tail over a given id CTE. Shared verbatim
    * by the `corpus_build` and `corpus_curate` oracles so the recipe
    * cannot drift between them. */
  private val keepChainCtes: String =
    s"Q0 AS (SELECT doc_id, $docNorm AS nt, string_split($docNorm, ' ') AS w, text FROM documents), " +
    "QUAL AS (SELECT doc_id FROM (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, " +
    "round(CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE) / " +
    "CAST(len(w) AS DOUBLE), 4) AS stopword_ratio FROM Q0) " +
    "WHERE NOT (n_tokens < 5) AND NOT (stopword_ratio < 0.01)), " +
    s"KEEPERS AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($docNorm)), " +
    "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
    "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
    "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
    "GROUP BY p.src, p.dst), " +
    "DROPS AS (SELECT c.dst AS doc_id FROM COMMONS c " +
    "JOIN SIZES sa ON sa.doc_id = c.src JOIN SIZES sb ON sb.doc_id = c.dst " +
    "WHERE round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) >= 0.5), " +
    "KEEP AS (SELECT q.doc_id FROM QUAL q WHERE EXISTS (SELECT 1 FROM KEEPERS kk WHERE kk.doc_id = q.doc_id) " +
    "AND NOT EXISTS (SELECT 1 FROM DROPS dd WHERE dd.doc_id = q.doc_id))"

  private def packTailSql(fromCte: String): String = {
    val b = graft.ops.Packing.SeqTokens
    val sh = graft.ops.Packing.Shards
    "TRAIN AS (SELECT doc_id FROM (SELECT doc_id, " +
    "(instr('0123456789abcdef', substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 1, 1)) - 1) * 16 + " +
    "instr('0123456789abcdef', substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 2, 1)) - 1 AS bucket " +
    s"FROM $fromCte) WHERE bucket < ${graft.ops.Sampling.TrainUpper}), " +
    "H2 AS (SELECT d.doc_id, d.lang, md5(concat('pack|', CAST(d.doc_id AS VARCHAR))) AS h, " +
    s"CAST(len(string_split($docNorm, ' ')) AS BIGINT) AS n_tokens " +
    "FROM documents d JOIN TRAIN t ON d.doc_id = t.doc_id), " +
    "T2 AS (SELECT doc_id, lang, n_tokens, ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
    s"instr('0123456789abcdef', substr(h, 2, 1)) - 1) % $sh AS shard FROM H2), " +
    "C2 AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id " +
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM T2) " +
    "SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens, " +
    s"CAST(floor(cum_before / $b.0) AS BIGINT) AS seq_id, " +
    s"CAST(cum_before % $b AS BIGINT) AS seq_offset FROM C2 ORDER BY doc_id"
  }

  /** BM25 oracle chain — shared verbatim by `bm25_search` and
    * `bm25_indexed` (the index-backed path must be row-identical). */
  private val bm25OracleSql: String = bm25OracleSqlFrom("TRUE")

  /** Phrase oracle — generated from the SAME fixture constants the engine
    * uses ([[graft.ops.Phrase.DefaultPhrase]]/TopK), per the r15 advice
    * (hardcoded oracle literals silently desynchronize from the engine).
    * DuckDB lists are 1-based (`w[i]`, `range` upper-exclusive, so a doc
    * shorter than the phrase yields `range(1, ≤0)` = empty); `hits[1]-1`
    * converts back to the 0-based token offsets the engine reports.
    * Shared verbatim by the scan-time, build+probe, and warm query rows —
    * all three must produce the identical frame. */
  private def phraseOracleSql: String = phraseOracleSqlFrom("TRUE")

  /** `docPred` restricts the corpus — the tombstone-deletion and
    * lifecycle rows' oracle is the SAME chain over the surviving
    * documents (no corpus stats in phrase scoring, so the rebuild-
    * without-victims identity is trivially exact). */
  private def phraseOracleSqlFrom(docPred: String): String = {
    import graft.ops.Phrase.{DefaultPhrase => P, TopK}
    val n = P.length
    val pred = P.zipWithIndex.map { case (t, off) =>
      if (off == 0) s"w[i] = '$t'" else s"w[i+$off] = '$t'" }.mkString(" AND ")
    s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents WHERE $docPred), " +
    s"P AS (SELECT doc_id, list_filter(range(1, len(w)-$n+2), i -> $pred) AS hits FROM W) " +
    s"SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_occ, " +
    s"CAST(hits[1]-1 AS INT) AS first_pos " +
    s"FROM P WHERE len(hits) > 0 ORDER BY n_occ DESC, doc_id LIMIT $TopK"
  }

  /** Batch-phrase oracle: one per-phrase block over the shared tokenized
    * CTE, UNION ALL, (qid, n_occ DESC, doc_id) order — generated from the
    * same [[graft.ops.Phrase.BatchPhrases]] fixture the engine uses. */
  private def phraseBatchOracleSql: String = {
    import graft.ops.Phrase.{BatchPhrases, TopK}
    def block(qid: Int, p: Seq[String]): String = {
      val n = p.length
      val pred = p.zipWithIndex.map { case (t, off) =>
        if (off == 0) s"w[i] = '$t'" else s"w[i+$off] = '$t'" }.mkString(" AND ")
      s"(SELECT $qid AS qid, doc_id, n_occ, first_pos FROM " +
      s"(SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_occ, " +
      s"CAST(hits[1]-1 AS INT) AS first_pos " +
      s"FROM (SELECT doc_id, list_filter(range(1, len(w)-$n+2), i -> $pred) AS hits FROM W) " +
      s"WHERE len(hits) > 0 ORDER BY n_occ DESC, doc_id LIMIT $TopK))"
    }
    s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents) " +
    "SELECT qid, doc_id, n_occ, first_pos FROM (" +
    BatchPhrases.map { case (q, p) => block(q, p) }.mkString(" UNION ALL ") +
    ") ORDER BY qid, n_occ DESC, doc_id"
  }

  /** Proximity oracle — 1-based positions, but pair DISTANCES are
    * invariant to the base shift, so `min_dist` matches the engine's
    * 0-based arithmetic exactly. */
  private def proximityOracleSql: String = {
    import graft.ops.Phrase.{ProxA, ProxB, ProxWindow, TopK}
    s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    s"P AS (SELECT doc_id, list_filter(range(1, len(w)+1), i -> w[i] = '$ProxA') AS pa, " +
    s"list_filter(range(1, len(w)+1), i -> w[i] = '$ProxB') AS pb FROM W), " +
    s"D AS (SELECT doc_id, CAST(len(pa) AS BIGINT) AS n_a, CAST(len(pb) AS BIGINT) AS n_b, " +
    s"CAST(list_min(flatten(list_transform(pa, x -> list_transform(pb, y -> abs(x-y))))) AS INT) AS min_dist " +
    s"FROM P WHERE len(pa) > 0 AND len(pb) > 0) " +
    s"SELECT * FROM D WHERE min_dist <= $ProxWindow ORDER BY min_dist, doc_id LIMIT $TopK"
  }

  /** `docPred` restricts the corpus the whole chain sees — the
    * tombstone-deletion row's oracle is the SAME chain over the
    * surviving documents (df, n_docs, avgdl all recomputed). */
  private def bm25OracleSqlFrom(docPred: String): String = {
    import graft.ops.Search.{K1, B => B25, TopK, QueryTerms}
    val tfs = QueryTerms.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf_$t").mkString(", ")
    val dfs = QueryTerms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(", ")
    val parts = QueryTerms.map(t =>
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1) * (tf_$t * ${K1 + 1}) / " +
      s"(tf_$t + $K1 * (${1 - B25} + $B25 * dl / avgdl))").mkString(" + ")
    val outTfs = QueryTerms.map(t => s"CAST(tf_$t AS BIGINT) AS tf_$t").mkString(", ")
    s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents WHERE $docPred), " +
    s"D AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfs FROM W), " +
    s"S AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, $dfs FROM D), " +
    s"X AS (SELECT doc_id, dl, ${QueryTerms.map(t => s"tf_$t").mkString(", ")}, " +
    s"round($parts, 4) AS score FROM D CROSS JOIN S) " +
    s"SELECT doc_id, CAST(dl AS BIGINT) AS dl, $outTfs, score FROM X " +
    s"WHERE score > 0 ORDER BY score DESC, doc_id LIMIT $TopK"
  }

  /** Batch fuzzy oracle: per-query scan scoring + rank window over the
    * fixture query frame — shared verbatim by the build+probe row and
    * its query-only warm twin. */
  private lazy val fuzzyBatchOracleSql: String = withStudents(
    ", Q(qid, q) AS (VALUES " +
    batchFuzzyQueries.map { case (qid, q) =>
      // SQL-escape: a fixture query containing a quote must not break
      // (or silently alter) the oracle text
      s"(CAST($qid AS BIGINT), '${q.replace("'", "''")}')" }
      .mkString(", ") + "), " +
    "S AS (SELECT Q.qid, s.id, s.name, " +
    "round((1.0 - CAST(levenshtein(s.name, Q.q) AS DOUBLE) / " +
    "CAST(greatest(length(s.name), length(Q.q)) AS DOUBLE)) * 100.0, 4) AS score " +
    "FROM students s CROSS JOIN Q), " +
    "R AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank " +
    "FROM S WHERE score >= 70.0) " +
    "SELECT qid, id, name, CAST(rank AS INT) AS rank, score " +
    "FROM R WHERE rank <= 5 ORDER BY qid, rank")

  /** Batch BM25 oracle: the same Okapi chain per (query, doc) over the
    * fixture query frame, with per-query terms DEDUPED and the
    * per-(qid, doc) score folded in SORTED TERM ORDER (`list_reduce`
    * over `list(part ORDER BY term)`) — the engine folds its parts in
    * the same order (sort_array → aggregate), so the doubles match
    * bit-for-bit; zero-tf terms are absent on both sides (adding 0.0 to
    * the strictly-positive parts would be IEEE-identical anyway). */
  private val bm25BatchOracleSql: String = {
    import graft.ops.Search.{K1, B => B25}
    val values = batchBm25Queries.map { case (qid, q) =>
      s"(CAST($qid AS BIGINT), '${q.replace("'", "''")}')" }.mkString(", ")
    s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    "D AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, w FROM W), " +
    "S AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM D), " +
    s"Q(qid, q) AS (VALUES $values), " +
    "QT AS (SELECT DISTINCT qid, term FROM (SELECT qid, " +
    "unnest(string_split(regexp_replace(lower(trim(q)), '[ \\t\\n\\f\\r]+', ' ', 'g'), ' ')) AS term " +
    "FROM Q) WHERE term <> ''), " +
    "H AS (SELECT t.qid, d.doc_id, d.dl, t.term, " +
    "CAST(len(list_filter(d.w, x -> x = t.term)) AS DOUBLE) AS tf " +
    "FROM D d CROSS JOIN QT t), " +
    "H1 AS (SELECT * FROM H WHERE tf > 0), " +
    "DF AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM H1 GROUP BY term), " +
    "P AS (SELECT h.qid, h.doc_id, h.dl, h.term, " +
    s"ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1) * (h.tf * ${K1 + 1}) / " +
    s"(h.tf + $K1 * (${1 - B25} + $B25 * h.dl / s.avgdl)) AS part " +
    "FROM H1 h JOIN DF f ON f.term = h.term CROSS JOIN S s), " +
    "G AS (SELECT qid, doc_id, dl, " +
    "round(list_reduce(list(part ORDER BY term), (a, b) -> a + b), 4) AS score " +
    "FROM P GROUP BY qid, doc_id, dl), " +
    "R AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank " +
    "FROM G WHERE score > 0) " +
    "SELECT qid, doc_id, CAST(dl AS BIGINT) AS dl, score, CAST(rank AS INT) AS rank " +
    "FROM R WHERE rank <= 10 ORDER BY qid, rank"
  }

  /** Batch hybrid oracle: the batch BM25 rank chain (per-query tokenized
    * terms, ordered part fold) fused per qid with the trained-IVF dense
    * chain's top-k bridged to doc space ((vec_id·37+11) mod n_docs, best
    * round-4 cosine per doc) — mirrors Search.hybridRrfBatch over the
    * standing indexes. Lexical CTEs renamed RL/LX to dodge the IVF
    * chain's R. */
  private lazy val hybridBatchOracleSql: String = {
    import graft.ops.Search.{K1, B => B25, TopK, RrfK, BridgeMul, BridgeAdd}
    val values = batchBm25Queries.map { case (qid, q) =>
      s"(CAST($qid AS BIGINT), '${q.replace("'", "''")}')" }.mkString(", ")
    s"WITH ${ivfTrainedCtesFrom("TRUE", 2, "TRUE")}, " +
    s"W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    "D AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, w FROM W), " +
    "S AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM D), " +
    s"Q(qid, q) AS (VALUES $values), " +
    "QT AS (SELECT DISTINCT qid, term FROM (SELECT qid, " +
    "unnest(string_split(regexp_replace(lower(trim(q)), '[ \\t\\n\\f\\r]+', ' ', 'g'), ' ')) AS term " +
    "FROM Q) WHERE term <> ''), " +
    "H AS (SELECT t.qid, d.doc_id, d.dl, t.term, " +
    "CAST(len(list_filter(d.w, x -> x = t.term)) AS DOUBLE) AS tf " +
    "FROM D d CROSS JOIN QT t), " +
    "H1 AS (SELECT * FROM H WHERE tf > 0), " +
    "DF AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM H1 GROUP BY term), " +
    "P AS (SELECT h.qid, h.doc_id, h.dl, h.term, " +
    s"ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1) * (h.tf * ${K1 + 1}) / " +
    s"(h.tf + $K1 * (${1 - B25} + $B25 * h.dl / s.avgdl)) AS part " +
    "FROM H1 h JOIN DF f ON f.term = h.term CROSS JOIN S s), " +
    "G AS (SELECT qid, doc_id, " +
    "round(list_reduce(list(part ORDER BY term), (a, b) -> a + b), 4) AS score " +
    "FROM P GROUP BY qid, doc_id), " +
    "RL AS (SELECT qid, doc_id, row_number() OVER " +
    "(PARTITION BY qid ORDER BY score DESC, doc_id) AS r_bm25 " +
    "FROM G WHERE score > 0), " +
    s"LX AS (SELECT qid, doc_id, r_bm25 FROM RL WHERE r_bm25 <= $TopK), " +
    "ND AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
    // the dense chain's fixture anchors are vec_id < 8 but only the
    // batch's own qids probe — derive the bound from the fixture so a
    // batch-set change desyncs loudly instead of silently
    s"BR0 AS (SELECT qid, (vec_id * $BridgeMul + $BridgeAdd) % (SELECT n FROM ND) AS doc_id, " +
    s"round(cos, 4) AS cos FROM R WHERE rank <= $TopK AND qid < ${batchBm25Queries.size}), " +
    "BR AS (SELECT qid, doc_id, max(cos) AS cos FROM BR0 GROUP BY qid, doc_id), " +
    "DR AS (SELECT qid, doc_id, row_number() OVER " +
    "(PARTITION BY qid ORDER BY cos DESC, doc_id) AS r_dense FROM BR), " +
    "F AS (SELECT coalesce(l.qid, r.qid) AS qid, " +
    "coalesce(l.doc_id, r.doc_id) AS doc_id, l.r_bm25, r.r_dense " +
    "FROM LX l FULL OUTER JOIN DR r ON l.qid = r.qid AND l.doc_id = r.doc_id) " +
    "SELECT qid, doc_id, CAST(r_bm25 AS BIGINT) AS r_bm25, " +
    "CAST(r_dense AS BIGINT) AS r_dense, " +
    s"round(coalesce(1.0 / ($RrfK + r_bm25), 0) + coalesce(1.0 / ($RrfK + r_dense), 0), 6) AS rrf " +
    "FROM F ORDER BY qid, rrf DESC, doc_id"
  }

  /** Lexical+dense hybrid oracle: the BM25 top-k rank chain fused with the
    * dense cosine ranks over bridge-pooled (vec_id -> doc_id, quantized
    * integer-sum) doc embeddings — mirrors Search.hybridRrfDense (`ann` =
    * false) / hybridRrfDenseAnn (`ann` = true: the dense candidates come
    * from the query's sign-sketch bucket + Hamming-1 probes instead of the
    * full vector table; bucket signs are EXACT — integer-valued products
    * sum order-free — so the two engines bucket identically). */
  private def hybridDenseOracle(ann: Boolean): String = {
    import graft.ops.Search.{K1, B => B25, TopK, QueryTerms, RrfK,
      BridgeMul, BridgeAdd, DenseQueryDoc}
    val tfs = QueryTerms.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf_$t").mkString(", ")
    val dfs = QueryTerms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(", ")
    val bmParts = QueryTerms.map(t =>
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1) * (tf_$t * ${K1 + 1}) / " +
      s"(tf_$t + $K1 * (${1 - B25} + $B25 * dl / avgdl))").mkString(" + ")
    val scale = graft.ops.Centroids.Scale
    s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    s"D AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfs FROM W), " +
    s"S AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, $dfs FROM D), " +
    s"X AS (SELECT doc_id, round($bmParts, 4) AS s_bm25 FROM D CROSS JOIN S), " +
    s"BM AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY s_bm25 DESC, doc_id) AS INT) AS r_bm25 " +
    s"FROM (SELECT doc_id, s_bm25 FROM X WHERE s_bm25 > 0 ORDER BY s_bm25 DESC, doc_id LIMIT $TopK)), " +
    // dense half: bridge, quantize, element-wise integer-sum pool, cosine
    "ND AS (SELECT count(*) AS n_docs FROM documents), " +
    s"EM AS (SELECT (vec_id * $BridgeMul + $BridgeAdd) % n.n_docs AS doc_id, embedding " +
    "FROM embeddings CROSS JOIN ND n), " +
    "ED AS (SELECT doc_id, unnest(range(len(embedding))) AS dim, embedding FROM EM), " +
    s"EQ AS (SELECT doc_id, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * $scale) AS BIGINT) AS q FROM ED), " +
    "PS AS (SELECT doc_id, dim, sum(q) AS s FROM EQ GROUP BY doc_id, dim), " +
    "DV AS (SELECT doc_id, list(CAST(s AS DOUBLE) ORDER BY dim) AS v FROM PS GROUP BY doc_id), " +
    (if (!ann)
      s"QV AS (SELECT v AS qv FROM DV WHERE doc_id = $DenseQueryDoc), " +
      s"DC AS (SELECT d.doc_id, round(${cosSql("d.v", "q.qv")}, 6) AS cos " +
      s"FROM DV d CROSS JOIN QV q WHERE d.doc_id <> $DenseQueryDoc), "
    else
      // sign-sketch bucket per pooled vector (mirrors Similarity.bucketCol
      // over v), query probes own bucket + all Hamming-1 flips
      "DVB AS (SELECT doc_id, v, array_to_string(list_transform(range(6), p -> " +
      "CASE WHEN list_sum(list_transform(range(64), dd -> v[dd+1] * " +
      "(CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(p AS VARCHAR) || '_' || CAST(dd AS VARCHAR)), 1, 1)) - 1) % 2 = 1 " +
      "THEN 1.0 ELSE -1.0 END))) > 0 THEN '1' ELSE '0' END), '') AS bucket FROM DV), " +
      s"QB AS (SELECT v AS qv, unnest([bucket] || list_transform(range(6), p -> " +
      "substr(bucket, 1, CAST(p AS INT)) || (CASE WHEN substr(bucket, CAST(p AS INT) + 1, 1) = '1' THEN '0' ELSE '1' END) || " +
      s"substr(bucket, CAST(p AS INT) + 2, 6 - CAST(p AS INT) - 1))) AS bucket FROM DVB WHERE doc_id = $DenseQueryDoc), " +
      s"DC AS (SELECT d.doc_id, round(${cosSql("d.v", "q.qv")}, 6) AS cos " +
      s"FROM DVB d JOIN QB q ON d.bucket = q.bucket AND d.doc_id <> $DenseQueryDoc), ") +
    s"DR AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS r_dense " +
    s"FROM (SELECT doc_id, cos FROM DC ORDER BY cos DESC, doc_id LIMIT $TopK)) " +
    "SELECT coalesce(b.doc_id, d.doc_id) AS doc_id, b.r_bm25, d.r_dense, " +
    s"round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + b.r_bm25), 0) + " +
    s"coalesce(CAST(1 AS DOUBLE) / ($RrfK + d.r_dense), 0), 6) AS rrf " +
    "FROM BM b FULL OUTER JOIN DR d ON b.doc_id = d.doc_id " +
    "ORDER BY rrf DESC, doc_id"
  }

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      (s"SELECT md5($docNorm) AS h, min(doc_id) AS keeper, count(*) AS n " +
       "FROM documents GROUP BY 1 ORDER BY h"),
    "dedup_minhash_sig" ->
      (s"WITH $shingleCtes SELECT * FROM SIG ORDER BY doc_id"),
    // prefix filter: rare-first string order keys, prefix slice, equi
    // candidates, exact overlap verify — same chain as the Spark side
    "dedup_prefix_pairs" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "SH AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3 THEN " +
       "list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) " +
       "ELSE [array_to_string(w, ' ')] END)) AS sh FROM W), " +
       "DFT AS (SELECT sh, count(*) AS df FROM SH GROUP BY sh), " +
       "ORD AS (SELECT doc_id, list_sort(list(lpad(CAST(df AS VARCHAR), 10, '0') || '|' || sh)) AS sorted, " +
       "count(*) AS sz FROM SH JOIN DFT USING (sh) GROUP BY doc_id), " +
       "PRE AS (SELECT doc_id, sz, substr(unnest(sorted[1 : CAST(sz - ceil(sz * 0.5) + 1 AS INT)]), 12) AS sh FROM ORD), " +
       "CAND AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst, a.sz AS sza, b.sz AS szb " +
       "FROM PRE a JOIN PRE b ON a.sh = b.sh AND a.doc_id < b.doc_id " +
       "AND least(a.sz, b.sz) >= greatest(a.sz, b.sz) * 0.5), " +
       "I AS (SELECT c.src, c.dst, c.sza, c.szb, count(*) AS inter FROM CAND c " +
       "JOIN SH s1 ON s1.doc_id = c.src JOIN SH s2 ON s2.doc_id = c.dst AND s2.sh = s1.sh " +
       "GROUP BY c.src, c.dst, c.sza, c.szb) " +
       "SELECT src, dst, round(CAST(inter AS DOUBLE) / (sza + szb - inter), 4) AS jaccard " +
       "FROM I WHERE round(CAST(inter AS DOUBLE) / (sza + szb - inter), 4) >= 0.5 ORDER BY src, dst"),
    // canonical selection: same weights derivation as sample_mix, keeper
    // = row_number 1 over (priority desc, doc_id) within the fp cluster
    "dedup_canonical" ->
      (s"WITH D AS (SELECT doc_id, source, text FROM documents " +
       "UNION ALL SELECT doc_id + 1000000, 'src3', text FROM documents WHERE doc_id % 7 = 0), " +
       s"F AS (SELECT doc_id, source, md5($docNorm) AS fp FROM D), " +
       "W AS (SELECT DISTINCT source, 64 * (1 + CAST(substr(source, 4) AS INT) % 4) AS keep_below FROM D), " +
       "J AS (SELECT f.doc_id, f.source, f.fp, w.keep_below FROM F f JOIN W w ON f.source = w.source), " +
       "R AS (SELECT *, count(*) OVER (PARTITION BY fp) AS n_dups, " +
       "row_number() OVER (PARTITION BY fp ORDER BY keep_below DESC, doc_id) AS rk FROM J) " +
       "SELECT fp, doc_id AS keeper, source AS keeper_source, " +
       "CAST(keep_below AS INT) AS priority, CAST(n_dups AS BIGINT) AS n_dups " +
       "FROM R WHERE n_dups >= 2 AND rk = 1 ORDER BY keeper"),
    "dedup_lsh_pairs" ->
      (s"WITH $shingleCtes SELECT * FROM PAIRS ORDER BY src, dst"),
    // containment: exact |A∩B|/|A| over the candidate pairs + the
    // signature-only estimate (matching-hash fraction → est Jaccard →
    // est containment via the exact sizes)
    "dedup_containment" -> {
      val m = (0 until graft.ops.Dedup.NumHashes)
        .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"WITH $shingleCtes, " +
      "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
      "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
      "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
      "GROUP BY p.src, p.dst), " +
      s"JEST AS (SELECT p.src, p.dst, CAST($m AS DOUBLE) / ${graft.ops.Dedup.NumHashes}.0 AS j_est " +
      "FROM PAIRS p JOIN SIG sa ON sa.doc_id = p.src JOIN SIG sb ON sb.doc_id = p.dst) " +
      "SELECT c.src, c.dst, " +
      "round(CAST(c.ncommon AS DOUBLE) / CAST(za.nsh AS DOUBLE), 4) AS containment_exact, " +
      "round(j.j_est * CAST(za.nsh + zb.nsh AS DOUBLE) / ((1.0 + j.j_est) * CAST(za.nsh AS DOUBLE)), 4) AS containment_est " +
      "FROM COMMONS c JOIN SIZES za ON za.doc_id = c.src " +
      "JOIN SIZES zb ON zb.doc_id = c.dst " +
      "JOIN JEST j ON j.src = c.src AND j.dst = c.dst " +
      "ORDER BY c.src, c.dst"
    },
    "dedup_band_stats" ->
      (s"WITH $shingleCtes, " +
       "BK AS (SELECT b, k, CAST(count(*) AS BIGINT) AS n FROM BANDS GROUP BY b, k) " +
       "SELECT b, CAST(count(*) AS BIGINT) AS n_buckets, max(n) AS max_bucket, " +
       "CAST(sum(n * (n - 1) // 2) AS BIGINT) AS collision_pairs " +
       "FROM BK GROUP BY b ORDER BY b"),
    "dedup_ngram_jaccard" ->
      (s"WITH $shingleCtes, " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst) " +
       "SELECT c.src, c.dst, round(CAST(ncommon AS DOUBLE) / " +
       "CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) AS jaccard " +
       "FROM COMMONS c JOIN SIZES sa ON sa.doc_id = c.src " +
       "JOIN SIZES sb ON sb.doc_id = c.dst ORDER BY src, dst"),
    // the same verified-pair chain crossed with the 5-row threshold dim
    "dedup_threshold_sweep" ->
      (s"WITH $shingleCtes, " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst), " +
       "J AS (SELECT c.src, c.dst, round(CAST(ncommon AS DOUBLE) / " +
       "CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) AS jaccard " +
       "FROM COMMONS c JOIN SIZES sa ON sa.doc_id = c.src " +
       "JOIN SIZES sb ON sb.doc_id = c.dst), " +
       s"T AS (SELECT CAST(unnest([${graft.ops.Dedup.SweepThresholds.mkString(", ")}]) AS DOUBLE) AS t), " +
       "S AS (SELECT t, src, dst FROM J CROSS JOIN T WHERE jaccard >= t), " +
       "P AS (SELECT t, count(*) AS n_pairs FROM S GROUP BY t), " +
       "D AS (SELECT t, count(DISTINCT doc_id) AS n_docs FROM " +
       "(SELECT t, unnest([src, dst]) AS doc_id FROM S) GROUP BY t) " +
       "SELECT p.t, p.n_pairs, d.n_docs FROM P p JOIN D d USING (t) ORDER BY t"),
    // identical result by construction: the sliver semi-join only removes
    // docs that appear in no candidate pair
    "dedup_jaccard_sliver" ->
      (s"WITH $shingleCtes, " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst) " +
       "SELECT c.src, c.dst, round(CAST(ncommon AS DOUBLE) / " +
       "CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) AS jaccard " +
       "FROM COMMONS c JOIN SIZES sa ON sa.doc_id = c.src " +
       "JOIN SIZES sb ON sb.doc_id = c.dst ORDER BY src, dst"),
    "dedup_keepset" ->
      (s"WITH $shingleCtes, " +
       s"Q0 AS (SELECT doc_id, $docNorm AS nt, string_split($docNorm, ' ') AS w, text FROM documents), " +
       "QUAL AS (SELECT doc_id FROM (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, " +
       "round(CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE) / " +
       "CAST(len(w) AS DOUBLE), 4) AS stopword_ratio FROM Q0) " +
       "WHERE NOT (n_tokens < 5) AND NOT (stopword_ratio < 0.01)), " +
       s"KEEPERS AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($docNorm)), " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst), " +
       "DROPS AS (SELECT c.dst AS doc_id FROM COMMONS c " +
       "JOIN SIZES sa ON sa.doc_id = c.src JOIN SIZES sb ON sb.doc_id = c.dst " +
       "WHERE round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) >= 0.5) " +
       "SELECT q.doc_id FROM QUAL q WHERE EXISTS (SELECT 1 FROM KEEPERS k WHERE k.doc_id = q.doc_id) " +
       "AND NOT EXISTS (SELECT 1 FROM DROPS d WHERE d.doc_id = q.doc_id) ORDER BY doc_id"),
    // capstone: the keepset chain verbatim, then split-filter, then the
    // pack_sequences chain over the survivors
    "corpus_build" -> {
      s"WITH $shingleCtes, $keepChainCtes, " + packTailSql("KEEP")
    },
    // capstone v2: corpus_build's chain + the substring-span gate over
    // the kept subset + the per-source token budget over the gated set
    "corpus_curate" -> {
      val k = graft.ops.Dedup.SubstrK
      s"WITH $shingleCtes, $keepChainCtes, " +
      // the kept subset, then the span gate measured on IT
      "KD AS (SELECT d.* FROM documents d WHERE EXISTS (SELECT 1 FROM KEEP k2 WHERE k2.doc_id = d.doc_id)), " +
      s"W2 AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM KD), " +
      s"G2 AS (SELECT doc_id, array_to_string(w[i + 1:i + $k], ' ') AS gram " +
      s"FROM (SELECT doc_id, w, unnest(range(len(w) - ${k - 1})) AS i FROM W2 WHERE len(w) >= $k)), " +
      "D2 AS (SELECT gram FROM G2 GROUP BY gram HAVING count(*) >= 2), " +
      "TSP AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM G2 GROUP BY doc_id), " +
      "USP AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM G2 SEMI JOIN D2 USING (gram) GROUP BY doc_id), " +
      "SPAN AS (SELECT t.doc_id FROM TSP t LEFT JOIN USP u ON t.doc_id = u.doc_id " +
      "WHERE round(CAST(coalesce(u.n_dup, 0) AS DOUBLE) / t.n_windows, 4) < 0.5), " +
      s"SHORT AS (SELECT doc_id FROM W2 WHERE len(w) < $k), " +
      "GATED AS (SELECT * FROM KD WHERE doc_id IN (SELECT doc_id FROM SPAN UNION ALL SELECT doc_id FROM SHORT)), " +
      // token budget over the gated set (its own token mass and sources)
      s"TB AS (SELECT doc_id, source, CAST(len(string_split($docNorm, ' ')) AS BIGINT) AS n_tokens FROM GATED), " +
      "SB AS (SELECT source, sum(n_tokens) AS src_tokens FROM TB GROUP BY source), " +
      "WTS AS (SELECT DISTINCT source, 64 * (1 + CAST(substr(source, 4) AS INT) % 4) AS keep_below FROM GATED), " +
      "QB AS (SELECT s2.source, CAST((w3.keep_below * s2.src_tokens) // 256 AS BIGINT) AS quota " +
      "FROM SB s2 JOIN WTS w3 ON s2.source = w3.source), " +
      "CB AS (SELECT t.doc_id, t.source, t.n_tokens, " +
      "sum(t.n_tokens) OVER (PARTITION BY t.source ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens, " +
      "q.quota FROM TB t JOIN QB q ON t.source = q.source), " +
      "ADM AS (SELECT doc_id FROM CB WHERE cum_tokens - n_tokens < quota), " +
      packTailSql("ADM")
    },
    // Transitive closure of the verified near-dup pairs (UNION-dedup
    // recursion; components are near-dup chains — tiny — so the closure
    // stays small even though reachability is quadratic per component).
    "dedup_components" ->
      (s"WITH RECURSIVE $shingleCtes, " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst), " +
       "NEAR AS (SELECT c.src, c.dst FROM COMMONS c " +
       "JOIN SIZES sa ON sa.doc_id = c.src JOIN SIZES sb ON sb.doc_id = c.dst " +
       "WHERE round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) >= 0.5), " +
       "UND AS (SELECT src AS a, dst AS b FROM NEAR UNION ALL SELECT dst, src FROM NEAR), " +
       "REACH(a, b) AS (SELECT doc_id, doc_id FROM documents " +
       "UNION SELECT r.a, u.b FROM REACH r JOIN UND u ON u.a = r.b) " +
       "SELECT a AS doc_id, min(b) AS component, " +
       "CAST(a = min(b) AS INT) AS is_keeper FROM REACH GROUP BY a ORDER BY doc_id"),
    // Per-vertex triangle counts over the verified near-dup pairs: pairs
    // (b, c) of a's neighbors that are themselves an edge, counted once
    // per unordered pair (b < c).
    "graph_triangles" ->
      (s"WITH $shingleCtes, " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst), " +
       "E AS (SELECT c.src, c.dst FROM COMMONS c " +
       "JOIN SIZES sa ON sa.doc_id = c.src JOIN SIZES sb ON sb.doc_id = c.dst " +
       "WHERE round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) >= 0.5), " +
       "NB AS (SELECT src AS v, dst AS n FROM E UNION ALL SELECT dst, src FROM E), " +
       "T AS (SELECT n1.v, count(*) AS tri FROM NB n1 " +
       "JOIN NB n2 ON n2.v = n1.v AND n1.n < n2.n " +
       "JOIN E ON E.src = n1.n AND E.dst = n2.n GROUP BY n1.v) " +
       "SELECT d.doc_id, CAST(COALESCE(t.tri, 0) AS INT) AS triangles " +
       "FROM documents d LEFT JOIN T t ON t.v = d.doc_id ORDER BY doc_id"),
    // Z-curve interleave re-derived with plain shift/mask arithmetic
    // (31 bits per dimension: max shift 61 — DuckDB BIGINT << overflows
    // at 63, which the expression's 31-bit width is chosen to avoid).
    "layout_datepart" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
       "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events " +
       "WHERE CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-14' " +
       "GROUP BY event_type ORDER BY event_type"),
    // quality gate: each corruption family's count derives from the
    // deterministic construction (dups %1000=1, negated %500=2 under
    // fresh keys, orphaned %700=3 under fresh keys; dates never null)
    "quality_report" ->
      ("SELECT 'fk(o_custkey -> c_custkey)' AS rule, " +
       "CAST(count(*) AS BIGINT) AS n_violations FROM orders " +
       "WHERE o_orderkey % 700 = 3 " +
       "UNION ALL SELECT 'not_null(o_orderdate)', CAST(0 AS BIGINT) " +
       "UNION ALL SELECT 'positive(o_totalprice)', " +
       "CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 500 = 2 " +
       "UNION ALL SELECT 'unique(o_orderkey)', " +
       "CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 1000 = 1 " +
       "ORDER BY rule"),
    // per-group triage: the negated-price corruption is the only
    // violating family; not_null never fires (dates complete)
    "quality_by_group" ->
      ("SELECT o_orderpriority, 'not_null(o_orderdate)' AS rule, " +
       "CAST(0 AS BIGINT) AS n_violations FROM orders " +
       "GROUP BY o_orderpriority " +
       "UNION ALL SELECT o_orderpriority, 'positive(o_totalprice)', " +
       "CAST(sum(CASE WHEN o_orderkey % 500 = 2 THEN 1 ELSE 0 END) AS BIGINT) " +
       "FROM orders GROUP BY o_orderpriority " +
       "ORDER BY o_orderpriority, rule"),
    // freshness: latest landed day vs the expected watermark
    "quality_freshness" ->
      ("SELECT max(CAST(ts AS DATE)) AS latest_date, " +
       "DATE '2024-01-30' AS expected_from, " +
       "max(CAST(ts AS DATE)) >= DATE '2024-01-30' AS fresh FROM events"),
    // partition gaps: days inside [min, max] of the remaining dates
    // that are not present (the two excluded days, derived not assumed)
    "quality_partitions" ->
      ("WITH RECURSIVE P AS (SELECT DISTINCT CAST(ts AS DATE) AS d " +
       "FROM events WHERE CAST(ts AS DATE) NOT IN " +
       "(DATE '2024-01-10', DATE '2024-01-20')), " +
       "B AS (SELECT min(d) AS lo, max(d) AS hi FROM P), " +
       "G AS (SELECT lo AS expected_date, hi FROM B UNION ALL " +
       "SELECT CAST(expected_date + INTERVAL 1 DAY AS DATE), hi " +
       "FROM G WHERE expected_date < hi) " +
       "SELECT expected_date FROM G WHERE expected_date NOT IN " +
       "(SELECT d FROM P) ORDER BY expected_date"),
    // retention: survivors = dates at/after the horizon
    "layout_retention" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
       "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events " +
       "WHERE CAST(ts AS DATE) >= '2024-01-08' " +
       "GROUP BY event_type ORDER BY event_type"),
    // backfill: day 15 replaced by its corrected load (user_id%10=7
    // rows dropped), every other day intact; re-run converges
    "layout_backfill_day" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
       "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events " +
       "WHERE NOT (CAST(ts AS DATE) = '2024-01-15' AND user_id % 10 = 7) " +
       "GROUP BY event_type ORDER BY event_type"),
    // the dim-filtered star join reduces to the weekend-day filter
    // (isodow >= 6 == Spark's dayofweek IN (1, 7))
    "layout_dpp" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
       "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events " +
       "WHERE isodow(CAST(ts AS DATE)) >= 6 " +
       "GROUP BY event_type ORDER BY event_type"),
    "layout_zvalue" ->
      ("SELECT event_id, user_id, " +
       "CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day, " +
       "CAST(list_sum(list_transform(range(31), b -> " +
       "((user_id >> b) & 1) * (CAST(1 AS BIGINT) << (2*b)) + " +
       "((day >> b) & 1) * (CAST(1 AS BIGINT) << (2*b+1)))) AS BIGINT) AS z " +
       "FROM events ORDER BY z, event_id"),
    // Delta-vs-index: band collisions across the mod-5 split, Jaccard
    // verified on the collided candidates only.
    "dedup_incremental" ->
      (s"WITH $shingleCtes, " +
       "DB AS (SELECT doc_id AS delta_id, b, k FROM BANDS WHERE doc_id % 5 = 0), " +
       "IB AS (SELECT doc_id AS index_id, b, k FROM BANDS WHERE doc_id % 5 <> 0), " +
       "CAND AS (SELECT DISTINCT d.delta_id, i.index_id FROM DB d " +
       "JOIN IB i ON d.b = i.b AND d.k = i.k), " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT c.delta_id, c.index_id, count(*) AS ncommon FROM CAND c " +
       "JOIN SH a ON a.doc_id = c.delta_id " +
       "JOIN SH b2 ON b2.doc_id = c.index_id AND b2.sh = a.sh " +
       "GROUP BY c.delta_id, c.index_id) " +
       "SELECT c.delta_id, c.index_id, " +
       "round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) AS jaccard " +
       "FROM COMMONS c JOIN SIZES sa ON sa.doc_id = c.delta_id " +
       "JOIN SIZES sb ON sb.doc_id = c.index_id " +
       "WHERE round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) >= 0.5 " +
       "ORDER BY delta_id, index_id"),
    // co-located join result == the plain join over the base tables
    "layout_bucketed_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
       "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
       "FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // the folded view == a from-scratch GROUP BY, bit-exact decimal sums
    "mv_orders_build" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
    // after delta + delete + compact: the survivors' GROUP BY exactly
    "mv_orders_lifecycle" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders WHERE o_orderkey % 7 <> 3 " +
       "GROUP BY o_custkey ORDER BY o_custkey"),
    // top-k view after build 80% -> delta 20% -> delete every 7th: the
    // survivors' per-priority top-3 by price (orderkey tie-break)
    "mv_topk_lifecycle" ->
      ("WITH R AS (SELECT o_orderpriority, o_orderkey, " +
       "CAST(o_totalprice AS DECIMAL(18,2)) AS p, " +
       "row_number() OVER (PARTITION BY o_orderpriority " +
       "ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey) AS rk " +
       "FROM orders WHERE o_orderkey % 7 <> 3) " +
       "SELECT o_orderpriority, o_orderkey, CAST(p AS DOUBLE) AS price, " +
       "CAST(rk AS INT) AS rk FROM R WHERE rk <= 3 " +
       "ORDER BY o_orderpriority, rk"),
    // join view after build 80% -> delta 20% -> delete every 7th: the
    // survivors' fact⋈dim GROUP BY exactly (decimal-exact sums)
    "mv_join_lifecycle" ->
      ("SELECT c_nationkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders JOIN customer ON o_custkey = c_custkey " +
       "WHERE o_orderkey % 7 <> 3 " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"),
    // distinct view after build 80% -> delta 20% -> delete every 7th:
    // the survivors' COUNT(DISTINCT) exactly — refcounts are exact
    "mv_distinct_lifecycle" ->
      ("SELECT o_orderpriority, count(DISTINCT o_custkey) AS ndv, " +
       "count(*) AS cnt FROM orders WHERE o_orderkey % 7 <> 3 " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // min/max view after build 80% -> delta 20% -> delete every 7th:
    // the survivors' min/max GROUP BY exactly (order-based, no rounding)
    "mv_minmax_lifecycle" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price, " +
       "CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price " +
       "FROM orders WHERE o_orderkey % 7 <> 3 " +
       "GROUP BY o_custkey ORDER BY o_custkey"),
    // version diff: the same deterministic v2, statuses by text compare
    "corpus_diff" ->
      ("WITH V2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3 " +
       "THEN text || ' v2' ELSE text END AS text " +
       "FROM documents WHERE doc_id % 11 <> 5 " +
       "UNION ALL SELECT doc_id + 1000000 AS doc_id, text " +
       "FROM documents WHERE doc_id % 13 = 1) " +
       "SELECT status, count(*) AS n FROM (" +
       "SELECT CASE WHEN a.doc_id IS NULL THEN 'added' " +
       "WHEN b.doc_id IS NULL THEN 'removed' " +
       "WHEN a.text <> b.text THEN 'changed' " +
       "ELSE 'unchanged' END AS status " +
       "FROM documents a FULL OUTER JOIN V2 b ON a.doc_id = b.doc_id) " +
       "GROUP BY status ORDER BY status"),
    // a drained CDC stream: same survivors' GROUP BY as the batch row
    "stream_mv_cdc" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders WHERE NOT (o_orderkey % 5 <> 0 AND o_orderkey % 7 = 3) " +
       "GROUP BY o_custkey ORDER BY o_custkey"),
    // CDC batch applied: base + inserts − deletes, the survivors' GROUP BY
    "mv_orders_cdc" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders WHERE NOT (o_orderkey % 5 <> 0 AND o_orderkey % 7 = 3) " +
       "GROUP BY o_custkey ORDER BY o_custkey"),
    // the same CDC survivors, through the fact⋈dim join view
    "mv_join_cdc" ->
      ("SELECT c_nationkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders JOIN customer ON o_custkey = c_custkey " +
       "WHERE NOT (o_orderkey % 5 <> 0 AND o_orderkey % 7 = 3) " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"),
    // a drained distinct-view stream == the one-shot COUNT(DISTINCT)
    "stream_mv_distinct" ->
      ("SELECT o_orderpriority, count(DISTINCT o_custkey) AS ndv, " +
       "count(*) AS cnt FROM orders " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // a drained min/max-view stream == the one-shot min/max GROUP BY
    "stream_mv_minmax" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price, " +
       "CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price " +
       "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
    // a drained view-maintenance stream == the one-shot GROUP BY
    "stream_mv_ingest" ->
      ("SELECT o_custkey, count(*) AS n_orders, " +
       "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
       "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
    // a drained (replay-overlapped) band-ingest stream converges to the
    // build-at-once collisions
    "stream_dedup_ingest" ->
      (s"WITH $shingleCtes, " +
       "DB AS (SELECT doc_id AS delta_id, b, k FROM BANDS WHERE doc_id % 5 = 0), " +
       "IB AS (SELECT doc_id AS index_id, b, k FROM BANDS WHERE doc_id % 5 <> 0) " +
       "SELECT DISTINCT d.delta_id, i.index_id FROM DB d " +
       "JOIN IB i ON d.b = i.b AND d.k = i.k ORDER BY delta_id, index_id"),
    // capstone: base+delta invisible in the final state — survivors only
    "dedup_index_lifecycle" ->
      (s"WITH $shingleCtes, " +
       "DB AS (SELECT doc_id AS delta_id, b, k FROM BANDS WHERE doc_id % 5 = 0), " +
       "IB AS (SELECT doc_id AS index_id, b, k FROM BANDS " +
       "WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 3) " +
       "SELECT DISTINCT d.delta_id, i.index_id FROM DB d " +
       "JOIN IB i ON d.b = i.b AND d.k = i.k ORDER BY delta_id, index_id"),
    // band collisions recomputed over the SURVIVING index docs only
    "dedup_index_delete" ->
      (s"WITH $shingleCtes, " +
       "DB AS (SELECT doc_id AS delta_id, b, k FROM BANDS WHERE doc_id % 5 = 0), " +
       "IB AS (SELECT doc_id AS index_id, b, k FROM BANDS " +
       "WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 3) " +
       "SELECT DISTINCT d.delta_id, i.index_id FROM DB d " +
       "JOIN IB i ON d.b = i.b AND d.k = i.k ORDER BY delta_id, index_id"),
    "a5_stats" ->
      ("SELECT count(DISTINCT o_custkey) AS n_cust, min(o_totalprice) AS min_price, " +
       "max(o_totalprice) AS max_price, " +
       "round(quantile_cont(o_totalprice, 0.5), 4) AS median_price, " +
       "round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price FROM orders"),
    "dedup_simhash" ->
      (s"WITH $simhashCtes SELECT doc_id, simhash FROM SIG ORDER BY doc_id"),
    // word-anchored 8-gram windows WITH multiplicity; Spark groups the
    // spans query on xxhash64(gram) — identical grouping, the string
    // never surfaces there
    "dedup_substring" ->
      (s"WITH $substrGramCte " +
       "SELECT gram, CAST(count(*) AS BIGINT) AS n_occ, " +
       "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS min_doc " +
       "FROM G GROUP BY gram HAVING count(*) >= 2 " +
       "ORDER BY n_occ DESC, gram LIMIT 100"),
    "dedup_doc_spans" ->
      (s"WITH $substrGramCte, " +
       "D AS (SELECT gram FROM G GROUP BY gram HAVING count(*) >= 2), " +
       "T AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM G GROUP BY doc_id), " +
       "U AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM G SEMI JOIN D USING (gram) GROUP BY doc_id) " +
       "SELECT t.doc_id, t.n_windows, CAST(coalesce(u.n_dup, 0) AS BIGINT) AS n_dup, " +
       "round(CAST(coalesce(u.n_dup, 0) AS DOUBLE) / t.n_windows, 4) AS dup_frac " +
       "FROM T t LEFT JOIN U u USING (doc_id) ORDER BY doc_id"),
    "dedup_simhash_pairs" ->
      (s"WITH $simhashCtes, " +
       "BANDS AS (SELECT doc_id, simhash, unnest(range(4)) AS band FROM SIG), " +
       "BB AS (SELECT doc_id, simhash, band, (simhash >> CAST(band * 8 AS INT)) & 255 AS byte FROM BANDS), " +
       "P AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst, " +
       "bit_count(xor(a.simhash, b.simhash)) AS hamming " +
       "FROM BB a JOIN BB b ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id) " +
       "SELECT src, dst, CAST(hamming AS INT) AS hamming FROM P WHERE hamming <= 3 " +
       "ORDER BY src, dst"),
    "text_tokens" ->
      (s"SELECT doc_id, CAST(len(string_split($docNorm, ' ')) AS INT) AS ws_tokens, " +
       "CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS word_tokens, " +
       "CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\f\\r]')) AS INT) AS symbol_tokens " +
       "FROM documents ORDER BY doc_id"),
    "text_quality" ->
      (s"WITH base AS (SELECT doc_id, text, $docNorm AS nt, string_split($docNorm, ' ') AS w FROM documents), " +
       "q AS (SELECT doc_id, CAST(length(text) AS INT) AS n_chars, CAST(len(w) AS INT) AS n_tokens, " +
       "round(CAST(length(replace(nt, ' ', '')) AS DOUBLE) / CAST(len(w) AS DOUBLE), 4) AS mean_tok_len, " +
       "round(CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE) / " +
       "CAST(len(w) AS DOUBLE), 4) AS stopword_ratio, " +
       "round(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio " +
       "FROM base) " +
       "SELECT *, CASE WHEN n_tokens < 5 THEN 'too_short' " +
       "WHEN stopword_ratio < 0.01 THEN 'low_stopword' ELSE 'keep' END AS quality " +
       "FROM q ORDER BY doc_id"),
    "text_langid" ->
      (s"WITH base AS (SELECT doc_id, lang, string_split($docNorm, ' ') AS w FROM documents), " +
       "h AS (SELECT doc_id, lang AS labeled_lang, " +
       "CAST(len(list_filter(w, x -> list_contains(['the','a','of','and'], x))) AS INT) AS en_hits, " +
       "CAST(len(list_filter(w, x -> list_contains(['der','die','und','das'], x))) AS INT) AS de_hits, " +
       "CAST(len(list_filter(w, x -> list_contains(['le','et','les','une'], x))) AS INT) AS fr_hits, " +
       "CAST(len(list_filter(w, x -> list_contains(['el','y','los','una'], x))) AS INT) AS es_hits " +
       "FROM base) " +
       "SELECT *, CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en' " +
       "WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de' " +
       "WHEN fr_hits >= es_hits THEN 'fr' ELSE 'es' END AS predicted_lang " +
       "FROM h ORDER BY doc_id"),
    // per-chunk langid vote -> per-doc majority; rank window tie-breaks
    // (votes DESC, lang ASC) exactly like Spark's min-struct aggregate
    "text_langid_mixed" -> {
      val k = TextAnalysis.ChunkTokens
      s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
      s"C AS (SELECT doc_id, unnest(generate_series(0, CAST(ceil(len(w) / $k.0) AS INT) - 1)) AS i, w FROM W), " +
      s"CW AS (SELECT doc_id, w[i * $k + 1 : i * $k + $k] AS cw FROM C), " +
      "H AS (SELECT doc_id, " +
      "len(list_filter(cw, x -> list_contains(['the','a','of','and'], x))) AS en_hits, " +
      "len(list_filter(cw, x -> list_contains(['der','die','und','das'], x))) AS de_hits, " +
      "len(list_filter(cw, x -> list_contains(['le','et','les','une'], x))) AS fr_hits, " +
      "len(list_filter(cw, x -> list_contains(['el','y','los','una'], x))) AS es_hits FROM CW), " +
      "L AS (SELECT doc_id, CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en' " +
      "WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de' " +
      "WHEN fr_hits >= es_hits THEN 'fr' ELSE 'es' END AS chunk_lang FROM H), " +
      "V AS (SELECT doc_id, chunk_lang, count(*) AS n FROM L GROUP BY 1, 2), " +
      "M AS (SELECT doc_id, chunk_lang, n, " +
      "row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, chunk_lang) AS rk, " +
      "sum(n) OVER (PARTITION BY doc_id) AS n_chunks FROM V) " +
      "SELECT doc_id, chunk_lang AS majority_lang, CAST(n AS BIGINT) AS n_majority, " +
      "CAST(n_chunks AS BIGINT) AS n_chunks, " +
      "round(CAST(n AS DOUBLE) / CAST(n_chunks AS DOUBLE), 4) AS majority_frac, " +
      "CAST(n < n_chunks AS INT) AS is_mixed " +
      "FROM M WHERE rk = 1 ORDER BY doc_id"
    },
    "text_fingerprint" ->
      (s"SELECT doc_id, md5($docNorm) AS fp, substr(md5($docNorm), 1, 8) AS fp_short " +
       "FROM documents ORDER BY doc_id"),
    // composition report: langid CASE + quality keep CASE + exact-dup
    // keeper, aggregated per (source, lang) — same sub-expressions as the
    // text_langid / text_quality / dedup_exact oracles
    "corpus_report" ->
      (s"WITH base AS (SELECT doc_id, source, lang, string_split($docNorm, ' ') AS w, " +
       s"md5($docNorm) AS h FROM documents), " +
       "r AS (SELECT doc_id, source, lang, len(w) AS n_tokens, h, " +
       "CASE WHEN len(list_filter(w, x -> list_contains(['the','a','of','and'], x))) >= len(list_filter(w, x -> list_contains(['der','die','und','das'], x))) " +
       "AND len(list_filter(w, x -> list_contains(['the','a','of','and'], x))) >= len(list_filter(w, x -> list_contains(['le','et','les','une'], x))) " +
       "AND len(list_filter(w, x -> list_contains(['the','a','of','and'], x))) >= len(list_filter(w, x -> list_contains(['el','y','los','una'], x))) THEN 'en' " +
       "WHEN len(list_filter(w, x -> list_contains(['der','die','und','das'], x))) >= len(list_filter(w, x -> list_contains(['le','et','les','une'], x))) " +
       "AND len(list_filter(w, x -> list_contains(['der','die','und','das'], x))) >= len(list_filter(w, x -> list_contains(['el','y','los','una'], x))) THEN 'de' " +
       "WHEN len(list_filter(w, x -> list_contains(['le','et','les','une'], x))) >= len(list_filter(w, x -> list_contains(['el','y','los','una'], x))) THEN 'fr' ELSE 'es' END AS plang, " +
       "CASE WHEN len(w) < 5 THEN 0.0 " +
       "WHEN round(CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE) / CAST(len(w) AS DOUBLE), 4) < 0.01 THEN 0.0 " +
       "ELSE 1.0 END AS keep_flag FROM base), " +
       "k AS (SELECT h, min(doc_id) AS keeper FROM r GROUP BY h) " +
       "SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs, " +
       "CAST(sum(n_tokens) AS BIGINT) AS n_tokens, " +
       "round(avg(n_tokens), 4) AS avg_tokens, " +
       "round(avg(keep_flag), 4) AS keep_rate, " +
       "round(avg(CASE WHEN r.doc_id <> k.keeper THEN 1.0 ELSE 0.0 END), 4) AS dup_rate, " +
       "round(avg(CASE WHEN plang = lang THEN 1.0 ELSE 0.0 END), 4) AS lang_match_rate " +
       "FROM r JOIN k USING (h) GROUP BY source, lang ORDER BY source, lang"),
    // Document frequency = plain count because SH is distinct per doc;
    // the (df DESC, gram) order is total, so LIMIT is deterministic.
    "text_ngram_topk" ->
      (s"WITH $shingleCtes SELECT sh AS gram, count(*) AS df FROM SH " +
       "GROUP BY sh ORDER BY df DESC, gram LIMIT 20"),
    "sim_topk_bruteforce" ->
      (s"WITH $embCtes, " +
       "Q AS (SELECT vec_id AS qid, v AS qv FROM E WHERE vec_id < 8), " +
       s"J AS (SELECT Q.qid, E.vec_id, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E CROSS JOIN Q WHERE E.vec_id <> Q.qid), " +
       "R AS (SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J) " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos " +
       "FROM R WHERE rank <= 5 ORDER BY qid, rank"),
    "sim_near_dup" ->
      (s"WITH $embCtes, " +
       "A AS (SELECT vec_id AS src, label, v AS av FROM E WHERE vec_id % 100 = 0), " +
       s"J AS (SELECT A.src, E.vec_id AS dst, round(${cosSql("A.av", "E.v")}, 4) AS cos " +
       "FROM A JOIN E ON A.label = E.label AND A.src <> E.vec_id) " +
       "SELECT src, dst, cos FROM J WHERE cos >= 0.25 ORDER BY src, dst"),
    "sim_topk_custom" ->
      (s"WITH $embCtes, " +
       "Q AS (SELECT vec_id AS qid, v AS qv FROM E WHERE vec_id < 8), " +
       s"J AS (SELECT Q.qid, E.vec_id, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E CROSS JOIN Q WHERE E.vec_id <> Q.qid), " +
       "R AS (SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J) " +
       "SELECT qid, vec_id, round(cos, 4) AS cos FROM R WHERE rank <= 5 " +
       "ORDER BY qid, round(cos, 4) DESC, vec_id"),
    "sim_ann_lsh" ->
      (s"WITH $annBucketCtes, " +
       "Q AS (SELECT vec_id AS qid, v AS qv, bucket FROM E WHERE vec_id < 8), " +
       s"J AS (SELECT Q.qid, E.vec_id, E.bucket, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E JOIN Q ON E.bucket = Q.bucket AND E.vec_id <> Q.qid), " +
       "R AS (SELECT qid, vec_id, bucket, cos, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J) " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, bucket " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // hard negatives: same bucket join as sim_ann_lsh, positives (cos >=
    // 0.25, the sim_near_dup threshold) cut before ranking
    "sim_hard_negatives" ->
      (s"WITH $annBucketCtes, " +
       "Q AS (SELECT vec_id AS qid, v AS qv, bucket FROM E WHERE vec_id < 8), " +
       s"J AS (SELECT Q.qid, E.vec_id, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E JOIN Q ON E.bucket = Q.bucket AND E.vec_id <> Q.qid), " +
       "R AS (SELECT qid, vec_id, cos, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J WHERE cos < 0.25) " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    "sim_ann_multiprobe" ->
      (s"WITH $annBucketCtes, $annMultiProbeQCte, " +
       s"J AS (SELECT Q.qid, E.vec_id, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E JOIN Q ON E.bucket = Q.bucket AND E.vec_id <> Q.qid), " +
       "R AS (SELECT qid, vec_id, cos, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J) " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // recall@3 of the multi-probe ANN vs the brute-force truth: the two
    // already-oracled chains composed, LEFT JOIN so misses count as 0.
    "sim_ann_recall" ->
      (s"WITH $annBucketCtes, $annMultiProbeQCte, " +
       s"JM AS (SELECT Q.qid, E.vec_id, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E JOIN Q ON E.bucket = Q.bucket AND E.vec_id <> Q.qid), " +
       "RM AS (SELECT qid, vec_id, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM JM), " +
       "ANN AS (SELECT qid, vec_id FROM RM WHERE rank <= 3), " +
       "QB AS (SELECT vec_id AS qid, v AS qv FROM E0 WHERE vec_id < 8), " +
       s"JB AS (SELECT QB.qid, E0.vec_id, round(${cosSql("E0.v", "QB.qv")}, 6) AS cos " +
       "FROM E0 CROSS JOIN QB WHERE E0.vec_id <> QB.qid), " +
       "RB AS (SELECT qid, vec_id, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM JB), " +
       "BF AS (SELECT qid, vec_id FROM RB WHERE rank <= 3) " +
       "SELECT b.qid, round(CAST(count(a.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS recall " +
       "FROM BF b LEFT JOIN ANN a ON a.qid = b.qid AND a.vec_id = b.vec_id " +
       "GROUP BY b.qid ORDER BY b.qid"),
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
    "sim_ann_ivf" ->
      ("WITH E0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "E AS (SELECT vec_id, v, concat_ws('_', " +
       "CAST(CAST(floor(v[1]/0.2) AS BIGINT) AS VARCHAR), " +
       "CAST(CAST(floor(v[2]/0.2) AS BIGINT) AS VARCHAR), " +
       "CAST(CAST(floor(v[3]/0.2) AS BIGINT) AS VARCHAR)) AS cell FROM E0), " +
       "Q AS (SELECT vec_id AS qid, v AS qv, cell FROM E WHERE vec_id < 8), " +
       s"J AS (SELECT Q.qid, E.vec_id, E.cell, round(${cosSql("E.v", "Q.qv")}, 6) AS cos " +
       "FROM E JOIN Q ON E.cell = Q.cell AND E.vec_id <> Q.qid), " +
       "R AS (SELECT qid, vec_id, cell, cos, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM J) " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // trained-IVF: sim_kmeans_assign's centroid/distance CTEs feed cell
    // assignment (rk = 1) and the per-query nprobe=2 probe set (rk <= 2);
    // candidates are an equi-join on cell, ranked by the exact cosine
    "sim_ann_ivf_trained" ->
      (s"WITH $ivfTrainedCtes " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // the index-served path must return byte-identical rows to the
    // in-query trained IVF — same oracle chain
    "sim_ann_ivf_indexed" ->
      (s"WITH $ivfTrainedCtes " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // query-only twin + external-query form: same rows, same oracle
    "sim_ann_ivf_query" ->
      (s"WITH $ivfTrainedCtes " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    "sim_ann_ivf_external" ->
      (s"WITH $ivfTrainedCtes " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // delta ingest with a FROZEN quantizer: centroids train on the 80%
    // base only; every vector (base + delta) is assigned and probed
    // against those — the same chain with C restricted to the base split
    "sim_ann_ivf_index_delta" ->
      (s"WITH ${ivfTrainedCtesFrom("vec_id % 5 <> 0")} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // compaction is layout-only: identical oracle to the delta row
    "sim_ann_ivf_index_compact" ->
      (s"WITH ${ivfTrainedCtesFrom("vec_id % 5 <> 0")} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // tombstone deletion: the quantizer stays FROZEN on the full corpus
    // (build-then-delete), so C trains on everything and only the
    // CANDIDATE set excludes the victims — the engine's broadcast
    // anti-join semantics exactly
    "sim_ann_ivf_index_delete" ->
      (s"WITH ${ivfTrainedCtesFrom("TRUE", 2,
         "NOT (ec.vec_id % 7 = 3 AND ec.vec_id >= 8)")} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // full-CRUD capstone: C frozen on the base split, every vector
    // assigned/probed against it, victims excluded from candidates only
    "sim_ann_ivf_lifecycle" ->
      (s"WITH ${ivfTrainedCtesFrom("vec_id % 5 <> 0", FiltNprobe,
         "NOT (ec.vec_id % 7 = 3 AND ec.vec_id >= 8)")} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // attribute-filtered probe: the same chain with the predicate on the
    // CANDIDATE set (pre-filter semantics — rank among the survivors)
    "sim_ann_filtered" ->
      (s"WITH ${ivfTrainedCtesFrom("TRUE", FiltNprobe, filtPredSql)} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       s"FROM R WHERE rank <= $FiltK ORDER BY qid, rank"),
    // per-query label matching: J re-derived with each query's OWN label
    // from the shared trained-chain CTEs
    "sim_ann_label_matched" ->
      (s"WITH ${ivfTrainedCtesFrom("TRUE", FiltNprobe, "TRUE")}, " +
       s"QL AS (SELECT vec_id AS qid, label AS qlabel FROM E0 WHERE vec_id < $FiltNQ), " +
       s"JM AS (SELECT p.qid, ec.vec_id, ec.cell, round(${cosSql("ec.v", "QV.qv")}, 6) AS cos " +
       "FROM PROBE p JOIN EC ec ON ec.cell = p.cell JOIN QV ON QV.qid = p.qid " +
       "JOIN QL ON QL.qid = p.qid WHERE ec.vec_id <> p.qid AND ec.label = QL.qlabel), " +
       "RM AS (SELECT qid, vec_id, cell, cos, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM JM) " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       s"FROM RM WHERE rank <= $FiltK ORDER BY qid, rank"),
    // the warm query-only twin serves the same rows — one oracle chain
    "sim_ann_filtered_query" ->
      (s"WITH ${ivfTrainedCtesFrom("TRUE", FiltNprobe, filtPredSql)} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       s"FROM R WHERE rank <= $FiltK ORDER BY qid, rank"),
    // pre-vs-post recall adjudication: PRE ranks J's survivors under the
    // predicate; POST takes the UNFILTERED rank <= widen*k cut, filters,
    // re-ranks; truth is the exact filtered brute force over E0 — both
    // recalls are ratios of counts over nQueries*k (every knob
    // interpolated from the SAME constants the query entry passes)
    "sim_ann_filtered_recall" ->
      (s"WITH ${ivfTrainedCtesFrom("TRUE", FiltNprobe, "TRUE")}, " +
       "PREC AS (SELECT j.qid, j.vec_id, row_number() OVER " +
       "(PARTITION BY j.qid ORDER BY j.cos DESC, j.vec_id) AS rk " +
       s"FROM J j JOIN E0 ec ON ec.vec_id = j.vec_id WHERE $filtPredSql), " +
       s"PRE AS (SELECT qid, vec_id FROM PREC WHERE rk <= $FiltK), " +
       "POSTC AS (SELECT r.qid, r.vec_id, row_number() OVER " +
       "(PARTITION BY r.qid ORDER BY r.cos DESC, r.vec_id) AS rk2 " +
       "FROM R r JOIN E0 ec ON ec.vec_id = r.vec_id " +
       s"WHERE r.rank <= ${FiltWiden * FiltK} AND $filtPredSql), " +
       s"POST AS (SELECT qid, vec_id FROM POSTC WHERE rk2 <= $FiltK), " +
       s"TC AS (SELECT QV.qid, ec.vec_id, row_number() OVER " +
       s"(PARTITION BY QV.qid ORDER BY round(${cosSql("ec.v", "QV.qv")}, 6) DESC, ec.vec_id) AS rk " +
       s"FROM E0 ec CROSS JOIN QV WHERE $filtPredSql AND ec.vec_id <> QV.qid), " +
       s"T AS (SELECT qid, vec_id FROM TC WHERE rk <= $FiltK) " +
       "SELECT 'pre' AS mode, round(CAST((SELECT count(*) FROM PRE JOIN T " +
       s"ON PRE.qid = T.qid AND PRE.vec_id = T.vec_id) AS DOUBLE) / ${FiltNQ * FiltK}.0, 4) AS recall " +
       "UNION ALL " +
       "SELECT 'post' AS mode, round(CAST((SELECT count(*) FROM POST JOIN T " +
       s"ON POST.qid = T.qid AND POST.vec_id = T.vec_id) AS DOUBLE) / ${FiltNQ * FiltK}.0, 4) AS recall " +
       "ORDER BY mode DESC"),
    // fused (IVF-PQ) filtered probe: the PQ chain with the predicate on
    // the ADC candidate set — filter BEFORE the lossy shortlist cut,
    // mirroring the engine's codes-scan pushdown
    "sim_ann_filtered_fused" ->
      (s"WITH ${ivfPqChain("TRUE", FiltNprobe, -1, filtPredSql)} " +
       annTopkSelect),
    // SQ8 filtered probe: same contract on the 8× rung
    "sim_ann_filtered_sq" ->
      (s"WITH ${ivfSqChain("TRUE", FiltNprobe, -1, filtPredSql)} " +
       annTopkSelect),
    // residual (IVFADC) filtered probe: same contract, LUT per cell
    "sim_ann_filtered_residual" ->
      (s"WITH ${ivfPqResidualChain("TRUE", FiltNprobe, -1, filtPredSql)} " +
       annTopkSelect),
    // the selectivity sweep: one shared unfiltered fused chain, one
    // suffixed pre/post/truth block per predicate (same CTE shapes as
    // the single-pred fused recall oracle), unioned with sel tags
    "sim_ann_filtered_selectivity" -> fusedSelectivitySweepSql,
    // fused pre-vs-post: PRE = the ADC set filtered BEFORE the shortlist
    // cut (ADC rows are per-candidate sums, so filtering them equals
    // filtering the scan), re-ranked by the exact cosine; POST = the
    // unfiltered fused pipeline's final ranks widened to widen*k,
    // filtered, re-ranked on the published 4dp cosine; truth = exact
    // filtered brute force
    "sim_ann_filtered_fused_recall" ->
      (s"WITH ${ivfPqChain("TRUE", FiltNprobe)}, " +
       s"ADCF AS (SELECT a.* FROM ADC a JOIN E0 ec ON ec.vec_id = a.vec_id WHERE $filtPredSql), " +
       "SLP AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
       "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADCF) " +
       s"WHERE rk <= ${slShortlist(FiltNprobe, -1)}), " +
       "PREC AS (SELECT j.qid, j.vec_id, row_number() OVER " +
       "(PARTITION BY j.qid ORDER BY j.cos DESC, j.vec_id) AS rk " +
       "FROM J j JOIN SLP s ON s.qid = j.qid AND s.vec_id = j.vec_id), " +
       s"PRE AS (SELECT qid, vec_id FROM PREC WHERE rk <= $FiltK), " +
       "POSTC AS (SELECT r.qid, r.vec_id, row_number() OVER " +
       "(PARTITION BY r.qid ORDER BY round(r.cos, 4) DESC, r.vec_id) AS rk2 " +
       "FROM RR r JOIN E0 ec ON ec.vec_id = r.vec_id " +
       s"WHERE r.rank <= ${FiltWiden * FiltK} AND $filtPredSql), " +
       s"POST AS (SELECT qid, vec_id FROM POSTC WHERE rk2 <= $FiltK), " +
       s"TC AS (SELECT QV.qid, ec.vec_id, row_number() OVER " +
       s"(PARTITION BY QV.qid ORDER BY round(${cosSql("ec.v", "QV.qv")}, 6) DESC, ec.vec_id) AS rk " +
       s"FROM E0 ec CROSS JOIN QV WHERE $filtPredSql AND ec.vec_id <> QV.qid), " +
       s"T AS (SELECT qid, vec_id FROM TC WHERE rk <= $FiltK) " +
       "SELECT 'pre' AS mode, round(CAST((SELECT count(*) FROM PRE JOIN T " +
       s"ON PRE.qid = T.qid AND PRE.vec_id = T.vec_id) AS DOUBLE) / ${FiltNQ * FiltK}.0, 4) AS recall " +
       "UNION ALL " +
       "SELECT 'post' AS mode, round(CAST((SELECT count(*) FROM POST JOIN T " +
       s"ON POST.qid = T.qid AND POST.vec_id = T.vec_id) AS DOUBLE) / ${FiltNQ * FiltK}.0, 4) AS recall " +
       "ORDER BY mode DESC"),
    // a drained ANN ingest stream converges to the batch delta result
    "stream_ann_ingest" ->
      (s"WITH ${ivfTrainedCtesFrom("vec_id % 5 <> 0")} " +
       "SELECT qid, vec_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos, cell " +
       "FROM R WHERE rank <= 3 ORDER BY qid, rank"),
    // the PQ-fused index: trained-IVF chain + PQ codes (sim_pq_codes'
    // per-subspace argmin over the SAME C), per-query ADC lookup table,
    // candidates restricted to the probed cells and scored by 8 exact
    // integer LUT sums, shortlist rk <= 10 by (d2, vec_id), then the
    // survivors re-ranked by the exact rounded cosine — every stage
    // engine-reproducible, including which candidates the lossy ADC keeps
    "sim_ann_ivfpq_indexed" -> ivfPqSqlFrom("TRUE"),
    // query-only twin (session-prebuilt index) and the external-query
    // form both serve the SAME rows as the build+query fixture — one
    // oracle chain gates all three paths
    "sim_ann_ivfpq_query" -> ivfPqSqlFrom("TRUE"),
    "sim_ann_ivfpq_external" -> ivfPqSqlFrom("TRUE"),
    // fused-index delta ingest: BOTH quantizers (coarse cells + PQ
    // codebook) trained on the base split only; every vector assigned,
    // encoded, probed, and ADC-scored against those frozen artifacts
    "sim_ann_ivfpq_index_delta" -> ivfPqSqlFrom("vec_id % 5 <> 0"),
    // a drained fused-ingest stream converges to the batch fused-delta
    // result: same frozen-artifact oracle
    "stream_ivfpq_ingest" -> ivfPqSqlFrom("vec_id % 5 <> 0"),
    // SQ8: byte-range codes per dim, ADC on the exact-integer
    // dequantization — the 8× rung of the compression ladder
    "sim_ann_ivfsq_indexed" -> ivfSqSqlFrom("TRUE"),
    "sim_ann_ivfsq_query" -> ivfSqSqlFrom("TRUE"),
    "sim_ann_ivfpqr_query" -> ivfPqResidualSqlFrom("TRUE"),
    // SQ8 delta ingest: trainer + coarse quantizer frozen on the base
    // split; out-of-range delta values saturate (greatest/least)
    "sim_ann_ivfsq_index_delta" -> ivfSqSqlFrom("vec_id % 5 <> 0"),
    // residual encoding (IVFADC): codes argmin over the RESIDUAL
    // codebook, LUT rebased per probed cell — every stage still exact
    // integer math, so even the lossy shortlist is reproducible
    "sim_ann_ivfpq_residual" -> ivfPqResidualSqlFrom("TRUE"),
    // the nprobe/recall sweep across all three rungs
    "sim_ann_nprobe_sweep" -> nprobeSweepSql,
    "sim_ann_nprobe_autotune" -> nprobeAutotuneSql,
    // probe-bounded range search: the trained-IVF chain's scored
    // candidates (J) thresholded instead of rank-cut
    "sim_ann_range_search" ->
      (s"WITH $ivfTrainedCtes " +
       "SELECT qid, vec_id, round(cos, 4) AS cos, cell FROM J " +
       "WHERE cos >= 0.25 ORDER BY qid, vec_id"),
    // index stats: list-size distribution + imbalance over the chain's
    // argmin cell assignment (identical to the stored lists)
    "sim_ann_index_stats" ->
      (s"WITH $ivfTrainedCtes, " +
       "CS AS (SELECT cell, count(*) AS n FROM CELL GROUP BY cell) " +
       "SELECT CAST(count(*) AS BIGINT) AS n_cells, " +
       "CAST(sum(n) AS BIGINT) AS n_vectors, " +
       "CAST(min(n) AS BIGINT) AS min_list, " +
       "CAST(max(n) AS BIGINT) AS max_list, " +
       "round(avg(n), 4) AS avg_list, " +
       "round(CAST(max(n) AS DOUBLE) / round(avg(n), 4), 4) AS imbalance " +
       "FROM CS"),
    // residual-index delta ingest: both residual artifacts (coarse
    // centroids + residual codebook) trained on the base split only
    "sim_ann_ivfpq_residual_delta" -> ivfPqResidualSqlFrom("vec_id % 5 <> 0"),
    // drift audit: base-trained vs full-trained argmin cells compared
    // per vector, both exact integer-space assignments
    "sim_ann_ivf_drift" ->
      ("WITH Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "QQ AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
       "CB AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM QQ WHERE vec_id % 5 <> 0 GROUP BY label, dim), " +
       "CF AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM QQ GROUP BY label, dim), " +
       "DB AS (SELECT x.vec_id, c.c_label, sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM QQ x JOIN CB c ON x.dim = c.dim GROUP BY x.vec_id, c.c_label), " +
       "DF AS (SELECT x.vec_id, c.c_label, sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM QQ x JOIN CF c ON x.dim = c.dim GROUP BY x.vec_id, c.c_label), " +
       "AB AS (SELECT vec_id, c_label AS base_cell FROM " +
       "(SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DB) WHERE rk = 1), " +
       "AF AS (SELECT vec_id, c_label AS full_cell FROM " +
       "(SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DF) WHERE rk = 1) " +
       "SELECT count(*) AS n_vectors, " +
       "CAST(sum(CASE WHEN base_cell <> full_cell THEN 1 ELSE 0 END) AS BIGINT) AS n_moved, " +
       "round(CAST(sum(CASE WHEN base_cell <> full_cell THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS drift " +
       "FROM AB JOIN AF ON AB.vec_id = AF.vec_id"),
    // retrain policy: the drift chain (base-trained CB = the stored
    // frozen quantizer vs CF = full-corpus retrain) crossed with the two
    // thresholds the query runs; retrained = rounded drift >= threshold.
    // Both rows carry the same pre-retrain drift by construction
    "sim_ann_ivf_retrain" ->
      ("WITH Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "QQ AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
       "CB AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM QQ WHERE vec_id % 5 <> 0 GROUP BY label, dim), " +
       "CF AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM QQ GROUP BY label, dim), " +
       "DB AS (SELECT x.vec_id, c.c_label, sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM QQ x JOIN CB c ON x.dim = c.dim GROUP BY x.vec_id, c.c_label), " +
       "DF AS (SELECT x.vec_id, c.c_label, sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM QQ x JOIN CF c ON x.dim = c.dim GROUP BY x.vec_id, c.c_label), " +
       "AB AS (SELECT vec_id, c_label AS stored_cell FROM " +
       "(SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DB) WHERE rk = 1), " +
       "AF AS (SELECT vec_id, c_label AS fresh_cell FROM " +
       "(SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DF) WHERE rk = 1), " +
       "D AS (SELECT count(*) AS n_vectors, " +
       "CAST(sum(CASE WHEN stored_cell <> fresh_cell THEN 1 ELSE 0 END) AS BIGINT) AS n_moved, " +
       "round(CAST(sum(CASE WHEN stored_cell <> fresh_cell THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS drift " +
       "FROM AB JOIN AF ON AB.vec_id = AF.vec_id) " +
       "SELECT n_vectors, n_moved, drift, CAST(t.threshold AS DOUBLE) AS threshold, " +
       "(drift >= t.threshold) AS retrained FROM D CROSS JOIN " +
       "(SELECT 1.0 AS threshold UNION ALL SELECT 0.0) t ORDER BY threshold"),
    // SemDeDup: the trained-IVF CELL chain feeds the within-cell pair
    // join; canonical order = (ccos to own centroid, vec_id); a vector is
    // dropped iff a strictly-more-canonical same-cell neighbor sits at
    // cosine >= 0.35 (rounded to 6 before the compare, both engines)
    "dedup_semantic" ->
      (s"WITH $ivfTrainedCtes, " +
       "CV AS (SELECT c_label, list(c6 / 1000000.0 ORDER BY dim) AS cv FROM C GROUP BY c_label), " +
       s"X AS (SELECT e.vec_id, e.v, CELL.cell, round(${cosSql("e.v", "CV.cv")}, 6) AS ccos " +
       "FROM E0 e JOIN CELL ON CELL.vec_id = e.vec_id JOIN CV ON CV.c_label = CELL.cell), " +
       "D AS (SELECT DISTINCT r.vec_id FROM X r JOIN X l ON l.cell = r.cell " +
       "AND (l.ccos < r.ccos OR (l.ccos = r.ccos AND l.vec_id < r.vec_id)) " +
       s"WHERE round(${cosSql("l.v", "r.v")}, 6) >= 0.35) " +
       "SELECT x.vec_id, x.cell, round(x.ccos, 4) AS ccos, (d.vec_id IS NULL) AS kept " +
       "FROM X x LEFT JOIN D d ON d.vec_id = x.vec_id ORDER BY x.vec_id"),
    // recall@3 of the trained-IVF vs brute force: the two oracled chains
    // composed, LEFT JOIN so misses count as 0
    "sim_ann_ivf_trained_recall" ->
      (s"WITH $ivfTrainedCtes, " +
       "ANN AS (SELECT qid, vec_id FROM R WHERE rank <= 3), " +
       "QB AS (SELECT vec_id AS qid, v AS qv FROM E0 WHERE vec_id < 8), " +
       s"JB AS (SELECT QB.qid, E0.vec_id, round(${cosSql("E0.v", "QB.qv")}, 6) AS cos " +
       "FROM E0 CROSS JOIN QB WHERE E0.vec_id <> QB.qid), " +
       "RB AS (SELECT qid, vec_id, row_number() OVER " +
       "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM JB), " +
       "BF AS (SELECT qid, vec_id FROM RB WHERE rank <= 3) " +
       "SELECT b.qid, round(CAST(count(a.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS recall " +
       "FROM BF b LEFT JOIN ANN a ON a.qid = b.qid AND a.vec_id = b.vec_id " +
       "GROUP BY b.qid ORDER BY b.qid"),
    // coalesce(text,'') mirrors intersectKeepLeft's null→[] semantics
    // (the reference treats null lists as [], student_service.py:131).
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
    "mm_features" ->
      ("WITH M AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
       "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, md5(text) AS h, " +
       "CAST(doc_id % 7 + 1 AS INT) AS bw, CAST(doc_id % 5 + 1 AS INT) AS bh FROM documents) " +
       "SELECT doc_id, kind, " +
       "CAST(CASE WHEN kind = 'image' THEN 54 + ((bw * 3 + 3) // 4 * 4) * bh " +
       "ELSE octet_length(from_hex(h)) END AS INT) AS byte_len, " +
       "CAST(CASE WHEN kind = 'image' THEN bw ELSE " +
       "16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) + " +
       "strpos('0123456789abcdef', substr(h, 2, 1)) - 1 END AS INT) AS width, " +
       "CAST(CASE WHEN kind = 'image' THEN bh ELSE " +
       "16 * (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) + " +
       "strpos('0123456789abcdef', substr(h, 4, 1)) - 1 END AS INT) AS height, " +
       "CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS INT) AS channels " +
       "FROM M ORDER BY doc_id"),
    // the resized top-left pixel: NN (0,0) maps to source (0,0), which in
    // the bottom-up 24-bit BMP sits at byte offset (h-1)*rowlen (B,G,R) of
    // the md5-cycled pixel data
    "mm_resize" ->
      ("WITH I AS (SELECT doc_id, md5(text) AS m, CAST(doc_id % 7 + 1 AS INT) AS w, " +
       "CAST(doc_id % 5 + 1 AS INT) AS h FROM documents WHERE doc_id % 3 = 0), " +
       "D AS (SELECT doc_id, m, w, h, (3 * w + 3) // 4 * 4 AS rowlen, " +
       "least(greatest(w, h), 4) AS t FROM I), " +
       "E AS (SELECT doc_id, m, w, h, " +
       "greatest((w * t) // greatest(w, h), 1) AS rw, " +
       "greatest((h * t) // greatest(w, h), 1) AS rh, " +
       "(h - 1) * rowlen AS off FROM D), " +
       "P AS (SELECT doc_id, w, h, rw, rh, " +
       "(instr('0123456789abcdef', substr(m, 2 * (off % 16) + 1, 1)) - 1) * 16 + " +
       "instr('0123456789abcdef', substr(m, 2 * (off % 16) + 2, 1)) - 1 AS cb, " +
       "(instr('0123456789abcdef', substr(m, 2 * ((off + 1) % 16) + 1, 1)) - 1) * 16 + " +
       "instr('0123456789abcdef', substr(m, 2 * ((off + 1) % 16) + 2, 1)) - 1 AS cg, " +
       "(instr('0123456789abcdef', substr(m, 2 * ((off + 2) % 16) + 1, 1)) - 1) * 16 + " +
       "instr('0123456789abcdef', substr(m, 2 * ((off + 2) % 16) + 2, 1)) - 1 AS cr FROM E) " +
       "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
       "CAST(rw AS INT) AS rw, CAST(rh AS INT) AS rh, " +
       "CAST(cr * 65536 + cg * 256 + cb AS INT) AS corner_rgb, " +
       "CAST(rw * rh * 3 AS BIGINT) AS out_px_bytes FROM P ORDER BY doc_id"),
    "mm_frames" ->
      ("WITH M AS (SELECT doc_id, md5(text) AS hx FROM documents WHERE doc_id % 3 = 2), " +
       "D AS (SELECT doc_id, " +
       "greatest(16*(strpos('0123456789abcdef', substr(hx,1,1))-1) + strpos('0123456789abcdef', substr(hx,2,1))-1, 1) AS w, " +
       "greatest(16*(strpos('0123456789abcdef', substr(hx,3,1))-1) + strpos('0123456789abcdef', substr(hx,4,1))-1, 1) AS h, " +
       "16*(strpos('0123456789abcdef', substr(hx,5,1))-1) + strpos('0123456789abcdef', substr(hx,6,1))-1 + 1 AS n_frames FROM M), " +
       "F AS (SELECT doc_id, w, h, n_frames, unnest(range(0, n_frames, 8)) AS frame_idx FROM D) " +
       "SELECT doc_id, CAST(n_frames AS INT) AS n_frames, CAST(frame_idx AS INT) AS frame_idx, " +
       "md5(CAST(doc_id AS VARCHAR) || '_' || CAST(frame_idx AS VARCHAR)) AS frame_hash, " +
       "CAST(least(w, 64) AS INT) AS rw, " +
       "CAST(greatest((h * least(w, 64)) // w, 1) AS INT) AS rh " +
       "FROM F ORDER BY doc_id, frame_idx"),
    // audio frames: the payload IS unhex(md5(text)), so the oracle reads
    // byte k straight from the md5 hex; sample j mixes the cycled pair
    // with Knuth's constant — exact integer math on both engines
    "mm_audio_frames" ->
      ("WITH M AS (SELECT doc_id, md5(text) AS hx FROM documents WHERE doc_id % 3 = 1), " +
       "B AS (SELECT doc_id, hx, " +
       "16*(strpos('0123456789abcdef', substr(hx, 1, 1))-1) + strpos('0123456789abcdef', substr(hx, 2, 1))-1 AS b0 FROM M), " +
       "N AS (SELECT doc_id, hx, CAST(256 + (b0 % 8) * 128 AS INT) AS n_samples FROM B), " +
       "F AS (SELECT doc_id, hx, n_samples, unnest(range(0, n_samples - 256 + 1, 128)) AS start FROM N), " +
       "S AS (SELECT doc_id, n_samples, start, list_transform(range(start, start + 256), j -> " +
       "((16*(strpos('0123456789abcdef', substr(hx, ((j*2) % 16)*2 + 1, 1))-1) + strpos('0123456789abcdef', substr(hx, ((j*2) % 16)*2 + 2, 1))-1) * 256 " +
       "+ (16*(strpos('0123456789abcdef', substr(hx, ((j*2+1) % 16)*2 + 1, 1))-1) + strpos('0123456789abcdef', substr(hx, ((j*2+1) % 16)*2 + 2, 1))-1) " +
       "+ j * 2654435761) % 65536 - 32768) AS s FROM F) " +
       "SELECT doc_id, n_samples, CAST(start // 128 AS INT) AS frame_idx, " +
       "CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy, " +
       "CAST(list_max(list_transform(s, x -> abs(x))) AS INT) AS peak, " +
       "CAST(len(list_filter(range(1, 256), i -> (s[i] < 0) <> (s[i+1] < 0))) AS INT) AS crossings " +
       "FROM S ORDER BY doc_id, frame_idx"),
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
      "SELECT o.id, o.name, o.address, " +
      "CASE WHEN lower(trim(coalesce(o.board,''))) = lower(trim(coalesce(s.board,''))) THEN 1 ELSE 0 END AS bm, " +
      "CASE WHEN lower(trim(coalesce(o.stream,''))) = lower(trim(coalesce(s.stream,''))) THEN 1 ELSE 0 END AS sm, " +
      "CASE WHEN lower(trim(coalesce(o.college,''))) = lower(trim(coalesce(s.college,''))) THEN 1 ELSE 0 END AS cm, " +
      "CASE WHEN lower(trim(coalesce(o.address,''))) = lower(trim(coalesce(s.address,''))) THEN 1 ELSE 0 END AS am " +
      "FROM students o, s WHERE o.id <> 1) " +
      "SELECT id, name, address, CAST(NULL AS VARCHAR) AS interests, bm, sm, cm, am, " +
      "array_to_string(list_filter([CASE WHEN bm = 1 THEN 'board' END, CASE WHEN sm = 1 THEN 'stream' END, " +
      "CASE WHEN cm = 1 THEN 'college' END, CASE WHEN am = 1 THEN 'address' END], " +
      "x -> x IS NOT NULL), '|') AS matched_on, " +
      "bm + sm + cm + am AS score FROM scored WHERE bm + sm + cm + am > 0 " +
      "ORDER BY score DESC, id"),
    "recommend_message" -> withStudents(
      ", s AS (SELECT * FROM students WHERE id = 1), scored AS (" +
      "SELECT o.id, o.name, " +
      "(CASE WHEN lower(trim(coalesce(o.board,''))) = lower(trim(coalesce(s.board,''))) THEN 1 ELSE 0 END) + " +
      "(CASE WHEN lower(trim(coalesce(o.stream,''))) = lower(trim(coalesce(s.stream,''))) THEN 1 ELSE 0 END) + " +
      "(CASE WHEN lower(trim(coalesce(o.college,''))) = lower(trim(coalesce(s.college,''))) THEN 1 ELSE 0 END) + " +
      "(CASE WHEN lower(trim(coalesce(o.address,''))) = lower(trim(coalesce(s.address,''))) THEN 1 ELSE 0 END) AS score " +
      "FROM students o, s WHERE o.id <> 1), " +
      "m AS (SELECT list(name ORDER BY score DESC, id) AS names FROM scored WHERE score > 0) " +
      "SELECT CASE WHEN len(names) = 0 THEN 'Sorry, no matches found for this platform.' " +
      "WHEN len(names) = 1 THEN names[1] || ' is also in this platform.' " +
      "WHEN len(names) = 2 THEN names[1] || ' and ' || names[2] || ' are also in this platform.' " +
      "ELSE array_to_string(names[1:len(names)-1], ', ') || ', and ' || names[-1] || " +
      "' are also in this platform.' END AS message, " +
      "CAST(len(names) AS BIGINT) AS total_matches FROM m"),
    "u4_explain_students" -> withStudents(
      ", D AS (SELECT id, concat_ws(chr(10), 'Name: ' || name, " +
      "'Address: ' || address, 'College: ' || college, 'Board: ' || board, " +
      "'Stream: ' || stream) AS d FROM students WHERE id < 5) " +
      "SELECT CASE WHEN count(*) = 0 THEN " +
      "'I''m sorry, but I couldn''t find any students matching your query in the database.' " +
      "ELSE 'I found the following students matching your query:' || chr(10) || chr(10) || " +
      "string_agg(d, chr(10) || chr(10) ORDER BY id) END AS response FROM D"),
    "u4_explain_count" -> withStudents(
      "SELECT 'There are ' || count(*) || " +
      "' students matching your query in the database.' AS response FROM students"),
    "ingest_onboard_row" -> withStudents(
      s"$newStudentSql SELECT id, name, college, board, stream, address FROM n"),
    "ingest_onboard_delta" -> withStudents(
      newStudentSql + ", delta AS (" +
      Seq("college" -> "SAME_COLLEGE", "board" -> "SAME_BOARD",
          "stream" -> "SAME_STREAM", "address" -> "NEARBY")
        .map { case (a, t) =>
          s"SELECT least(s.id, n.id) AS src, greatest(s.id, n.id) AS dst, '$t' AS rel_type " +
          s"FROM students s, n WHERE s.id <> n.id " +
          s"AND s.$a IS NOT NULL AND n.$a IS NOT NULL " +
          s"AND lower(trim(coalesce(s.$a,''))) <> '' " +
          s"AND lower(trim(coalesce(s.$a,''))) = lower(trim(coalesce(n.$a,'')))"
        }.mkString(" UNION ALL ") +
      ") SELECT * FROM delta ORDER BY rel_type, src, dst"),
    "j6_exists" -> withStudents(
      "SELECT id FROM students st WHERE EXISTS " +
      "(SELECT 1 FROM orders o WHERE o.o_custkey = st.id) ORDER BY id"),
    "edges_backfill" -> withStudents(
      s", e AS ($edgesSql) SELECT * FROM e ORDER BY rel_type, src, dst"),
    // DETACH DELETE: the backfilled edge view minus every edge incident
    // to the victim (node removal is the trivial id filter)
    "ingest_detach_delete" -> withStudents(
      s", e AS ($edgesSql) SELECT * FROM e WHERE src <> 3 AND dst <> 3 " +
      "ORDER BY rel_type, src, dst"),
    // neighbor-set jaccard: undirected 4-rule edge view TRUNCATED to the
    // 32 smallest neighbor ids per node (the bounded-state GDS-style
    // slice), wedge join for common neighbors, inner (>=1 shared
    // neighbor) like the Spark side
    "graph_node_similarity" -> withStudents(
      s", e AS ($edgesSql), P AS (SELECT DISTINCT src, dst FROM e), " +
      "U0 AS (SELECT src, dst FROM P UNION ALL SELECT dst AS src, src AS dst FROM P), " +
      "U AS (SELECT src, dst FROM (SELECT src, dst, " +
      "row_number() OVER (PARTITION BY src ORDER BY dst) AS rn FROM U0) WHERE rn <= 32), " +
      "D AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM U GROUP BY src), " +
      "C AS (SELECT x.src AS a, x.dst AS b, CAST(count(*) AS BIGINT) AS common " +
      "FROM (SELECT src, dst FROM U WHERE src % 200 = 0) x " +
      "JOIN U u1 ON u1.src = x.src JOIN U u2 ON u2.src = x.dst AND u2.dst = u1.dst " +
      "GROUP BY x.src, x.dst), " +
      "J AS (SELECT c.a, c.b, c.common, round(CAST(c.common AS DOUBLE) / " +
      "CAST(da.deg + db.deg - c.common AS DOUBLE), 4) AS jaccard " +
      "FROM C c JOIN D da ON da.src = c.a JOIN D db ON db.src = c.b), " +
      "R AS (SELECT *, row_number() OVER (PARTITION BY a ORDER BY jaccard DESC, b) AS rk FROM J) " +
      "SELECT a, b, common, jaccard, CAST(rk AS INT) AS rank FROM R WHERE rk <= 3 " +
      "ORDER BY a, rank"),
    "edges_skew_salted" -> withStudents(skewOracleSql),
    "edges_skew_unsalted" -> withStudents(skewOracleSql),
    // same checksum: AQE splitting is an execution-plan change only
    "edges_skew_aqe" -> withStudents(skewOracleSql),
    "j2_rare_token_pairs" ->
      (s"WITH toks AS (SELECT doc_id AS id, unnest(list_distinct(string_split($docNorm, ' '))) AS tok FROM documents), " +
       "rare AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM toks GROUP BY tok) WHERE df <= 250), " +
       "rt AS (SELECT id, tok FROM toks JOIN rare USING (tok)) " +
       "SELECT a.id AS src, b.id AS dst, 'SHARES_RARE_TOKEN' AS rel_type, " +
       "array_to_string(list_sort(list(a.tok)), '|') AS common " +
       "FROM rt a JOIN rt b ON a.tok = b.tok AND a.id < b.id " +
       "GROUP BY a.id, b.id ORDER BY src, dst"),
    "j2_shares_interest" ->
      ("WITH toks AS (SELECT DISTINCT p_partkey AS id, " +
       "unnest(string_split(lower(p_name), ' ')) AS tok FROM part) " +
       "SELECT a.id AS src, b.id AS dst, 'SHARES_INTEREST' AS rel_type, " +
       "array_to_string(list_sort(list(a.tok)), '|') AS common " +
       "FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id " +
       "GROUP BY a.id, b.id ORDER BY src, dst"),
    "ingest_interest_delta" ->
      ("WITH toks AS (SELECT DISTINCT p_partkey AS id, " +
       "unnest(string_split(lower(p_name), ' ')) AS tok FROM part), " +
       "n AS (SELECT unnest(['burnished','gizmo','red','unobtainium']) AS tok), " +
       "c AS (SELECT t.id, list_sort(list(t.tok)) AS common FROM toks t JOIN n USING (tok) GROUP BY t.id) " +
       "SELECT least(id, 10000000) AS src, greatest(id, 10000000) AS dst, " +
       "'SHARES_INTEREST' AS rel_type, array_to_string(common, '|') AS common " +
       "FROM c ORDER BY src, dst"),
    "j7_merge_anti" -> withStudents(
      ", cand AS (SELECT a.id AS src, b.id AS dst, 'SAME_BOARD' AS rel_type " +
      "FROM students a JOIN students b ON a.board = b.board AND a.id < b.id " +
      "WHERE a.id < 200 AND b.id < 200) " +
      "SELECT * FROM cand c WHERE NOT EXISTS (SELECT 1 FROM cand e " +
      "WHERE e.src = c.src AND e.dst = c.dst AND e.src < 100 AND e.dst < 100) " +
      "ORDER BY src, dst"),
    "j4_pair_relationship" -> withStudents(
      s", eq AS ($edgesSql), " +
      "si_toks AS (SELECT id, unnest(['p' || CAST(id // 2 AS VARCHAR), " +
      "'r' || CAST(id AS VARCHAR)]) AS tok FROM students), " +
      "si AS (SELECT a.id AS src, b.id AS dst, 'SHARES_INTEREST' AS rel_type, " +
      "list_sort(list(a.tok)) AS common FROM si_toks a JOIN si_toks b " +
      "ON a.tok = b.tok AND a.id < b.id GROUP BY a.id, b.id), " +
      "e AS (SELECT src, dst, rel_type, CAST(NULL AS VARCHAR[]) AS common FROM eq " +
      "UNION ALL SELECT * FROM si), " +
      "a AS (SELECT id AS a_id, name AS a_name, college AS a_college, " +
      "board AS a_board, stream AS a_stream, " +
      "['p' || CAST(id // 2 AS VARCHAR), 'r' || CAST(id AS VARCHAR)] AS a_arr " +
      "FROM students WHERE lower(name) = lower('Customer#000000000')), " +
      "b AS (SELECT id AS b_id, name AS b_name, college AS b_college, " +
      "board AS b_board, stream AS b_stream, " +
      "['p' || CAST(id // 2 AS VARCHAR), 'r' || CAST(id AS VARCHAR)] AS b_arr " +
      "FROM students WHERE lower(name) = lower('Customer#000000001')) " +
      "SELECT a_id, a_name, b_id, b_name, e.rel_type, " +
      "array_to_string(e.common, '|') AS common, " +
      "CAST(a_college = b_college AS INT) AS same_college, " +
      "CAST(a_board = b_board AS INT) AS same_board, " +
      "CAST(a_stream = b_stream AS INT) AS same_stream, " +
      "array_to_string(list_filter(a_arr, x -> list_contains(b_arr, x)), '|') " +
      "AS common_interests " +
      "FROM a CROSS JOIN b LEFT JOIN e ON (e.src = a_id AND e.dst = b_id) " +
      "OR (e.src = b_id AND e.dst = a_id) ORDER BY rel_type LIMIT 25"),
    "j9_range_join" ->
      ("WITH E AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events) " +
       "SELECT a.user_id AS user_id, a.event_id AS src, b.event_id AS dst, b.sec - a.sec AS dt_sec " +
       "FROM E a JOIN E b ON a.user_id = b.user_id AND b.sec >= a.sec " +
       "AND b.sec - a.sec <= 600 " +
       "AND (a.sec < b.sec OR (a.sec = b.sec AND a.event_id < b.event_id)) " +
       "ORDER BY a.user_id, src, dst"),
    "j8_asof_join" ->
      ("WITH O AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey " +
       "FROM orders GROUP BY o_custkey, o_orderdate) " +
       "SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s, " +
       "o.o_orderkey FROM events e ASOF LEFT JOIN O o " +
       "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate ORDER BY e.event_id"),
    "fuzzy_search_lev" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // the index-served path must return byte-identical rows to the
    // scan-time fuzzy search — same oracle (the bm25_indexed precedent);
    // the index is purely additive, so the delta-maintained row shares it
    "fuzzy_search_indexed" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    "fuzzy_index_delta" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // batch fuzzy: per-query scan scoring + rank window — the indexed
    // batch probe must reproduce it row-for-row (and the query-only
    // warm twin shares the chain verbatim)
    "fuzzy_search_batch" -> fuzzyBatchOracleSql,
    "fuzzy_batch_query" -> fuzzyBatchOracleSql,
    "fuzzy_index_compact" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // post-delete probe == the scan chain over the SURVIVING names (the
    // rebuild-without-victims identity, bm25_index_delete's shape)
    "fuzzy_index_delete" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      "WHERE id % 7 <> 3 AND " +
      s"${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // full-CRUD capstone: base+delta ingested, victims deleted, compacted
    "fuzzy_index_lifecycle" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      "WHERE id % 7 <> 3 AND " +
      s"${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // the prefix-filtered probe changes WHAT is read, never the answer —
    // same oracle as the plain indexed row (and its query-only twin)
    "fuzzy_skip_query" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    "fuzzy_search_skip" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // query-only twin off the warm standing index — same oracle
    "fuzzy_search_query" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // per-gram posting-list skew: occurrence-bag counts per 2-gram,
    // recomputed from the corpus names (positions 1..len-1)
    "fuzzy_index_stats" -> withStudents(
      ", N AS (SELECT id, name, length(name) AS len FROM students WHERE length(name) >= 2), " +
      "G AS (SELECT id, substr(name, CAST(i AS INT), 2) AS gram " +
      "FROM (SELECT id, name, unnest(range(1, len)) AS i FROM N)), " +
      "S AS (SELECT gram, count(*) AS n FROM G GROUP BY gram) " +
      "SELECT CAST(count(*) AS BIGINT) AS n_grams, " +
      "CAST(sum(n) AS BIGINT) AS n_postings, " +
      "CAST(min(n) AS BIGINT) AS min_gram, " +
      "CAST(max(n) AS BIGINT) AS max_gram, " +
      "round(avg(n), 4) AS avg_gram, " +
      "round(CAST(max(n) AS DOUBLE) / round(avg(n), 4), 4) AS imbalance " +
      "FROM S"),
    // a drained fuzzy ingest stream converges to the scan-path result
    "stream_fuzzy_ingest" -> withStudents(
      "SELECT id, name, college, board, stream, address, " +
      s"${levScoreSql("name")} AS score FROM students " +
      s"WHERE ${levScoreSql("name")} >= 70.0 ORDER BY score DESC, id LIMIT 10"),
    // rapidfuzz Indel parity IN SQL: ratio = 100·(1 − (|a|+|b|−2·LCS)/(|a|+|b|)).
    // DuckDB has no LCS built-in, so the DP runs as a recursive CTE over
    // ANTI-DIAGONALS: diagonal d+1 depends only on diagonals d (cur) and
    // d−1 (prev) — no intra-diagonal dependency, so each step is one
    // list_transform; cell (i, j=d−i) reads cur[i−lo], cur[i+1−lo],
    // prev[i−lo'] with lo = max(0, d−|b|) the diagonal's first i. LCS =
    // the single cell of diagonal |a|+|b|. Property-tested against a
    // reference DP over random strings (incl. empty) before landing; this
    // removes the suite's one rows-only gate entry.
    "fuzzy_search_indel" -> {
      val q = fuzzyQuery
      s"WITH RECURSIVE students AS (${graft.model.Tables.studentsSql}), " +
      "P AS (SELECT id, name, college, board, stream, address, " +
      s"name AS a, '$q' AS b, length(name) AS la, length('$q') AS lb FROM students), " +
      "DG AS (" +
      "SELECT id, a, b, la, lb, 0 AS d, [CAST(0 AS BIGINT)] AS cur, CAST(NULL AS BIGINT[]) AS prev FROM P " +
      "UNION ALL " +
      "SELECT id, a, b, la, lb, d + 1, " +
      "list_transform(range(greatest(0, d + 1 - lb), least(la, d + 1) + 1), i -> " +
      "CASE WHEN i = 0 OR i = d + 1 THEN CAST(0 AS BIGINT) " +
      "WHEN substr(a, CAST(i AS INT), 1) = substr(b, CAST(d + 1 - i AS INT), 1) " +
      "THEN COALESCE(prev[CAST(i - greatest(0, d - 1 - lb) AS INT)], 0) + 1 " +
      "ELSE greatest(cur[CAST(i - greatest(0, d - lb) AS INT)], " +
      "cur[CAST(i + 1 - greatest(0, d - lb) AS INT)]) END), " +
      "cur FROM DG WHERE d < la + lb), " +
      "L AS (SELECT id, cur[1] AS lcs FROM DG WHERE d = la + lb), " +
      "S AS (SELECT p.id, p.name, p.college, p.board, p.stream, p.address, " +
      "CASE WHEN p.la + p.lb = 0 THEN 100.0 ELSE " +
      "round(100.0 * (1.0 - CAST(p.la + p.lb - 2 * l.lcs AS DOUBLE) / CAST(p.la + p.lb AS DOUBLE)), 4) END AS score " +
      "FROM P p JOIN L l ON p.id = l.id) " +
      "SELECT * FROM S WHERE score >= 70.0 ORDER BY score DESC, id LIMIT 10"
    },
    "u2_token_correct" -> withStudents(
      s", T AS (SELECT unnest(string_split(lower('$tokenQuestion'), ' ')) AS token), " +
      "F AS (SELECT token FROM T WHERE length(token) >= 3 AND token NOT IN " +
      "('the','a','an','of','and','who','what','is','are','in','on','with','find','show')), " +
      "SC AS (SELECT f.token, s.name, " +
      "round((1.0 - CAST(levenshtein(s.name, f.token) AS DOUBLE) / " +
      "CAST(greatest(length(s.name), length(f.token)) AS DOUBLE)) * 100.0, 4) AS score " +
      "FROM F f CROSS JOIN students s), " +
      "R AS (SELECT token, name, score, row_number() OVER " +
      "(PARTITION BY token ORDER BY score DESC, name) AS rn FROM SC) " +
      "SELECT token, name AS corrected, score FROM R " +
      "WHERE rn = 1 AND score >= 75.0 ORDER BY token"),
    // the index-served token correction must be row-identical
    "u2_token_correct_indexed" -> withStudents(
      s", T AS (SELECT unnest(string_split(lower('$tokenQuestion'), ' ')) AS token), " +
      "F AS (SELECT token FROM T WHERE length(token) >= 3 AND token NOT IN " +
      "('the','a','an','of','and','who','what','is','are','in','on','with','find','show')), " +
      "SC AS (SELECT f.token, s.name, " +
      "round((1.0 - CAST(levenshtein(s.name, f.token) AS DOUBLE) / " +
      "CAST(greatest(length(s.name), length(f.token)) AS DOUBLE)) * 100.0, 4) AS score " +
      "FROM F f CROSS JOIN students s), " +
      "R AS (SELECT token, name, score, row_number() OVER " +
      "(PARTITION BY token ORDER BY score DESC, name) AS rn FROM SC) " +
      "SELECT token, name AS corrected, score FROM R " +
      "WHERE rn = 1 AND score >= 75.0 ORDER BY token"),
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
    "text_clean" ->
      ("WITH R AS (SELECT doc_id, text, concat('<doc id=\"', CAST(doc_id AS VARCHAR), " +
       "'\" src=\"', source, '\">  http://', source, '.example.com/', " +
       "CAST(doc_id AS VARCHAR), ' \n', text, '  <br/>\t</doc>') AS raw FROM documents), " +
       "C AS (SELECT doc_id, text, raw, trim(regexp_replace(regexp_replace(regexp_replace(" +
       "raw, '<[^>]*>', ' ', 'g'), 'https?://[^ \t\n]+', ' ', 'g'), " +
       "'[ \t\n\f\r]+', ' ', 'g')) AS cleaned FROM R) " +
       "SELECT doc_id, length(raw) AS n_raw, length(cleaned) AS n_clean, " +
       "CAST(cleaned = trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')) AS INT) AS roundtrip_ok, " +
       "md5(cleaned) AS clean_fp FROM C ORDER BY doc_id"),
    "sample_split" ->
      (s"WITH B AS (SELECT doc_id, md5(concat('split|', CAST(doc_id AS VARCHAR))) AS h FROM documents), " +
       "K AS (SELECT doc_id, (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
       "instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS bucket FROM B) " +
       "SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, " +
       s"CASE WHEN bucket < ${graft.ops.Sampling.TrainUpper} THEN 'train' " +
       s"WHEN bucket < ${graft.ops.Sampling.ValUpper} THEN 'val' ELSE 'test' END AS split " +
       "FROM K ORDER BY doc_id"),
    // the components chain (dedup_components' recursive CTE) + the same
    // two-hex-digit bucket keyed on the component id
    "sample_split_safe" ->
      (s"WITH RECURSIVE $shingleCtes, " +
       "SIZES AS (SELECT doc_id, count(*) AS nsh FROM SH GROUP BY doc_id), " +
       "COMMONS AS (SELECT p.src, p.dst, count(*) AS ncommon FROM PAIRS p " +
       "JOIN SH a ON a.doc_id = p.src JOIN SH b ON b.doc_id = p.dst AND b.sh = a.sh " +
       "GROUP BY p.src, p.dst), " +
       "NEAR AS (SELECT c.src, c.dst FROM COMMONS c " +
       "JOIN SIZES sa ON sa.doc_id = c.src JOIN SIZES sb ON sb.doc_id = c.dst " +
       "WHERE round(CAST(ncommon AS DOUBLE) / CAST(sa.nsh + sb.nsh - ncommon AS DOUBLE), 4) >= 0.5), " +
       "UND AS (SELECT src AS a, dst AS b FROM NEAR UNION ALL SELECT dst, src FROM NEAR), " +
       "REACH(a, b) AS (SELECT doc_id, doc_id FROM documents " +
       "UNION SELECT r.a, u.b FROM REACH r JOIN UND u ON u.a = r.b), " +
       "COMP AS (SELECT a AS doc_id, min(b) AS component FROM REACH GROUP BY a), " +
       "B AS (SELECT doc_id, component, " +
       "md5(concat('split|', CAST(component AS VARCHAR))) AS h FROM COMP), " +
       "K AS (SELECT doc_id, component, " +
       "(instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
       "instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS bucket FROM B) " +
       "SELECT doc_id, component, CAST(bucket AS BIGINT) AS bucket, " +
       s"CASE WHEN bucket < ${graft.ops.Sampling.TrainUpper} THEN 'train' " +
       s"WHEN bucket < ${graft.ops.Sampling.ValUpper} THEN 'val' ELSE 'test' END AS split " +
       "FROM K ORDER BY doc_id"),
    "a9_percentiles" ->
      ("SELECT l_returnflag, " +
       "round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty, " +
       "round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty, " +
       "round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty, " +
       "round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // k-th-smallest (duplicates counted, k = ceil(q*n)) — the engine's
    // bisection must land on EXACTLY this element; q literals generated
    // from the same Quantiles.Qs constant the engine uses
    "a14_exact_quantile" ->
      (s"WITH S AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v, " +
       "row_number() OVER (ORDER BY l_extendedprice) AS rn, " +
       "count(*) OVER () AS n FROM lineitem), " +
       "Q(q) AS (VALUES " +
       graft.ops.Quantiles.Qs.map(q => s"(CAST($q AS DOUBLE))").mkString(", ") +
       ") SELECT q, min(v) AS value FROM Q, S WHERE rn >= ceil(q*n) " +
       "GROUP BY q ORDER BY q"),
    "a15_quantile_grouped" ->
      (s"WITH S AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v, " +
       "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn, " +
       "count(*) OVER (PARTITION BY l_returnflag) AS n FROM lineitem), " +
       "Q(q) AS (VALUES " +
       graft.ops.Quantiles.Qs.map(q => s"(CAST($q AS DOUBLE))").mkString(", ") +
       ") SELECT l_returnflag, q, min(v) AS value FROM Q, S " +
       "WHERE rn >= ceil(q*n) GROUP BY l_returnflag, q ORDER BY l_returnflag, q"),
    // generate_series can't take lateral column args in DuckDB — the list
    // form under unnest can, hence the one-row SPAN CTE exploded directly.
    "w6_gapfill" ->
      ("WITH SPAN AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events), " +
       "DAYS AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), " +
       "CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM SPAN), " +
       "U AS (SELECT DISTINCT user_id FROM events), " +
       "D AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1, 2) " +
       "SELECT u.user_id, strftime(d.day, '%Y-%m-%d') AS day, " +
       "CAST(coalesce(n.n, 0) AS BIGINT) AS n_events " +
       "FROM U u CROSS JOIN DAYS d LEFT JOIN D n ON n.user_id = u.user_id AND n.day = d.day " +
       "ORDER BY u.user_id, d.day"),
    "f14_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
       "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
       "CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k, " +
       "CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k " +
       "FROM events GROUP BY event_type ORDER BY event_type"),
    // DuckDB lists are 1-based (w[i]/w[i+1] over generate_series(1, n-1))
    // vs Spark's 0-based transform(sequence(0, n-2)) — same bigrams. All
    // divisions CAST AS DOUBLE on both sides so round(·, 4) sees the same
    // IEEE value; flags compare the ROUNDED fractions.
    "text_repetition" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "WD AS (SELECT doc_id, unnest(w) AS wd FROM W), " +
       "WG AS (SELECT doc_id, wd, count(*) AS c FROM WD GROUP BY 1, 2), " +
       "WA AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nw, count(*) AS nd, max(c) AS mw FROM WG GROUP BY 1), " +
       "BG AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1), " +
       "i -> w[i] || ' ' || w[i+1])) AS bg FROM W WHERE len(w) >= 2), " +
       "BGG AS (SELECT doc_id, bg, count(*) AS c FROM BG GROUP BY 1, 2), " +
       "BA AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, max(c) AS mb FROM BGG GROUP BY 1), " +
       "J AS (SELECT a.doc_id, nw AS n_words, " +
       "round(1 - CAST(nd AS DOUBLE) / CAST(nw AS DOUBLE), 4) AS dup_word_frac, " +
       "round(CAST(mw AS DOUBLE) / CAST(nw AS DOUBLE), 4) AS top_word_frac, " +
       "round(coalesce(CAST(mb AS DOUBLE) / CAST(nb AS DOUBLE), 0), 4) AS top_bigram_frac " +
       "FROM WA a LEFT JOIN BA b ON a.doc_id = b.doc_id) " +
       "SELECT doc_id, n_words, dup_word_frac, top_word_frac, top_bigram_frac, " +
       "CAST(dup_word_frac >= 0.65 OR top_bigram_frac >= 0.15 AS INT) AS repetitive " +
       "FROM J ORDER BY doc_id"),
    "decontam_overlap" ->
      (s"WITH W AS (SELECT doc_id, source, string_split($docNorm, ' ') AS w FROM documents), " +
       "SH AS (SELECT doc_id, source, unnest(list_distinct(CASE WHEN len(w) >= 3 THEN " +
       "list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) " +
       "ELSE [array_to_string(w, ' ')] END)) AS sh FROM W), " +
       "BENCH AS (SELECT DISTINCT sh FROM SH WHERE source = 'src0'), " +
       "CORP AS (SELECT doc_id, sh FROM SH WHERE source <> 'src0'), " +
       "CNT AS (SELECT doc_id, count(*) AS n_sh FROM CORP GROUP BY 1), " +
       "HIT AS (SELECT doc_id, count(*) AS n_hit FROM CORP SEMI JOIN BENCH USING (sh) GROUP BY 1), " +
       "J AS (SELECT c.doc_id, c.n_sh, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit, " +
       "round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(c.n_sh AS DOUBLE), 4) AS overlap_frac " +
       "FROM CNT c LEFT JOIN HIT h ON c.doc_id = h.doc_id) " +
       s"SELECT doc_id, n_sh, n_hit, overlap_frac, " +
       s"CAST(overlap_frac >= ${graft.ops.Decontam.ContaminatedFrac} AS INT) AS contaminated " +
       "FROM J ORDER BY doc_id"),
    // bloom-pruned decontam returns the IDENTICAL result (the exact verify
    // join kills the sketch's false positives), so it shares the exact
    // path's oracle — that equality is precisely what's being gated
    "decontam_bloom" ->
      (s"WITH W AS (SELECT doc_id, source, string_split($docNorm, ' ') AS w FROM documents), " +
       "SH AS (SELECT doc_id, source, unnest(list_distinct(CASE WHEN len(w) >= 3 THEN " +
       "list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) " +
       "ELSE [array_to_string(w, ' ')] END)) AS sh FROM W), " +
       "BENCH AS (SELECT DISTINCT sh FROM SH WHERE source = 'src0'), " +
       "CORP AS (SELECT doc_id, sh FROM SH WHERE source <> 'src0'), " +
       "CNT AS (SELECT doc_id, count(*) AS n_sh FROM CORP GROUP BY 1), " +
       "HIT AS (SELECT doc_id, count(*) AS n_hit FROM CORP SEMI JOIN BENCH USING (sh) GROUP BY 1), " +
       "J AS (SELECT c.doc_id, c.n_sh, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit, " +
       "round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(c.n_sh AS DOUBLE), 4) AS overlap_frac " +
       "FROM CNT c LEFT JOIN HIT h ON c.doc_id = h.doc_id) " +
       s"SELECT doc_id, n_sh, n_hit, overlap_frac, " +
       s"CAST(overlap_frac >= ${graft.ops.Decontam.ContaminatedFrac} AS INT) AS contaminated " +
       "FROM J ORDER BY doc_id"),
    // PII construction mirrored verbatim; regexes are shared constants from
    // TextAnalysis (RE2∩Java subset) interpolated into both engines.
    "text_pii" -> {
      val (em, ip, ph) = (TextAnalysis.EmailRe, TextAnalysis.IpRe, TextAnalysis.PhoneRe)
      s"WITH R AS (SELECT doc_id, concat(text, ' contact user', CAST(doc_id AS VARCHAR), " +
      "'@mail.example.com or call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), " +
      "' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1') AS raw FROM documents), " +
      s"D AS (SELECT doc_id, raw, regexp_replace(regexp_replace(regexp_replace(raw, " +
      s"'$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g') AS red FROM R) " +
      "SELECT doc_id, " +
      s"CAST(len(regexp_extract_all(raw, '$em')) AS INT) AS n_emails, " +
      s"CAST(len(regexp_extract_all(raw, '$ip')) AS INT) AS n_ips, " +
      s"CAST(len(regexp_extract_all(raw, '$ph')) AS INT) AS n_phones, " +
      s"CAST(len(regexp_extract_all(red, '$em')) + len(regexp_extract_all(red, '$ip')) + " +
      s"len(regexp_extract_all(red, '$ph')) AS INT) AS residual_pii, " +
      "md5(red) AS redacted_fp FROM D ORDER BY doc_id"
    },
    "sample_stratified" ->
      ("WITH H AS (SELECT doc_id, source, md5('strat|' || CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
       "R AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk FROM H) " +
       "SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM R WHERE rk <= 10 " +
       "ORDER BY source, rk"),
    // DuckDB list slicing w[a:b] is 1-based inclusive = Spark slice(w, a, k);
    // unnest(generate_series(...)) repeats the carried columns per element.
    "text_chunks" -> {
      val k = TextAnalysis.ChunkTokens
      s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
      s"C AS (SELECT doc_id, unnest(generate_series(0, CAST(ceil(len(w) / $k.0) AS INT) - 1)) AS i, w FROM W) " +
      s"SELECT doc_id, CAST(i AS INT) AS chunk_idx, " +
      s"array_to_string(w[i * $k + 1 : i * $k + $k], ' ') AS chunk, " +
      s"CAST(len(w[i * $k + 1 : i * $k + $k]) AS INT) AS n_tokens " +
      "FROM C ORDER BY doc_id, chunk_idx"
    },
    // overlap twin: window starts every ChunkStride, last covering start
    // = ceil((len-k)/stride) (clamped at 0 so short docs emit one chunk)
    "text_chunks_overlap" -> {
      val k = TextAnalysis.ChunkTokens
      val st = TextAnalysis.ChunkStride
      s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
      s"C AS (SELECT doc_id, unnest(generate_series(0, " +
      s"CAST(greatest(0, ceil((len(w) - $k) / $st.0)) AS INT))) AS i, w FROM W) " +
      s"SELECT doc_id, CAST(i AS INT) AS chunk_idx, " +
      s"array_to_string(w[i * $st + 1 : i * $st + $k], ' ') AS chunk, " +
      s"CAST(len(w[i * $st + 1 : i * $st + $k]) AS INT) AS n_tokens " +
      "FROM C ORDER BY doc_id, chunk_idx"
    },
    "sample_mix" ->
      ("WITH B AS (SELECT doc_id, source, md5(concat('mix|', CAST(doc_id AS VARCHAR))) AS h FROM documents), " +
       "K AS (SELECT doc_id, source, (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
       "instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS bucket FROM B), " +
       "W AS (SELECT DISTINCT source, 64 * (1 + CAST(substr(source, 4) AS INT) % 4) AS keep_below FROM documents) " +
       "SELECT doc_id, k.source, CAST(w.keep_below AS INT) AS keep_below " +
       "FROM K k JOIN W w ON k.source = w.source WHERE k.bucket < w.keep_below " +
       "ORDER BY doc_id"),
    // temperature-scaled mixture: √n weights quantized to w6 longs,
    // exact-integer floor((w6·B) // Σw6) targets, md5-ranked keep prefix
    // per source — sqrt/round/div all bit-identical cross-engine
    "sample_mix_temperature" ->
      ("WITH C AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source), " +
       "W AS (SELECT source, n_docs, CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS w6 FROM C), " +
       "T AS (SELECT CAST(sum(w6) AS BIGINT) AS wtot, CAST(sum(n_docs) AS BIGINT) AS ntot FROM W), " +
       "D AS (SELECT w.source, w.n_docs, w.w6, " +
       "CAST((CAST(w.w6 AS HUGEINT) * CAST(floor(t.ntot * 0.5) AS BIGINT)) // t.wtot AS BIGINT) AS target " +
       "FROM W w CROSS JOIN T t), " +
       "R AS (SELECT doc_id, source, md5(concat('tmix|', CAST(doc_id AS VARCHAR))) AS h FROM documents), " +
       "K AS (SELECT r.source, CAST(count(*) AS BIGINT) AS kept_docs FROM " +
       "(SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk FROM R) r " +
       "JOIN D d ON d.source = r.source WHERE r.rk <= d.target GROUP BY r.source) " +
       "SELECT d.source, d.n_docs, d.w6, d.target, " +
       "CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs, " +
       "round(CAST(d.target AS DOUBLE) / d.n_docs, 4) AS rate " +
       "FROM D d LEFT JOIN K k ON k.source = d.source ORDER BY d.source"),
    // token-budgeted mixture: integer quota arithmetic (div 256), source-
    // local running sums, crossing doc admitted
    "sample_token_budget" ->
      (s"WITH T AS (SELECT doc_id, source, CAST(len(string_split($docNorm, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
       "S AS (SELECT source, sum(n_tokens) AS src_tokens FROM T GROUP BY source), " +
       "W AS (SELECT DISTINCT source, 64 * (1 + CAST(substr(source, 4) AS INT) % 4) AS keep_below FROM documents), " +
       "Q AS (SELECT s.source, CAST((w.keep_below * s.src_tokens) // 256 AS BIGINT) AS quota " +
       "FROM S s JOIN W w ON s.source = w.source), " +
       "C AS (SELECT t.doc_id, t.source, t.n_tokens, " +
       "sum(t.n_tokens) OVER (PARTITION BY t.source ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens, " +
       "q.quota FROM T t JOIN Q q ON t.source = q.source) " +
       "SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens, quota " +
       "FROM C WHERE cum_tokens - n_tokens < quota ORDER BY doc_id"),
    // A-ES: same 13-hex-digit uniform, same rounded-key ranking
    "sample_weighted" -> {
      val denom = java.lang.Math.pow(16.0, 13)
      "WITH H AS (SELECT doc_id, source, md5(concat('wsample|', CAST(doc_id AS VARCHAR))) AS h FROM documents), " +
      "W AS (SELECT DISTINCT source, 64 * (1 + CAST(substr(source, 4) AS INT) % 4) AS keep_below FROM documents), " +
      "U AS (SELECT doc_id, h.source, CAST(w.keep_below AS DOUBLE) AS w, " +
      s"(${(1 to 13).map(i =>
        s"(instr('0123456789abcdef', substr(h.h, $i, 1)) - 1) * CAST(${java.lang.Math.pow(16.0, 13 - i).toLong} AS BIGINT)")
        .mkString(" + ")} + 0.5) / $denom AS u " +
      "FROM H h JOIN W w ON h.source = w.source) " +
      "SELECT doc_id, source, w, round(pow(u, 1.0 / w), 6) AS \"key\" FROM U " +
      "ORDER BY \"key\" DESC, doc_id LIMIT 50"
    },
    "a10_kmv_distinct" -> {
      val k = graft.ops.Sketches.DefaultK
      s"WITH H AS (SELECT DISTINCT l_returnflag AS g, md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem), " +
      "R AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM H), " +
      s"K AS (SELECT g, max(h) AS kth, count(*) AS k_actual FROM R WHERE rk <= $k GROUP BY g), " +
      s"V AS (SELECT g, k_actual, (${graft.ops.Sketches.hexToLongSql("kth")}) AS v FROM K), " +
      "X AS (SELECT g, count(*) AS exact_distinct FROM H GROUP BY g) " +
      "SELECT v.g AS l_returnflag, CAST(v.k_actual AS BIGINT) AS k_actual, " +
      s"round(CASE WHEN v.k_actual < $k THEN CAST(v.k_actual AS DOUBLE) " +
      s"ELSE ${(k - 1).toDouble} / (CAST(v.v AS DOUBLE) / 4294967296.0) END, 4) AS est_distinct, " +
      "CAST(x.exact_distinct AS BIGINT) AS exact_distinct " +
      "FROM V v JOIN X x ON v.g = x.g ORDER BY l_returnflag"
    },
    // CMS heavy-hitter audit: sketch built from term counts (identical to
    // the occurrence-built sketch), est = min over depth rows
    // integer threshold: DuckDB // is floor division on integers, matching
    // the engine's Long division n/(k+1)
    "sketch_mg_heavy" ->
      (s"WITH T AS (SELECT unnest(string_split($docNorm, ' ')) AS term FROM documents), " +
       "C AS (SELECT term, CAST(count(*) AS BIGINT) AS n_exact FROM T WHERE term <> '' GROUP BY term), " +
       "N AS (SELECT CAST(sum(n_exact) AS BIGINT) AS n FROM C) " +
       s"SELECT term, n_exact FROM C, N WHERE n_exact > n // ${graft.ops.Sketches.MgK + 1} " +
       "ORDER BY n_exact DESC, term"),
    "sketch_cms_topterms" -> {
      import graft.ops.Sketches.{CmsDepth, CmsWidth}
      s"WITH WD AS (SELECT unnest(string_split($docNorm, ' ')) AS term FROM documents), " +
      "TC AS (SELECT term, CAST(count(*) AS BIGINT) AS n_exact FROM WD WHERE term <> '' GROUP BY term), " +
      s"E AS (SELECT term, n_exact, unnest(range($CmsDepth)) AS d FROM TC), " +
      "M AS (SELECT term, n_exact, d, md5(CAST(d AS VARCHAR) || '|' || term) AS m FROM E), " +
      s"B AS (SELECT term, n_exact, d, (${graft.ops.Sketches.hexToLongSql("m")}) % $CmsWidth AS bucket FROM M), " +
      "SK AS (SELECT d, bucket, CAST(sum(n_exact) AS BIGINT) AS bcnt FROM B GROUP BY d, bucket), " +
      "TOP AS (SELECT term FROM TC ORDER BY n_exact DESC, term LIMIT 20), " +
      "J AS (SELECT b.term, b.n_exact, min(s.bcnt) AS n_est FROM B b " +
      "SEMI JOIN TOP USING (term) " +
      "JOIN SK s ON b.d = s.d AND b.bucket = s.bucket GROUP BY b.term, b.n_exact) " +
      "SELECT term, n_exact, CAST(n_est AS BIGINT) AS n_est, " +
      "CAST(n_est - n_exact AS BIGINT) AS overcount FROM J ORDER BY n_exact DESC, term"
    },
    // sequence packing: md5-bucket shard (same instr arithmetic as
    // sample_split), per-(lang,shard) prefix sums, floor/mod slotting
    "pack_sequences" -> {
      val b = graft.ops.Packing.SeqTokens
      val sh = graft.ops.Packing.Shards
      s"WITH H AS (SELECT doc_id, lang, md5(concat('pack|', CAST(doc_id AS VARCHAR))) AS h, " +
      s"CAST(len(string_split($docNorm, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
      "T AS (SELECT doc_id, lang, n_tokens, ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
      s"instr('0123456789abcdef', substr(h, 2, 1)) - 1) % $sh AS shard FROM H), " +
      "C AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM T) " +
      "SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens, " +
      s"CAST(floor(cum_before / $b.0) AS BIGINT) AS seq_id, " +
      s"CAST(cum_before % $b AS BIGINT) AS seq_offset FROM C ORDER BY doc_id"
    },
    "pack_stats" -> {
      val b = graft.ops.Packing.SeqTokens
      val sh = graft.ops.Packing.Shards
      s"WITH H AS (SELECT doc_id, lang, md5(concat('pack|', CAST(doc_id AS VARCHAR))) AS h, " +
      s"CAST(len(string_split($docNorm, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
      "T AS (SELECT doc_id, lang, n_tokens, ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
      s"instr('0123456789abcdef', substr(h, 2, 1)) - 1) % $sh AS shard FROM H), " +
      "G AS (SELECT lang, CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, " +
      s"CAST(ceil(sum(n_tokens) / $b.0) AS BIGINT) AS n_sequences FROM T GROUP BY lang, shard) " +
      s"SELECT lang, shard, n_docs, total_tokens, n_sequences, " +
      s"CAST(n_sequences * $b - total_tokens AS BIGINT) AS pad_tokens FROM G ORDER BY lang, shard"
    },
    // BM25: tf per query term from the normalized word list, corpus stats
    // in one row, Lucene-form idf; round(…,4) + doc_id tie-break makes the
    // ln/division ulp-stable across engines
    "bpe_merges" -> bpeOracleSql,
    "bpe_encode" -> bpeEncodeOracleSql,
    "bm25_search" -> bm25OracleSql,
    "bm25_phrase" -> phraseOracleSql,
    "bm25_phrase_indexed" -> phraseOracleSql,
    "bm25_phrase_query" -> phraseOracleSql,
    "stream_phrase_ingest" -> phraseOracleSql,
    "bm25_phrase_batch" -> phraseBatchOracleSql,
    "bm25_phrase_delete" -> phraseOracleSqlFrom("doc_id % 7 <> 3"),
    "bm25_phrase_lifecycle" -> phraseOracleSqlFrom("doc_id % 7 <> 3"),
    "bm25_proximity" -> proximityOracleSql,
    // the index-backed variant must reproduce the scan-time result
    // row-for-row — same oracle, so any drift between the two paths fails
    "bm25_indexed" -> bm25OracleSql,
    "bm25_query" -> bm25OracleSql,
    // batch form: per-query Okapi chains with term-sorted score folds
    "bm25_search_batch" -> bm25BatchOracleSql,
    // per-term posting-list skew: df distribution + max/avg imbalance,
    // recomputed from the corpus (postings = distinct (term, doc) pairs)
    "bm25_index_stats" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "T AS (SELECT DISTINCT doc_id, term FROM (SELECT doc_id, unnest(w) AS term FROM W)), " +
       "DF AS (SELECT term, count(*) AS df FROM T GROUP BY term) " +
       "SELECT CAST(count(*) AS BIGINT) AS n_terms, " +
       "CAST(sum(df) AS BIGINT) AS n_postings, " +
       "CAST(min(df) AS BIGINT) AS min_df, " +
       "CAST(max(df) AS BIGINT) AS max_df, " +
       "round(avg(df), 4) AS avg_df, " +
       "round(CAST(max(df) AS DOUBLE) / round(avg(df), 4), 4) AS imbalance " +
       "FROM DF"),
    "phrase_index_stats" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "O AS (SELECT doc_id, unnest(w) AS term FROM W), " +
       "P AS (SELECT term, doc_id, count(*) AS occ FROM O GROUP BY term, doc_id), " +
       "DF AS (SELECT term, count(*) AS df, sum(occ) AS occs, max(occ) AS maxp FROM P GROUP BY term) " +
       "SELECT CAST(count(*) AS BIGINT) AS n_terms, " +
       "CAST(sum(df) AS BIGINT) AS n_postings, " +
       "CAST(sum(occs) AS BIGINT) AS n_occurrences, " +
       "CAST(min(df) AS BIGINT) AS min_df, " +
       "CAST(max(df) AS BIGINT) AS max_df, " +
       "round(avg(df), 4) AS avg_df, " +
       "CAST(max(maxp) AS BIGINT) AS max_positions, " +
       "round(CAST(max(df) AS DOUBLE) / round(avg(df), 4), 4) AS imbalance " +
       "FROM DF"),
    // delta-maintained index must converge to the full-corpus result
    "bm25_index_delta" -> bm25OracleSql,
    // tombstone deletion: the same chain over the SURVIVING corpus —
    // df, n_docs, avgdl all recomputed without the victims
    "bm25_index_delete" -> bm25OracleSqlFrom("doc_id % 7 <> 3"),
    // compaction advice: dead postings fraction over the same distinct
    // (doc_id, term) posting set the stats oracle derives
    "bm25_compaction_advice" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "T AS (SELECT DISTINCT doc_id, term FROM (SELECT doc_id, unnest(w) AS term FROM W)), " +
       "A AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
       "CAST(sum(CASE WHEN doc_id % 7 = 3 OR doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dead FROM T) " +
       "SELECT n_rows, n_dead, " +
       "round(CAST(n_dead AS DOUBLE) / n_rows, 4) AS dead_frac, " +
       s"CASE WHEN CAST(n_dead AS DOUBLE) / n_rows >= $CompactThreshold " +
       "THEN 'compact' ELSE 'keep' END AS action FROM A"),
    // a drained delete stream (with overlapping redelivery) converges to
    // the batch delete's rebuild-without-victims scores
    "stream_index_delete" -> bm25OracleSqlFrom("doc_id % 7 <> 3"),
    // the full-CRUD capstone: every doc ingested (base + delta), victims
    // deleted, compacted — the surviving corpus is the same set
    "bm25_index_lifecycle" -> bm25OracleSqlFrom("doc_id % 7 <> 3"),
    // compaction is layout-only: the compacted index must STILL equal the
    // full-corpus scan-time result row-for-row
    "bm25_index_compact" -> bm25OracleSql,
    // a drained ingest stream must converge to the same full-corpus result
    "stream_index_ingest" -> bm25OracleSql,
    "search_hybrid_dense" -> hybridDenseOracle(ann = false),
    "search_hybrid_dense_ann" -> hybridDenseOracle(ann = true),
    "search_hybrid_batch" -> hybridBatchOracleSql,
    // hybrid RRF: same BM25 CTE chain + a tf-idf scorer off the same D/S,
    // both cut to top-k, ranks fused as 1/(60+r) — double-cast divisions
    // so DuckDB's decimal literals can't diverge from Spark's doubles
    "search_hybrid_rrf" -> {
      import graft.ops.Search.{K1, B => B25, TopK, QueryTerms, RrfK}
      val tfs = QueryTerms.map(t =>
        s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf_$t").mkString(", ")
      val dfs = QueryTerms.map(t =>
        s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(", ")
      val bmParts = QueryTerms.map(t =>
        s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1) * (tf_$t * ${K1 + 1}) / " +
        s"(tf_$t + $K1 * (${1 - B25} + $B25 * dl / avgdl))").mkString(" + ")
      val vsmParts = QueryTerms.map(t =>
        s"CASE WHEN df_$t > 0 THEN tf_$t * ln(n_docs / df_$t) ELSE 0.0 END")
        .mkString(" + ")
      s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
      s"D AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, $tfs FROM W), " +
      s"S AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl, $dfs FROM D), " +
      s"X AS (SELECT doc_id, round($bmParts, 4) AS s_bm25, round($vsmParts, 4) AS s_vsm " +
      "FROM D CROSS JOIN S), " +
      s"BM AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY s_bm25 DESC, doc_id) AS INT) AS r_bm25 " +
      s"FROM (SELECT doc_id, s_bm25 FROM X WHERE s_bm25 > 0 ORDER BY s_bm25 DESC, doc_id LIMIT $TopK)), " +
      s"VR AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY s_vsm DESC, doc_id) AS INT) AS r_vsm " +
      s"FROM (SELECT doc_id, s_vsm FROM X WHERE s_vsm > 0 ORDER BY s_vsm DESC, doc_id LIMIT $TopK)) " +
      "SELECT coalesce(b.doc_id, v.doc_id) AS doc_id, b.r_bm25, v.r_vsm, " +
      s"round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + b.r_bm25), 0) + " +
      s"coalesce(CAST(1 AS DOUBLE) / ($RrfK + v.r_vsm), 0), 6) AS rrf " +
      "FROM BM b FULL OUTER JOIN VR v ON b.doc_id = v.doc_id " +
      "ORDER BY rrf DESC, doc_id"
    },
    // keywords: full-vocab tf-idf with min-df pruning; rank on the
    // rounded score with term tie-break (same ulp discipline as bm25)
    "text_keywords" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "T AS (SELECT doc_id, unnest(w) AS term FROM W), " +
       "TF AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM T GROUP BY doc_id, term), " +
       "N AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents), " +
       "DF AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM TF GROUP BY term HAVING count(*) >= 2), " +
       "S AS (SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n_docs / d.df), 4) AS tfidf " +
       "FROM TF tf JOIN DF d USING (term) CROSS JOIN N n), " +
       "R AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank " +
       "FROM S WHERE tfidf > 0) " +
       "SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf FROM R WHERE rank <= 3 " +
       "ORDER BY doc_id, rank"),
    // bigram LM: successor pairs via ranged indexing, MLE ratios of exact
    // counts, per-bigram logprob quantized to bigint before the doc sum
    "text_lm_score" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "AB AS (SELECT doc_id, w[i + 1] AS a, w[i + 2] AS b FROM " +
       "(SELECT doc_id, w, unnest(range(len(w) - 1)) AS i FROM W WHERE len(w) >= 2)), " +
       "CAB AS (SELECT a, b, count(*) AS c_ab FROM AB GROUP BY a, b), " +
       "CA AS (SELECT a, count(*) AS c_a FROM AB GROUP BY a), " +
       "LP AS (SELECT cab.a, cab.b, CAST(round(ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp6 " +
       "FROM CAB cab JOIN CA USING (a)) " +
       "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
       "round(CAST(sum(lp6) AS DOUBLE) / (1000000.0 * count(*)), 4) AS mean_logprob " +
       "FROM AB JOIN LP USING (a, b) GROUP BY doc_id ORDER BY doc_id"),
    // funnel: the same shrinking first-after chain; frac = n/total
    "w8_funnel" ->
      ("WITH V AS (SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id), " +
       "C AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN V USING (user_id) " +
       "WHERE e.event_type = 'click' AND e.ts > V.t_view AND e.ts <= V.t_view + INTERVAL 1 DAY GROUP BY e.user_id), " +
       "P AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN C USING (user_id) " +
       "WHERE e.event_type = 'purchase' AND e.ts > C.t_click AND e.ts <= C.t_click + INTERVAL 1 DAY GROUP BY e.user_id), " +
       "U AS (SELECT DISTINCT user_id FROM events), " +
       "S AS (SELECT u.user_id, CASE WHEN p.user_id IS NOT NULL THEN '3_purchase' " +
       "WHEN c.user_id IS NOT NULL THEN '2_click' WHEN v.user_id IS NOT NULL THEN '1_view' " +
       "ELSE '0_none' END AS stage FROM U u LEFT JOIN V v ON u.user_id = v.user_id " +
       "LEFT JOIN C c ON u.user_id = c.user_id LEFT JOIN P p ON u.user_id = p.user_id) " +
       "SELECT stage, CAST(count(*) AS BIGINT) AS n_users, " +
       "round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM U), 4) AS frac " +
       "FROM S GROUP BY stage ORDER BY stage"),
    // retention: distinct (user, day) joined to per-user first day
    "w9_retention" ->
      ("WITH F AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id), " +
       "A AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) " +
       "SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day, " +
       "CAST(a.day - f.cohort_day AS INT) AS day_offset, CAST(count(*) AS BIGINT) AS n_users " +
       "FROM A a JOIN F f USING (user_id) GROUP BY f.cohort_day, a.day - f.cohort_day " +
       "ORDER BY cohort_day, day_offset"),
    // incremental SCD2 apply: the engine builds to a cutoff then folds
    // the rest as a delta — the oracle is the FULL REBUILD, verbatim
    // scd2_priority SQL (row-identity is the whole claim)
    "scd2_apply" ->
      ("WITH DAILY AS (SELECT o_custkey, o_orderdate AS valid_from, o_orderpriority AS priority " +
       "FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn " +
       "FROM orders) WHERE rn = 1), " +
       "R AS (SELECT *, lag(priority) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS prev FROM DAILY), " +
       "F AS (SELECT o_custkey, valid_from, priority FROM R WHERE prev IS NULL OR prev <> priority), " +
       "V AS (SELECT o_custkey, valid_from, priority, " +
       "lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS valid_to, " +
       "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY valid_from) AS BIGINT) AS version FROM F) " +
       "SELECT o_custkey, version, valid_from, valid_to, priority, (valid_to IS NULL) AS is_current " +
       "FROM V ORDER BY o_custkey, version"),
    // streaming SCD2: drained dimension == the full rebuild, verbatim
    "stream_scd2_apply" ->
      ("WITH DAILY AS (SELECT o_custkey, o_orderdate AS valid_from, o_orderpriority AS priority " +
       "FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn " +
       "FROM orders) WHERE rn = 1), " +
       "R AS (SELECT *, lag(priority) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS prev FROM DAILY), " +
       "F AS (SELECT o_custkey, valid_from, priority FROM R WHERE prev IS NULL OR prev <> priority), " +
       "V AS (SELECT o_custkey, valid_from, priority, " +
       "lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS valid_to, " +
       "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY valid_from) AS BIGINT) AS version FROM F) " +
       "SELECT o_custkey, version, valid_from, valid_to, priority, (valid_to IS NULL) AS is_current " +
       "FROM V ORDER BY o_custkey, version"),
    // SCD2: dedup-within-day by max orderkey, run-starts via lag, close
    // versions via lead — same three-window chain as the Spark side
    "scd2_priority" ->
      ("WITH DAILY AS (SELECT o_custkey, o_orderdate AS valid_from, o_orderpriority AS priority " +
       "FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn " +
       "FROM orders) WHERE rn = 1), " +
       "R AS (SELECT *, lag(priority) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS prev FROM DAILY), " +
       "F AS (SELECT o_custkey, valid_from, priority FROM R WHERE prev IS NULL OR prev <> priority), " +
       "V AS (SELECT o_custkey, valid_from, priority, " +
       "lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS valid_to, " +
       "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY valid_from) AS BIGINT) AS version FROM F) " +
       "SELECT o_custkey, version, valid_from, valid_to, priority, (valid_to IS NULL) AS is_current " +
       "FROM V ORDER BY o_custkey, version"),
    // point-in-time lookup: same V chain, probes = last order minus one
    // day, interval containment with the null-open tail
    "scd2_asof_lookup" ->
      ("WITH DAILY AS (SELECT o_custkey, o_orderdate AS valid_from, o_orderpriority AS priority " +
       "FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn " +
       "FROM orders) WHERE rn = 1), " +
       "R AS (SELECT *, lag(priority) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS prev FROM DAILY), " +
       "F AS (SELECT o_custkey, valid_from, priority FROM R WHERE prev IS NULL OR prev <> priority), " +
       "V AS (SELECT o_custkey, valid_from, priority, " +
       "lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS valid_to, " +
       "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY valid_from) AS BIGINT) AS version FROM F), " +
       "P AS (SELECT o_custkey AS p_custkey, max(o_orderdate) - INTERVAL 1 DAY AS probe_ts " +
       "FROM orders GROUP BY o_custkey) " +
       "SELECT p.p_custkey AS o_custkey, p.probe_ts, v.version, v.priority, " +
       "(v.valid_to IS NULL) AS is_current FROM P p JOIN V v ON p.p_custkey = v.o_custkey " +
       "AND v.valid_from <= p.probe_ts AND (v.valid_to IS NULL OR v.valid_to > p.probe_ts) " +
       "ORDER BY o_custkey"),
    // equi-depth: ntile semantics match exactly (floor-division bucket
    // sizes, larger buckets first) given the same total order
    // outliers: integer-cents moments, one identically-spelled IEEE
    // expression per engine (no accumulation-order drift)
    "a13_outliers" ->
      ("WITH C AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events), " +
       "S AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(vc) AS BIGINT) AS s1, " +
       "CAST(sum(vc * vc) AS BIGINT) AS s2 FROM C GROUP BY event_type), " +
       "T AS (SELECT event_type, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c, " +
       "CASE WHEN n <= 1 THEN 0.0 ELSE " +
       "sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / " +
       "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) END AS std_c FROM S) " +
       "SELECT c.event_type, t.n, round(t.mean_c / 100.0, 4) AS mean_value, " +
       "round(t.std_c / 100.0, 4) AS std_value, " +
       "CAST(sum(CASE WHEN abs(CAST(c.vc AS DOUBLE) - t.mean_c) > 3.0 * t.std_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
       "FROM C c JOIN T t USING (event_type) " +
       "GROUP BY c.event_type, t.n, t.mean_c, t.std_c ORDER BY c.event_type"),
    "a12_equidepth" ->
      ("WITH B AS (SELECT o_totalprice, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket " +
       "FROM orders) SELECT bucket, min(o_totalprice) AS lo, max(o_totalprice) AS hi, " +
       "CAST(count(*) AS BIGINT) AS n FROM B GROUP BY bucket ORDER BY bucket"),
    // histogram: identical IEEE expression chain for the bucket index —
    // (x-lo)/((hi-lo)/10) floor, clamped — so edges/counts hash-match;
    // the hi = lo CASE pins the zero-width degenerate range to bucket 0
    // on both sides (division by zero diverges between engines otherwise)
    "a11_histogram" ->
      ("WITH E AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders), " +
       "B AS (SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9) END AS INT) AS bucket, lo, hi " +
       "FROM orders CROSS JOIN E) " +
       "SELECT bucket, round(lo + bucket * (hi - lo) / 10, 4) AS lo_edge, " +
       "round(lo + (bucket + 1) * (hi - lo) / 10, 4) AS hi_edge, " +
       "CAST(count(*) AS BIGINT) AS n FROM B GROUP BY bucket, lo, hi ORDER BY bucket"),
    // profiling: one SELECT per column UNION ALLed (DuckDB has no stack);
    // means sum in decimal then divide as double — exact and order-free
    "profile_orders" -> {
      def one(c: String, num: Boolean) =
        s"SELECT '$c' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, " +
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, " +
        s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
        s"CAST(min($c) AS VARCHAR) AS \"min\", CAST(max($c) AS VARCHAR) AS \"max\", " +
        (if (num)
          s"CAST(round(CAST(sum(CAST($c AS DECIMAL(27,4))) AS DOUBLE) / count($c), 4) AS VARCHAR)"
         else "CAST(NULL AS VARCHAR)") +
        " AS mean FROM orders"
      Seq("o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
        "o_totalprice" -> true, "o_orderpriority" -> false)
        .map { case (c, n) => one(c, n) }
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY \"column\"")
    },
    // centroids: replay the quantization (float->double widen, one double
    // multiply, half-away round — bit-identical per element), exact
    // integer sums, then one double division rounded to 6dp
    "sim_centroids" ->
      ("WITH D AS (SELECT label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "Q AS (SELECT label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM D) " +
       "SELECT label, CAST(dim AS INT) AS dim, " +
       "round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) AS centroid, " +
       "count(*) AS n FROM Q GROUP BY label, dim ORDER BY label, dim"),
    // assignment step: same centroid derivation, then exact bigint
    // distances (x_q·10^3 − c·10^6)² summed per (vec, centroid), argmin
    // via row_number with the label tie-break
    "sim_kmeans_assign" ->
      ("WITH Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "Q AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
       "C AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM Q GROUP BY label, dim), " +
       "DIST AS (SELECT x.vec_id, x.label, c.c_label, " +
       "sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM Q x JOIN C c ON x.dim = c.dim GROUP BY x.vec_id, x.label, c.c_label), " +
       "R AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM DIST) " +
       "SELECT vec_id, label, c_label AS assigned, (c_label <> label) AS moved " +
       "FROM R WHERE rk = 1 ORDER BY vec_id"),
    // PQ encode: kmeans CTEs restricted per subspace (dim // 8), argmin
    // per (vec, subspace) over the same exact bigint distances
    "sim_pq_codes" ->
      ("WITH Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "Q AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
       "C AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM Q GROUP BY label, dim), " +
       "DIST AS (SELECT x.vec_id, CAST(x.dim // 8 AS INT) AS sub, c.c_label, " +
       "sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM Q x JOIN C c ON x.dim = c.dim GROUP BY x.vec_id, x.dim // 8, c.c_label), " +
       "R AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, c_label) AS rk FROM DIST) " +
       "SELECT vec_id, sub, c_label AS code FROM R WHERE rk = 1 ORDER BY vec_id, sub"),
    // PQ recall gate: codes chain + per-query ADC lookup table (exact
    // bigint distances), both sides ranked (d2, vec_id), overlap / k
    "sim_pq_recall" ->
      ("WITH Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "Q AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
       "C AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM Q GROUP BY label, dim), " +
       "PDIST AS (SELECT x.vec_id, CAST(x.dim // 8 AS INT) AS sub, c.c_label, " +
       "sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM Q x JOIN C c ON x.dim = c.dim GROUP BY x.vec_id, x.dim // 8, c.c_label), " +
       "PR AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, c_label) AS rk FROM PDIST), " +
       "CODES AS (SELECT vec_id, sub, c_label AS code FROM PR WHERE rk = 1), " +
       "QV AS (SELECT vec_id AS qid, dim, q * 1000 AS qv FROM Q WHERE vec_id < 8), " +
       "EX AS (SELECT v.qid, x.vec_id, sum((v.qv - x.q * 1000) * (v.qv - x.q * 1000)) AS d2 " +
       "FROM QV v JOIN Q x ON v.dim = x.dim AND x.vec_id <> v.qid GROUP BY v.qid, x.vec_id), " +
       "EXR AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
       "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM EX) WHERE rk <= 3), " +
       "LUT AS (SELECT v.qid, CAST(v.dim // 8 AS INT) AS sub, c.c_label AS code, " +
       "sum((v.qv - c.c6) * (v.qv - c.c6)) AS sd2 " +
       "FROM QV v JOIN C c ON v.dim = c.dim GROUP BY v.qid, v.dim // 8, c.c_label), " +
       "ADC AS (SELECT l.qid, cd.vec_id, sum(l.sd2) AS d2 FROM CODES cd " +
       "JOIN LUT l ON l.sub = cd.sub AND l.code = cd.code " +
       "WHERE cd.vec_id <> l.qid GROUP BY l.qid, cd.vec_id), " +
       "ADCR AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
       "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADC) WHERE rk <= 10) " +
       "SELECT e.qid, round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 4) AS recall " +
       "FROM EXR e LEFT JOIN ADCR a ON e.qid = a.qid AND e.vec_id = a.vec_id " +
       "GROUP BY e.qid ORDER BY e.qid"),
    // IVF-PQ: the pq_recall chain with the ADC join additionally
    // restricted to the query's sign-sketch bucket (annBucketCtes)
    "sim_ivfpq_recall" ->
      (s"WITH $annBucketCtes, " +
       "QB AS (SELECT vec_id AS qid, bucket FROM E WHERE vec_id < 8), " +
       "Q0 AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, embedding FROM embeddings), " +
       "Q AS (SELECT vec_id, label, dim, CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM Q0), " +
       "C AS (SELECT label AS c_label, dim, " +
       "CAST(round(round(CAST(sum(q) AS DOUBLE) / (1000.0 * count(*)), 6) * 1000000.0) AS BIGINT) AS c6 " +
       "FROM Q GROUP BY label, dim), " +
       "PDIST AS (SELECT x.vec_id, CAST(x.dim // 8 AS INT) AS sub, c.c_label, " +
       "sum((x.q * 1000 - c.c6) * (x.q * 1000 - c.c6)) AS d2 " +
       "FROM Q x JOIN C c ON x.dim = c.dim GROUP BY x.vec_id, x.dim // 8, c.c_label), " +
       "PR AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, c_label) AS rk FROM PDIST), " +
       "CODES AS (SELECT vec_id, sub, c_label AS code FROM PR WHERE rk = 1), " +
       "QV AS (SELECT vec_id AS qid, dim, q * 1000 AS qv FROM Q WHERE vec_id < 8), " +
       "EX AS (SELECT v.qid, x.vec_id, sum((v.qv - x.q * 1000) * (v.qv - x.q * 1000)) AS d2 " +
       "FROM QV v JOIN Q x ON v.dim = x.dim AND x.vec_id <> v.qid GROUP BY v.qid, x.vec_id), " +
       "EXR AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
       "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM EX) WHERE rk <= 3), " +
       "LUT AS (SELECT v.qid, CAST(v.dim // 8 AS INT) AS sub, c.c_label AS code, " +
       "sum((v.qv - c.c6) * (v.qv - c.c6)) AS sd2 " +
       "FROM QV v JOIN C c ON v.dim = c.dim GROUP BY v.qid, v.dim // 8, c.c_label), " +
       "ADC AS (SELECT l.qid, cd.vec_id, sum(l.sd2) AS d2 FROM CODES cd " +
       "JOIN LUT l ON l.sub = cd.sub AND l.code = cd.code " +
       "JOIN E e ON e.vec_id = cd.vec_id JOIN QB qb ON qb.qid = l.qid AND qb.bucket = e.bucket " +
       "WHERE cd.vec_id <> l.qid GROUP BY l.qid, cd.vec_id), " +
       "ADCR AS (SELECT qid, vec_id FROM (SELECT *, row_number() OVER " +
       "(PARTITION BY qid ORDER BY d2, vec_id) AS rk FROM ADC) WHERE rk <= 10) " +
       "SELECT e.qid, round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 4) AS recall " +
       "FROM EXR e LEFT JOIN ADCR a ON e.qid = a.qid AND e.vec_id = a.vec_id " +
       "GROUP BY e.qid ORDER BY e.qid"),
    // SymSpell join: same deletion-key expansion on both sides, exact
    // levenshtein verify, argmin via (dist, token) row_number
    "fuzzy_join_sym" -> {
      def delKeys(t: String) =
        s"unnest(list_append(list_transform(range(length($t)), " +
        s"i -> substr($t, 1, i) || substr($t, i + 2, length($t))), $t))"
      s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
      "V AS (SELECT DISTINCT unnest(w) AS token FROM W), " +
      "V4 AS (SELECT token FROM V WHERE length(token) >= 4), " +
      s"VK AS (SELECT token, ${delKeys("token")} AS k FROM V4), " +
      "P0 AS (SELECT doc_id, list_filter(w, x -> length(x) >= 4)[1] AS orig FROM W WHERE doc_id % 29 = 0), " +
      "P1 AS (SELECT doc_id, orig, (doc_id // 29) % length(orig) AS pos FROM P0 WHERE orig IS NOT NULL), " +
      "P AS (SELECT doc_id, substr(orig, 1, CAST(pos AS INT)) || substr(orig, CAST(pos AS INT) + 2, length(orig)) AS corrupted FROM P1), " +
      s"PK AS (SELECT doc_id, corrupted, ${delKeys("corrupted")} AS k FROM P), " +
      "C AS (SELECT pk.doc_id, pk.corrupted, vk.token, " +
      "CAST(levenshtein(pk.corrupted, vk.token) AS INT) AS dist " +
      "FROM PK pk JOIN VK vk ON pk.k = vk.k WHERE levenshtein(pk.corrupted, vk.token) <= 1), " +
      "R AS (SELECT *, row_number() OVER (PARTITION BY doc_id, corrupted ORDER BY dist, token) AS rk FROM C) " +
      "SELECT doc_id, corrupted, token AS matched, dist FROM R WHERE rk = 1 ORDER BY doc_id"
    },
    // per-source percentile gate: ratios rounded before quantile_cont so
    // both engines interpolate identical inputs (same pairing as a9)
    "text_quality_gate" ->
      (s"WITH R AS (SELECT doc_id, source, round(CAST(len(list_filter(string_split($docNorm, ' '), " +
       "x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE) / " +
       s"CAST(len(string_split($docNorm, ' ')) AS DOUBLE), 4) AS stop_ratio FROM documents), " +
       "T AS (SELECT source, round(quantile_cont(stop_ratio, 0.25), 4) AS thr FROM R GROUP BY source) " +
       "SELECT r.doc_id, r.source, r.stop_ratio, t.thr FROM R r JOIN T t ON r.source = t.source " +
       "WHERE r.stop_ratio >= t.thr ORDER BY r.doc_id"),
    // the full-distribution form of the gate: per-source percent_rank of
    // the (pre-rounded) ratio; (rank-1)/(n-1) tie semantics match Spark
    "text_quality_rank" ->
      (s"WITH R AS (SELECT doc_id, source, round(CAST(len(list_filter(string_split($docNorm, ' '), " +
       "x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE) / " +
       s"CAST(len(string_split($docNorm, ' ')) AS DOUBLE), 4) AS stopword_ratio FROM documents) " +
       "SELECT doc_id, source, stopword_ratio, " +
       "round(percent_rank() OVER (PARTITION BY source ORDER BY stopword_ratio), 4) AS q_rank " +
       "FROM R ORDER BY doc_id"),
    // snapshot diff/apply: the old/new snapshot derivations are part of
    // the contract (11th absent-in-old, 13th perturbed-in-old, 17th
    // deleted-in-new) — replayed here verbatim
    "snapshot_diff" ->
      (s"WITH OLD AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 " +
       s"THEN md5('old|' || $docNorm) ELSE md5($docNorm) END AS old_fp " +
       "FROM documents WHERE doc_id % 11 <> 0), " +
       s"NEW AS (SELECT doc_id, md5($docNorm) AS new_fp FROM documents WHERE doc_id % 17 <> 0), " +
       "D AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_fp, n.new_fp, " +
       "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
       "WHEN o.old_fp <> n.new_fp THEN 'changed' END AS change " +
       "FROM OLD o FULL OUTER JOIN NEW n ON o.doc_id = n.doc_id) " +
       "SELECT doc_id, change, old_fp, new_fp FROM D WHERE change IS NOT NULL ORDER BY doc_id"),
    // apply rolls old forward through the changelog; the result must be
    // row-identical to the new snapshot — the oracle replays the
    // anti-join + union rather than shortcutting to NEW, proving the
    // changelog plumbing (not just the end state)
    "snapshot_apply" ->
      (s"WITH OLD AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 " +
       s"THEN md5('old|' || $docNorm) ELSE md5($docNorm) END AS fp " +
       "FROM documents WHERE doc_id % 11 <> 0), " +
       s"NEW AS (SELECT doc_id, md5($docNorm) AS fp FROM documents WHERE doc_id % 17 <> 0), " +
       "D AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.fp AS old_fp, n.fp AS new_fp, " +
       "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
       "WHEN o.fp <> n.fp THEN 'changed' END AS change " +
       "FROM OLD o FULL OUTER JOIN NEW n ON o.doc_id = n.doc_id), " +
       "C AS (SELECT * FROM D WHERE change IS NOT NULL) " +
       "SELECT doc_id, fp FROM OLD WHERE doc_id NOT IN " +
       "(SELECT doc_id FROM C WHERE change IN ('removed', 'changed')) " +
       "UNION ALL SELECT doc_id, new_fp AS fp FROM C WHERE change IN ('added', 'changed') " +
       "ORDER BY doc_id"),
  )
}
