package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Oracle-side shared CTE/SQL builders, split verbatim from SparkEntry
  * (round 17). Each builder mirrors its Spark-side operator expression-for-
  * expression — see the scaladoc on the individual members. */
object OracleCtes {
  import EntryFixtures._
  /** Shared document-shingling CTEs (DuckDB lists are 1-based, Spark SQL
    * arrays 0-based — the index arithmetic differs accordingly but the
    * shingle strings are identical). */
  val docNorm =
    "regexp_replace(lower(trim(text)), '[ \\t\\n\\f\\r]+', ' ', 'g')"
  val shingleCtes: String =
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
  val simhashCtes: String =
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
  val substrGramCte: String = {
    val k = graft.ops.Dedup.SubstrK
    s"W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
    s"G AS (SELECT doc_id, array_to_string(w[i + 1:i + $k], ' ') AS gram " +
    s"FROM (SELECT doc_id, w, unnest(range(len(w) - ${k - 1})) AS i FROM W WHERE len(w) >= $k))"
  }

  val eventWindowsSql: String =
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, " +
    "event_type, count(*) AS n, " +
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
    "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"

  val embCtes: String =
    "E AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
  def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Shared sign-sketch bucket CTEs (E0 = vectors, E = vectors + bucket);
    * mirrors Similarity.bucketCol's md5-derived hyperplanes bit-for-bit. */
  val annBucketCtes: String =
    "E0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
    "E AS (SELECT vec_id, v, array_to_string(list_transform(range(6), p -> " +
    "CASE WHEN list_sum(list_transform(range(64), d -> v[d+1] * " +
    "(CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1 " +
    "THEN 1.0 ELSE -1.0 END))) > 0 THEN '1' ELSE '0' END), '') AS bucket FROM E0)"

  /** Multi-probe probe set: the query's own bucket plus every Hamming-1
    * flip (mirrors Similarity.annMultiProbeTopK's probe expansion). */
  val annMultiProbeQCte: String =
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
  def ivfTrainedCtesFrom(basePred: String): String =
    ivfTrainedCtesFrom(basePred, 2)

  def ivfTrainedCtesFrom(basePred: String, nprobe: Int): String =
    ivfTrainedCtesFrom(basePred, nprobe, "TRUE")

  /** `basePred` restricts which vectors TRAIN the centroids (frozen-
    * quantizer delta rows); `candPred` restricts which vectors may be
    * CANDIDATES (the tombstone-deletion row: trained on everything,
    * deleted ids excluded from results only). */
  def ivfTrainedCtesFrom(basePred: String, nprobe: Int,
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

  val ivfTrainedCtes: String = ivfTrainedCtesFrom("TRUE")

  /** Full IVF-PQ oracle chain: the trained-IVF CTEs (with `basePred`
    * restricting which vectors train the coarse centroids AND the PQ
    * codebook — both derive from the same C) + per-subspace codes, the
    * per-query ADC lookup table, probed-cell-restricted ADC scoring,
    * the (d2, vec_id) shortlist cut, and the exact-cosine rescore. */
  def ivfPqSqlFrom(basePred: String): String =
    s"WITH ${ivfPqChain(basePred, 2)} " + annTopkSelect

  /** The oracle chains resolve their SL cut through the engine's OWN
    * sentinel rule — one derivation site for both sides. */
  def slShortlist(nprobe: Int, shortlist: Int): Int =
    graft.ops.Similarity.resolveShortlist(shortlist, nprobe)

  /** The CTE list only (everything after WITH, ending with RR — the
    * rescored ranked candidates), parameterized by nprobe and the ADC
    * shortlist (default = the entry points' derived ShortlistPerProbe ×
    * nprobe rule) so the sweep row can reuse the identical chain per
    * probe width. */
  def ivfPqChain(basePred: String, nprobe: Int,
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
  lazy val fusedSelectivitySweepSql: String = {
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
  val annTopkSelect: String =
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
  def ivfPqResidualSqlFrom(basePred: String): String =
    s"WITH ${ivfPqResidualChain(basePred, 2)} " + annTopkSelect

  def ivfPqResidualChain(basePred: String, nprobe: Int,
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
  def ivfSqSqlFrom(basePred: String): String =
    s"WITH ${ivfSqChain(basePred, 2)} " + annTopkSelect

  def ivfSqChain(basePred: String, nprobe: Int,
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
  val NprobeTarget = 0.7

  /** The compaction-advice dead-fraction threshold — same sharing rule. */
  val CompactThreshold = 0.2

  def nprobeSweepSql: String = {
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

  /** The two-knob grid wrapped with the pick rule — same grid, same
    * lexicographic (shortlist, nprobe) cost order, same target as the
    * engine ([[NprobeTarget]] interpolated, never restated). Mirrors
    * [[graft.ops.Similarity.annParamSweep]] + paramPick: base branches =
    * the nprobe sweep at slpp 5; escalation branches = slpp 10/20/40 at
    * the widest probe (nprobe 8) per rung. */
  def nprobeAutotuneSql: String = {
    val slpp = graft.ops.Similarity.ShortlistPerProbe
    val bfCtes =
      "QB AS (SELECT vec_id AS qid, v AS qv FROM E0 WHERE vec_id < 8), " +
      s"JB AS (SELECT QB.qid, E0.vec_id, round(${cosSql("E0.v", "QB.qv")}, 6) AS cos " +
      "FROM E0 CROSS JOIN QB WHERE E0.vec_id <> QB.qid), " +
      "RB AS (SELECT qid, vec_id, row_number() OVER " +
      "(PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM JB), " +
      "BF AS (SELECT qid, vec_id FROM RB WHERE rank <= 3)"
    def branch(rung: String, np: Int, s: Int, chain: String): String =
      s"SELECT '$rung' AS rung, $np AS nprobe, $s AS shortlist_per_probe, " +
      s"recall FROM (WITH $chain, " +
      "TOPK AS (SELECT qid, vec_id FROM RR WHERE rank <= 3), " +
      s"$bfCtes " +
      "SELECT round(CAST(count(t.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS recall " +
      "FROM BF b LEFT JOIN TOPK t ON t.qid = b.qid AND t.vec_id = b.vec_id)"
    def chains(np: Int, shortlist: Int): Seq[(String, String)] = Seq(
      "pq" -> ivfPqChain("TRUE", np, shortlist),
      "residual" -> ivfPqResidualChain("TRUE", np, shortlist),
      "sq8" -> ivfSqChain("TRUE", np, shortlist))
    val base = for (np <- Seq(1, 2, 4, 8); (rung, chain) <- chains(np, -1))
      yield branch(rung, np, slpp, chain)
    val esc = for (m <- Seq(2, 4, 8);
        (rung, chain) <- chains(8, slpp * m * 8))
      yield branch(rung, 8, slpp * m, chain)
    val body = (base ++ esc).mkString(" UNION ALL ")
    s"WITH S AS ($body), " +
    "P AS (SELECT rung, coalesce(" +
    s"min(CASE WHEN recall >= $NprobeTarget " +
    "THEN shortlist_per_probe * 100000 + nprobe END), " +
    "max(shortlist_per_probe * 100000 + nprobe)) AS pick FROM S GROUP BY rung) " +
    "SELECT s.rung, s.nprobe, s.shortlist_per_probe, s.recall, " +
    s"s.recall >= $NprobeTarget AS met " +
    "FROM S s JOIN P p ON s.rung = p.rung " +
    "AND s.shortlist_per_probe * 100000 + s.nprobe = p.pick " +
    "ORDER BY s.rung"
  }

  val chainBlock = graft.graph.GraphOps.ChainBlock

  /** BPE merge-chain oracle: the same iteration unrolled as CTE blocks —
    * T0 = char-split word histogram (double-space separator invariant,
    * see ops/Bpe.scala), then per step k: pair counts from T(k-1), the
    * (cnt DESC, l, r) argmax as B(k), and T(k) = the boundary-anchored
    * replace. Result = B1..Bn. */
  def bpeChainBlocks(steps: Int): Seq[String] = bpeChainBlocksFrom(steps, "TRUE")

  /** The merge chain trained on a PREDICATE-restricted corpus slice —
    * the frozen-tokenizer rows train on 80% and apply to the rest. */
  def bpeChainBlocksFrom(steps: Int, basePred: String): Seq[String] =
    Seq(
      s"W AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM " +
        s"(SELECT unnest(string_split($docNorm, ' ')) AS word FROM documents WHERE $basePred) " +
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

  val bpeOracleSql: String = {
    val steps = graft.ops.Bpe.Steps
    "WITH " + bpeChainBlocks(steps).mkString(", ") +
      " SELECT CAST(step AS INT) AS step, l, r, cnt FROM (" +
      (1 to steps).map(k => s"SELECT * FROM B$k").mkString(" UNION ALL ") +
      ") ORDER BY step"
  }

  /** Batched-BPE oracle: per round — pair counts from the running state,
    * the top-4m candidate prefix ranked (cnt DESC, l, r), the
    * conflict-free survivors (NO shared token with any higher-ranked
    * candidate — the engine's non-greedy rule verbatim), and the first m
    * survivors applied in rank order as m unrolled null-tolerant LEFT
    * JOIN replaces (a missing seq-j survivor is a no-op round step, the
    * dried-corpus posture). State CTEs are MATERIALIZED: every SEL feeds
    * m replaces plus the final union, and inlining would re-derive the
    * pair aggregate per reference. */
  val bpeBatchedOracleSql: String = {
    val rounds = graft.ops.Bpe.BatchRounds
    val m = graft.ops.Bpe.BatchM
    val poolK = 4 * m
    def pairSql(prev: String): String =
      s"SELECT tk[i + 1] AS l, tk[i + 2] AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM " +
        s"(SELECT freq, string_split(trim(s), '  ') AS tk, " +
        s"unnest(range(len(string_split(trim(s), '  ')) - 1)) AS i FROM $prev) GROUP BY l, r"
    val blocks = (1 to rounds).flatMap { k =>
      val prev = if (k == 1) "T0" else s"TT${k - 1}_$m"
      Seq(
        s"P$k AS (${pairSql(prev)})",
        s"C$k AS MATERIALIZED (SELECT l, r, cnt, " +
          "row_number() OVER (ORDER BY cnt DESC, l, r) AS rn FROM " +
          s"(SELECT l, r, cnt FROM P$k ORDER BY cnt DESC, l, r LIMIT $poolK))",
        s"SEL$k AS MATERIALIZED (SELECT l, r, cnt, " +
          s"row_number() OVER (ORDER BY rn) AS seq FROM C$k a " +
          s"WHERE NOT EXISTS (SELECT 1 FROM C$k b WHERE b.rn < a.rn AND " +
          "(b.l = a.l OR b.l = a.r OR b.r = a.l OR b.r = a.r)) " +
          s"QUALIFY seq <= $m)") ++
        (1 to m).map { j =>
          val st = if (j == 1) prev else s"TT${k}_${j - 1}"
          s"TT${k}_$j AS MATERIALIZED (SELECT t.word, t.freq, " +
            "CASE WHEN w.l IS NULL THEN t.s ELSE " +
            "replace(t.s, ' ' || w.l || '  ' || w.r || ' ', ' ' || w.l || w.r || ' ') END AS s " +
            s"FROM $st t LEFT JOIN (SELECT l, r FROM SEL$k WHERE seq = $j) w ON TRUE)"
        }
    }
    "WITH " + (bpeChainBlocks(0) ++ blocks).mkString(", ") +
      " SELECT CAST(round AS INT) AS round, CAST(seq AS INT) AS seq, l, r, cnt FROM (" +
      (1 to rounds).map(k => s"SELECT $k AS round, seq, l, r, cnt FROM SEL$k")
        .mkString(" UNION ALL ") +
      ") ORDER BY round, seq"
  }

  /** Encode oracle: the same chain, then per-word token counts from the
    * final state joined back to the document word explosion. */
  val bpeEncodeOracleSql: String = {
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

  /** Frozen-encode oracle: the merge chain trained on the 80% slice
    * (doc_id % 5 <> 0), then the DELTA vocabulary replayed through the
    * frozen winners B1..Bk from characters (merges absent from a word
    * are no-op replaces — total on any vocabulary), then the standard
    * per-doc encode tail over the delta docs. */
  val bpeEncodeFrozenOracleSql: String = {
    val steps = graft.ops.Bpe.Steps
    val replay = (1 to steps).map { k =>
      s"F$k AS (SELECT word, replace(s, ' ' || b.l || '  ' || b.r || ' ', " +
        s"' ' || b.l || b.r || ' ') AS s FROM F${k - 1} CROSS JOIN B$k b)"
    }.mkString(", ")
    "WITH " + bpeChainBlocksFrom(steps, "doc_id % 5 <> 0").mkString(", ") + ", " +
      s"DV AS (SELECT DISTINCT word FROM (SELECT unnest(string_split($docNorm, ' ')) AS word " +
      "FROM documents WHERE doc_id % 5 = 0) WHERE word <> ''), " +
      "F0 AS (SELECT word, ' ' || array_to_string(" +
      "list_transform(range(length(word)), i -> substr(word, CAST(i + 1 AS INT), 1)), '  ') || ' ' AS s FROM DV), " +
      replay + ", " +
      s"V AS (SELECT word, CAST(len(string_split(trim(s), '  ')) AS INT) AS word_tokens, " +
      s"CAST(length(word) AS INT) AS word_chars FROM F$steps), " +
      s"DW AS (SELECT doc_id, unnest(string_split($docNorm, ' ')) AS word FROM documents WHERE doc_id % 5 = 0) " +
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(word_chars) AS BIGINT) AS n_chars, " +
      "CAST(sum(word_tokens) AS BIGINT) AS n_tokens, " +
      "round(CAST(sum(word_chars) AS DOUBLE) / sum(word_tokens), 4) AS compression " +
      "FROM DW JOIN V USING (word) WHERE word <> '' " +
      "GROUP BY doc_id ORDER BY doc_id"
  }

  /** Fertility oracle: the same chain, rolled up per source instead of
    * per doc — tokens/word and chars/token under the final vocab. */
  val bpeFertilityOracleSql: String = {
    val steps = graft.ops.Bpe.Steps
    "WITH " + bpeChainBlocks(steps).mkString(", ") + ", " +
      s"V AS (SELECT word, CAST(len(string_split(trim(s), '  ')) AS INT) AS word_tokens, " +
      s"CAST(length(word) AS INT) AS word_chars FROM T$steps), " +
      s"DW AS (SELECT source, unnest(string_split($docNorm, ' ')) AS word FROM documents) " +
      "SELECT source, CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(word_chars) AS BIGINT) AS n_chars, " +
      "CAST(sum(word_tokens) AS BIGINT) AS n_tokens, " +
      "round(CAST(sum(word_tokens) AS DOUBLE) / count(*), 4) AS fertility, " +
      "round(CAST(sum(word_chars) AS DOUBLE) / sum(word_tokens), 4) AS chars_per_token " +
      "FROM DW JOIN V USING (word) WHERE word <> '' " +
      "GROUP BY source ORDER BY source"
  }

  /** aHash oracle chain — replays the engine's REAL-decode average hash
    * from BMP first principles (the mm_resize discipline): per 8×8 grid
    * position, the NN source pixel's byte offset in the bottom-up
    * md5-cycled pixel data, three hex-byte parses summed to an integer
    * grayscale, then the integer mean threshold (64·g ≥ Σg). Ends with
    * PH(doc_id, width, height, ahash). */
  val mmPhashCtes: String = {
    def hb(e: String) =
      s"((instr('0123456789abcdef', substr(m, 2 * ($e) + 1, 1)) - 1) * 16 + " +
        s"instr('0123456789abcdef', substr(m, 2 * ($e) + 2, 1)) - 1)"
    val offs = (0 until 64).map { k =>
      val x = k % 8; val y = k / 8
      s"(h - 1 - ($y * h) // 8) * rowlen + 3 * (($x * w) // 8) AS o$k"
    }.mkString(", ")
    val grays = (0 until 64).map { k =>
      s"(${hb(s"o$k % 16")} + ${hb(s"(o$k + 1) % 16")} + ${hb(s"(o$k + 2) % 16")}) // 3 AS g$k"
    }.mkString(", ")
    val gsum = (0 until 64).map(k => s"g$k").mkString(" + ")
    val bits = (0 until 64).map(k =>
      s"CASE WHEN 64 * g$k >= gs THEN '1' ELSE '0' END").mkString(", ")
    "I AS (SELECT doc_id, md5(text) AS m, CAST(doc_id % 7 + 1 AS INT) AS w, " +
      "CAST(doc_id % 5 + 1 AS INT) AS h, " +
      "CAST((3 * (doc_id % 7 + 1) + 3) // 4 * 4 AS INT) AS rowlen " +
      "FROM documents WHERE doc_id % 3 = 0), " +
      s"O AS (SELECT doc_id, m, w, h, $offs FROM I), " +
      s"G AS (SELECT doc_id, w, h, $grays FROM O), " +
      s"S2 AS (SELECT *, ($gsum) AS gs FROM G), " +
      s"PH AS (SELECT doc_id, w AS width, h AS height, concat($bits) AS ahash FROM S2)"
  }

  /** 64-position exact hamming between two bit-string columns. */
  def hammingSql(a: String, b: String): String =
    (1 to 64).map(i =>
      s"(CASE WHEN substr($a, $i, 1) <> substr($b, $i, 1) THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** Corpus-capstone shared SQL — the keep chain (quality gate → exact
    * keepers → near-dup drops → KEEP; requires `shingleCtes`' SH/PAIRS in
    * scope) and the split+pack tail over a given id CTE. Shared verbatim
    * by the `corpus_build` and `corpus_curate` oracles so the recipe
    * cannot drift between them. */
  val keepChainCtes: String =
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

  def packTailSql(fromCte: String): String = {
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
  val bm25OracleSql: String = bm25OracleSqlFrom("TRUE")

  /** Phrase oracle — generated from the SAME fixture constants the engine
    * uses ([[graft.ops.Phrase.DefaultPhrase]]/TopK), per the r15 advice
    * (hardcoded oracle literals silently desynchronize from the engine).
    * DuckDB lists are 1-based (`w[i]`, `range` upper-exclusive, so a doc
    * shorter than the phrase yields `range(1, ≤0)` = empty); `hits[1]-1`
    * converts back to the 0-based token offsets the engine reports.
    * Shared verbatim by the scan-time, build+probe, and warm query rows —
    * all three must produce the identical frame. */
  def phraseOracleSql: String = phraseOracleSqlFrom("TRUE")

  /** `docPred` restricts the corpus — the tombstone-deletion and
    * lifecycle rows' oracle is the SAME chain over the surviving
    * documents (no corpus stats in phrase scoring, so the rebuild-
    * without-victims identity is trivially exact). */
  def phraseOracleSqlFrom(docPred: String): String = {
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
  def phraseBatchOracleSql: String = {
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
  def proximityOracleSql: String = {
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
  def bm25OracleSqlFrom(docPred: String): String = {
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
  lazy val fuzzyBatchOracleSql: String = withStudents(
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
  val bm25BatchOracleSql: String = {
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
  lazy val hybridBatchOracleSql: String = {
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
  def hybridDenseOracle(ann: Boolean): String = {
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

}
