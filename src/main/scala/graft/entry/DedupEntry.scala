package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Deduplication family: exact/MinHash-LSH/SimHash/prefix/substring + corpus build (§2.10).
  * Rows split verbatim from SparkEntry (round 17); composed back in
  * [[graft.SparkEntry.queries]] / [[graft.SparkEntry.oracleSql]]. */
object DedupEntry {
  import EntryFixtures._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // CAPSTONE v3 — the RELEASE recipe: curate's chain (keepSet -> span
    // gate) + the two release-only gates a shipped corpus needs — the
    // eval suite itself excluded, and every doc whose benchmark 3-shingle
    // overlap crosses the contamination threshold dropped — applied
    // BEFORE the token budget so quotas reflect the actual releasable
    // corpus; then split + pack. Every stage an already-oracled op.
    "corpus_release" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Dedup.keepSet(docs).select("doc_id")
      val keptDocs = graft.CacheScope.track(
        docs.join(kept, Seq("doc_id"), "left_semi"))
      val lowDup = Dedup.docDupSpans(keptDocs)
        .filter(col("dup_frac") < 0.5).select("doc_id")
      val short = keptDocs
        .filter(size(Dedup.words(col("text"))) < Dedup.SubstrK).select("doc_id")
      val gated = keptDocs.join(lowDup.unionByName(short), Seq("doc_id"), "left_semi")
      val clean = Decontam.overlap(docs)
        .filter(col("contaminated") === 0).select("doc_id")
      // two consumers (the budget aggregation and the admitted semi-join)
      val releasable = graft.CacheScope.track(
        gated.filter(col("source") =!= "src0")
          .join(clean, Seq("doc_id"), "left_semi"))
      val admitted = Sampling.tokenBudget(releasable).select("doc_id")
      val train = Sampling.hashSplit(docs)
        .filter(col("split") === "train").select("doc_id")
      Packing.packSequences(
        releasable.join(admitted, Seq("doc_id"), "left_semi")
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
    // INCREMENTAL component maintenance: the 20% delta folds into the
    // 80% standing assignment through a delta-sized CONTRACTED graph
    // (delta ids + touched component labels — index-index edges can't
    // change, so touched components collapse to their label vertex);
    // affected-components-only relabel. The oracle recomputes components
    // FROM SCRATCH over the whole corpus (the dedup_components literal
    // verbatim) — the hash match re-proves the maintenance identity
    "dedup_components_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.componentsDelta(
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
  )

  /** From-scratch component assignment over the full corpus — shared by
    * the one-shot row and the incremental-maintenance twin (whose
    * hash-match against it proves the contracted-graph identity). */
  private val componentsOracle: String =
    s"WITH RECURSIVE $shingleCtes, " +
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
    "CAST(a = min(b) AS INT) AS is_keeper FROM REACH GROUP BY a ORDER BY doc_id"

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
    // capstone v3: curate's chain to GATED, then the decontam gate (the
    // shared SH shingle view joined back to documents for source) and
    // the src0 exclusion BEFORE a re-derived token budget over the
    // releasable set, then the shared split+pack tail
    "corpus_release" -> {
      val k = graft.ops.Dedup.SubstrK
      s"WITH $shingleCtes, $keepChainCtes, " +
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
      // the decontam gate off the SAME distinct-shingle view (SH)
      "BEN9 AS (SELECT DISTINCT sh FROM SH JOIN documents USING (doc_id) WHERE source = 'src0'), " +
      "COR9 AS (SELECT s.doc_id, s.sh FROM SH s JOIN documents d USING (doc_id) WHERE d.source <> 'src0'), " +
      "CNT9 AS (SELECT doc_id, count(*) AS n_sh FROM COR9 GROUP BY 1), " +
      "HIT9 AS (SELECT doc_id, count(*) AS n_hit FROM COR9 SEMI JOIN BEN9 USING (sh) GROUP BY 1), " +
      "CLEAN AS (SELECT c.doc_id FROM CNT9 c LEFT JOIN HIT9 h ON c.doc_id = h.doc_id " +
      s"WHERE round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(c.n_sh AS DOUBLE), 4) < ${graft.ops.Decontam.ContaminatedFrac}), " +
      "REL0 AS (SELECT g.* FROM GATED g JOIN CLEAN c ON g.doc_id = c.doc_id WHERE g.source <> 'src0'), " +
      // token budget RE-DERIVED over the releasable set
      s"TB9 AS (SELECT doc_id, source, CAST(len(string_split($docNorm, ' ')) AS BIGINT) AS n_tokens FROM REL0), " +
      "SB9 AS (SELECT source, sum(n_tokens) AS src_tokens FROM TB9 GROUP BY source), " +
      "WT9 AS (SELECT DISTINCT source, 64 * (1 + CAST(substr(source, 4) AS INT) % 4) AS keep_below FROM REL0), " +
      "QB9 AS (SELECT s9.source, CAST((w9.keep_below * s9.src_tokens) // 256 AS BIGINT) AS quota " +
      "FROM SB9 s9 JOIN WT9 w9 ON s9.source = w9.source), " +
      "CB9 AS (SELECT t.doc_id, t.source, t.n_tokens, " +
      "sum(t.n_tokens) OVER (PARTITION BY t.source ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens, " +
      "q.quota FROM TB9 t JOIN QB9 q ON t.source = q.source), " +
      "REL AS (SELECT doc_id FROM CB9 WHERE cum_tokens - n_tokens < quota), " +
      packTailSql("REL")
    },
    // Transitive closure of the verified near-dup pairs (UNION-dedup
    // recursion; components are near-dup chains — tiny — so the closure
    // stays small even though reachability is quadratic per component).
    "dedup_components" -> componentsOracle,
    // the incrementally-maintained assignment must equal the from-scratch
    // one EXACTLY — one shared literal, the maintenance-identity proof
    "dedup_components_delta" -> componentsOracle,
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
  )
}
