package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IndelRatio
import graft.model.Tables
import graft.ops._

/** Text analysis + BPE + corpus diff/report.
  * Rows split verbatim from SparkEntry (round 17); composed back in
  * [[graft.SparkEntry.queries]] / [[graft.SparkEntry.oracleSql]]. */
object TextEntry {
  import EntryFixtures._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // the production-shaped batched train: top-m token-disjoint merges
    // per round (driver jobs grow as rounds = merges/m, the scale path
    // the sequential form's MaxSteps contract names)
    "bpe_merges_batched" -> ((s, d) =>
      Bpe.mergesBatched(Tables.documents(s, d))),
    // encode under the trained vocab: replace chain runs once per
    // DISTINCT word; documents join the vocab-sized encode table
    "bpe_encode" -> ((s, d) => Bpe.encode(Tables.documents(s, d))),
    // per-source tokenizer fertility (tokens/word, chars/token) under the
    // trained vocab — the per-domain compute-cost audit
    "text_fertility" -> ((s, d) => Bpe.fertility(Tables.documents(s, d))),
    // FROZEN-tokenizer encode: merges trained on the 80% slice, applied
    // in training order to the unseen 20% (the deployed-artifact form)
    "bpe_encode_frozen" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Bpe.encodeFrozen(docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0))
    }),
    // per-source lexical diversity: type-token ratio + hapax fraction
    // (the source-level template/boilerplate detector)
    "text_lexical_diversity" -> ((s, d) =>
      TextAnalysis.lexicalDiversity(Tables.documents(s, d))),
    "text_quality" -> ((s, d) => TextAnalysis.quality(Tables.documents(s, d))),
    "text_langid" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    // code-switching detector: per-chunk langid vote -> per-doc majority
    // (doc-level langid averages away embedded foreign passages)
    "text_langid_mixed" -> ((s, d) =>
      TextAnalysis.langIdMixed(Tables.documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),
    // corpus heavy hitters: boilerplate phrases by document frequency
    "text_ngram_topk" -> ((s, d) => TextAnalysis.ngramTopK(Tables.documents(s, d))),
    // PMI collocations: top pairs by pointwise mutual information
    // (scaled-long ln on the vocabulary-sized pair table, exact ties)
    "text_pmi_pairs" -> ((s, d) => TextAnalysis.pmiPairs(Tables.documents(s, d))),
    // per-source OOV rate under the fixed top-1000 corpus vocabulary
    // (one token explode -> (source, word) counts; vocab broadcast back)
    "text_oov_rate" -> ((s, d) => TextAnalysis.oovRate(Tables.documents(s, d))),
    // training-data pipeline: similarity search
  )

  def oracleSql: Map[String, String] = Map(
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
  ) ++ Map(
    "bpe_merges" -> bpeOracleSql,
    "bpe_merges_batched" -> bpeBatchedOracleSql,
    "bpe_encode" -> bpeEncodeOracleSql,
    "text_fertility" -> bpeFertilityOracleSql,
    "bpe_encode_frozen" -> bpeEncodeFrozenOracleSql,
    "text_lexical_diversity" ->
      (s"WITH SW AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt FROM " +
       s"(SELECT source, unnest(string_split($docNorm, ' ')) AS word FROM documents) " +
       "WHERE word <> '' GROUP BY source, word) " +
       "SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens, " +
       "CAST(count(*) AS BIGINT) AS n_types, " +
       "CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, " +
       "round(CAST(count(*) AS DOUBLE) / sum(cnt), 4) AS ttr, " +
       "round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS hapax_frac " +
       "FROM SW GROUP BY source ORDER BY source"),
    // PMI over the bigram table and its margins; DuckDB's zipped
    // multi-unnest pairs the two slice lists positionally
    "text_pmi_pairs" ->
      (s"WITH W AS (SELECT doc_id, string_split($docNorm, ' ') AS w FROM documents), " +
       "BI AS (SELECT unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM W WHERE len(w) >= 2), " +
       "PC AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM BI GROUP BY a, b HAVING count(*) >= 5), " +
       "UNI AS (SELECT t, CAST(count(*) AS BIGINT) AS c_t FROM " +
       "(SELECT a AS t FROM BI UNION ALL SELECT b FROM BI) GROUP BY t), " +
       "NB AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM BI), " +
       "NT AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_tok FROM UNI), " +
       "J AS (SELECT p.a, p.b, p.c_ab, CAST(round(ln(" +
       "(CAST(p.c_ab AS DOUBLE) / n_big) / " +
       "((CAST(ua.c_t AS DOUBLE) / n_tok) * (CAST(ub.c_t AS DOUBLE) / n_tok))) * 1000000.0) AS BIGINT) AS pmi6 " +
       "FROM PC p JOIN UNI ua ON ua.t = p.a JOIN UNI ub ON ub.t = p.b " +
       "CROSS JOIN NB CROSS JOIN NT) " +
       "SELECT a, b, c_ab, round(CAST(pmi6 AS DOUBLE) / 1000000.0, 4) AS pmi " +
       "FROM J ORDER BY pmi6 DESC, a, b LIMIT 20"),
    "text_oov_rate" ->
      (s"WITH SW AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt FROM " +
       s"(SELECT source, unnest(string_split($docNorm, ' ')) AS word FROM documents) " +
       "WHERE word <> '' GROUP BY source, word), " +
       "V AS (SELECT word FROM (SELECT word, sum(cnt) AS tot FROM SW " +
       "GROUP BY word ORDER BY tot DESC, word LIMIT 1000)), " +
       "J AS (SELECT s.source, s.cnt, CASE WHEN v.word IS NULL THEN s.cnt ELSE 0 END AS oov " +
       "FROM SW s LEFT JOIN V v ON v.word = s.word) " +
       "SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens, " +
       "CAST(sum(oov) AS BIGINT) AS n_oov, " +
       "round(CAST(sum(oov) AS DOUBLE) / sum(cnt), 4) AS oov_rate " +
       "FROM J GROUP BY source ORDER BY source"),
  )
}
