package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token counting, quality scoring, n-gram-heuristic language ID, and
  * content fingerprinting. All pure `functions._` compositions — one scan,
  * zero shuffles (per-row), fully codegen'd.
  */
object TextAnalysis {

  private def normText: Column = Dedup.normText(col("text"))
  private def w: Column = Dedup.words(col("text"))

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (alnum runs and single non-alnum symbols each count as one token). */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(w).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z0-9]+")).as("word_tokens"),
      // explicit whitespace class — see Dedup.WsClass for the \s caveat
      regexp_count(col("text"), lit("[^A-Za-z0-9 \\t\\n\\f\\r]")).as("symbol_tokens"))
      .orderBy(col("doc_id"))

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  private def hits(list: Seq[String]): Column =
    size(filter(w, x => array_contains(array(list.map(lit): _*), x)))

  /** Rounded stopword ratio of `text` — the per-row quality signal shared
    * by [[qualityGate]]/[[qualityRank]] and [[Sampling.recipe]]'s gate
    * stage (rounded BEFORE any percentile so both engines interpolate
    * identical inputs). */
  private[ops] def stopRatioCol: Column =
    round(hits(stopwords).cast("double") / size(w).cast("double"), 4)

  /** Quality scoring: length, mean token length, stopword ratio,
    * punctuation ratio, and a CASE-based keep/flag label — the standard
    * cheap pre-filters applied before expensive dedup at corpus scale. */
  def quality(docs: DataFrame): DataFrame = {
    val nTok = size(w)
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      nTok.as("n_tokens"),
      round(length(regexp_replace(normText, lit(" "), lit(""))).cast("double") /
        nTok.cast("double"), 4).as("mean_tok_len"),
      round(hits(stopwords).cast("double") / nTok.cast("double"), 4).as("stopword_ratio"),
      round(regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
        length(col("text")).cast("double"), 4).as("punct_ratio"))
      .withColumn("quality",
        when(col("n_tokens") < 5, "too_short")
          .when(col("stopword_ratio") < 0.01, "low_stopword")
          .otherwise("keep"))
      .orderBy(col("doc_id"))
  }

  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "et", "les", "une"),
    "es" -> Seq("el", "y", "los", "una"))

  /** Stopword-hit language ID (n-gram heuristic): argmax of per-language
    * stopword hit counts with a fixed priority order on ties. */
  def langId(docs: DataFrame): DataFrame = {
    val hitCols = langStops.map { case (l, ws) => hits(ws).as(s"${l}_hits") }
    docs.select((col("doc_id") +: col("lang").as("labeled_lang") +: hitCols): _*)
      .withColumn("predicted_lang",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
          .when(col("fr_hits") >= col("es_hits"), "fr")
          .otherwise("es"))
      .orderBy(col("doc_id"))
  }

  /** Per-source quality calibration: each document's stopword-ratio
    * percentile WITHIN its source — the step before any cross-source
    * global quality threshold (a raw ratio cutoff tuned on web prose
    * guts code- or table-heavy sources wholesale; ranks are comparable
    * across sources by construction, the [[qualityGate]] rationale taken
    * from one fixed percentile to the whole distribution).
    *
    * Shape at 100 TB: NOT a source-partitioned window over the corpus
    * (that funnels each source through one reducer — the r18 verdict's
    * Sampling finding, which this op used to share). percent_rank's
    * tie-group semantics depend only on (how many rows rank below the
    * tie group, source size), and the ratio domain is BOUNDED — 4-dp
    * values in [0, 1], ≤ 10⁴ distinct per source — so the rank derives
    * from a map-side-combined (source, ratio) count aggregate, a
    * running sum over that metadata-sized grouped frame (the window is
    * per-source but over ≤ 10⁴ rows per source by construction, never
    * the corpus), and a broadcast join back onto the scan. Identical
    * q_rank values: rank(tie group) = rows below it + 1, percent_rank =
    * (rank−1)/(n−1), 0 for a single-row source (Spark's convention). */
  def qualityRank(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ratio = round(hits(stopwords).cast("double") / size(w).cast("double"), 4)
    // cached: the tokenized ratio projection feeds the rank aggregate AND
    // the final join back — one corpus scan (the lmScore discipline)
    val base = graft.CacheScope.track(docs.select(col("doc_id"),
      col("source"), ratio.as("stopword_ratio")))
    val cw = Window.partitionBy(col("source")).orderBy(col("stopword_ratio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranks = base.groupBy(col("source"), col("stopword_ratio"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cw))
      .withColumn("n", sum(col("cnt")).over(nw))
      .select(col("source"), col("stopword_ratio"),
        (col("cum") - col("cnt") + 1).as("rk"), col("n"))
    base.join(broadcast(ranks), Seq("source", "stopword_ratio"))
      .withColumn("q_rank", round(when(col("n") === 1, lit(0.0))
        .otherwise((col("rk") - 1).cast("double") /
          (col("n") - 1).cast("double")), 4))
      .select(col("doc_id"), col("source"), col("stopword_ratio"),
        col("q_rank"))
      .orderBy(col("doc_id"))
  }

  /** Mixed-language (code-switching) detector: the per-CHUNK form of
    * [[langId]] — each 32-token chunk votes with the same stopword-argmax
    * and fixed tie order, then a per-doc majority: majority language, its
    * chunk share, and a mixed flag when any chunk dissents. Doc-level
    * langid AVERAGES AWAY an embedded foreign passage (the dominant
    * language's stopwords outvote it globally); the chunk vote is the
    * standard cheap detector for exactly that. Scale shape: chunking is
    * the linear per-row transform, the vote is two small groupBys keyed
    * on doc_id — nothing corpus-wide beyond the chunk rows. */
  def langIdMixed(docs: DataFrame): DataFrame = {
    def chHits(wc: Column, list: Seq[String]): Column =
      size(filter(wc, x => array_contains(array(list.map(lit): _*), x)))
    val cw = split(col("chunk"), " ")
    val perChunk = chunks(docs).select(
        col("doc_id"),
        chHits(cw, langStops(0)._2).as("en_hits"),
        chHits(cw, langStops(1)._2).as("de_hits"),
        chHits(cw, langStops(2)._2).as("fr_hits"),
        chHits(cw, langStops(3)._2).as("es_hits"))
      .withColumn("chunk_lang",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("es_hits"), "en")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
          .when(col("fr_hits") >= col("es_hits"), "fr")
          .otherwise("es"))
    perChunk.groupBy(col("doc_id"), col("chunk_lang"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      // majority = max votes, ties to the lexicographically first lang —
      // one min-struct aggregate, no rank window
      .agg(min(struct((-col("n")).as("neg"), col("chunk_lang"))).as("m"),
        sum(col("n")).as("n_chunks"))
      .select(col("doc_id"), col("m.chunk_lang").as("majority_lang"),
        (-col("m.neg")).as("n_majority"), col("n_chunks"))
      .withColumn("majority_frac",
        round(col("n_majority").cast("double") / col("n_chunks").cast("double"), 4))
      .withColumn("is_mixed", (col("n_majority") < col("n_chunks")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Relative quality gate: keep documents at or above their SOURCE's
    * 25th-percentile stopword ratio — the FineWeb/C4-style step where
    * thresholds are per-domain distributions, not global constants (a
    * fixed cutoff tuned on web prose would gut code or table-heavy
    * sources wholesale).
    *
    * Shape at 100 TB: per-row ratios in the scan; the threshold table is
    * one exact percentile per source — |sources| rows from a map-side-
    * partial aggregate — broadcast back over the second scan. Nothing
    * corpus-sized shuffles. Ratios are rounded BEFORE the percentile so
    * the oracle's quantile_cont interpolates bit-identical inputs. */
  def qualityGate(docs: DataFrame): DataFrame = {
    val ratios = docs.select(col("doc_id"), col("source"),
      round(hits(stopwords).cast("double") / size(w).cast("double"), 4)
        .as("stop_ratio"))
    val thr = ratios.groupBy(col("source"))
      .agg(round(expr("percentile(stop_ratio, 0.25)"), 4).as("thr"))
    ratios.join(broadcast(thr), "source")
      .filter(col("stop_ratio") >= col("thr"))
      .select(col("doc_id"), col("source"), col("stop_ratio"), col("thr"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model scoring: train a tiny LM on the corpus itself
    * (bigram MLE: P(b|a) = C(a,b)/C(a·)) and score each document by its
    * mean bigram log-probability — the KenLM-style fluency signal
    * pipelines use to separate prose from token soup. Self-scoring on
    * the training corpus means every bigram is seen (no smoothing
    * needed); an out-of-corpus variant would add backoff.
    *
    * Determinism: each bigram's log-prob quantizes to a scaled long
    * (round(ln·10⁶)) BEFORE the per-doc aggregation, so the sum is exact
    * integer arithmetic — the mean can't depend on float addition order
    * (the repo-wide discipline; see [[graft.ops.Centroids]]).
    *
    * Shape at 100 TB: one bigram explode (linear in tokens), two
    * count-aggregations (bigram table and unigram-context table — both
    * vocabulary-sized after aggregation), a join back on the bigram key,
    * then a per-doc sum. All high-cardinality equi-shuffles. */
  def lmScore(docs: DataFrame): DataFrame = {
    // build (doc, a, b) pairs in ONE explode: zip each word (minus the
    // last) with its successor inside the array, then explode the structs.
    // PERSISTED: three consumers on three different keys (bigram counts,
    // context counts, the per-doc score join) — exchange reuse can't merge
    // them, so without the cache the corpus re-explodes three times (the
    // same persisted-view rationale as ngramJaccard's shingle view;
    // DebugPlan measured FileScan=3 before). Linear in corpus tokens.
    // Tracked in CacheScope: batch drivers unpersist at the query boundary.
    val withWords = graft.CacheScope.track(
      docs.select(col("doc_id"), w.as("words"))
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"), posexplode(expr(
          "transform(slice(words, 1, size(words) - 1), (x, i) -> struct(x AS a, element_at(words, i + 2) AS b))"))
          .as(Seq("i", "ab")))
        .select(col("doc_id"), col("ab.a").as("a"), col("ab.b").as("b")))
    val bigramCounts = withWords.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
    val contextCounts = withWords.groupBy(col("a"))
      .agg(count(lit(1)).as("c_a"))
    val lp = bigramCounts.join(contextCounts, "a")
      .select(col("a"), col("b"),
        round(log(col("c_ab").cast("double") / col("c_a").cast("double")) *
          lit(1000000.0)).cast("long").as("lp6"))
    withWords.join(lp, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp6")).cast("double") / (lit(1000000.0) * count(lit(1))), 4)
          .as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text —
    * the join key for cross-corpus exact dedup. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(normText.cast("binary")).as("fp"),
      substring(md5(normText.cast("binary")), 1, 8).as("fp_short"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ text cleaning

  /** Deterministic markup wrapper for the cleaning gate: the synthetic corpus
    * is already clean (plain lowercase words — a cleaner over it would pass
    * vacuously), so the gate WRAPS each doc in markup + a URL derived from its
    * own columns, then proves [[clean]] recovers the canonical text. Same
    * construction on the oracle side, so the regex semantics — not the
    * fixture — are what's compared. */
  /** Corpus-level heavy hitters: top-k 3-grams by DOCUMENT frequency — the
    * boilerplate-phrase miner (phrases shared verbatim across many docs
    * are template/navigation text, the cross-document complement of
    * [[repetition]]'s within-document signals). Scale shape: shingle
    * explode (distinct per doc, so df = a plain count) → map-side-combined
    * count per gram → TakeOrderedAndProject for the top k. The gram-count
    * shuffle is the only wide stage, keyed by the gram itself (high
    * cardinality, uniform). Deterministic tiebreak on the gram. */
  def ngramTopK(docs: DataFrame, k: Int = 20): DataFrame =
    Dedup.shingles(docs)
      .groupBy(col("sh").as("gram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("gram"))
      .limit(k)

  def withMarkup(docs: DataFrame): DataFrame =
    docs.withColumn("raw", concat(
      lit("<doc id=\""), col("doc_id").cast("string"),
      lit("\" src=\""), col("source"),
      lit("\">  http://"), col("source"), lit(".example.com/"),
      col("doc_id").cast("string"), lit(" \n"),
      col("text"), lit("  <br/>\t</doc>")))

  /** Training-corpus text cleaning: strip markup tags, strip URLs, collapse
    * whitespace, trim. Pure per-row codegen'd regexes — one scan, zero
    * shuffles, and every pattern is in the RE2∩Java subset (explicit
    * whitespace class, no backreferences) so the oracle replays it exactly. */
  def clean(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(c,
      "<[^>]*>", " "),
      "https?://[^ \t\n]+", " "),
      s"${Dedup.WsClass}+", " "))

  // ------------------------------------------------------- repetition signals

  /** Gopher-style per-document repetition signals: duplicate-word fraction
    * (1 − distinct/total), top-word fraction, and top-bigram fraction — the
    * cheap repetition filters run before dedup in a pre-training pipeline
    * (Rae et al. 2021 §A1.1 use the same family over lines/n-grams).
    *
    * Scale shape: explode → two cascaded hash aggregations per signal, both
    * keyed on (doc_id[, gram]) — high-cardinality keys, map-side partial
    * aggregation, no per-doc state beyond the running counts. The flag is
    * computed on the 4-dp rounded fractions (same ulp rationale as
    * [[Decontam.ContaminatedFrac]]). */
  def repetition(docs: DataFrame): DataFrame = {
    val wordStats = docs.select(col("doc_id"), explode(w).as("wd"))
      .groupBy(col("doc_id"), col("wd")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_w"))
    val bigramStats = docs.select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bg"), max(col("c")).as("top_bg"))
    wordStats.join(bigramStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_words").cast("double"), 4).as("dup_word_frac"),
        round(col("top_w").cast("double") /
          col("n_words").cast("double"), 4).as("top_word_frac"),
        round(coalesce(col("top_bg").cast("double") /
          col("n_bg").cast("double"), lit(0.0)), 4).as("top_bigram_frac"))
      .withColumn("repetitive",
        (col("dup_word_frac") >= 0.65 || col("top_bigram_frac") >= 0.15).cast("int"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ sequence chunking

  /** Tokens per training chunk (sequence length of the fixture). */
  val ChunkTokens = 32

  /** Context-window chunking: split every document into consecutive
    * `ChunkTokens`-token chunks (last chunk ragged) — the sequence-length
    * prep step between cleaning and tokenization in a training pipeline.
    * Per-row transform + posexplode: output grows linearly with token
    * count, no shuffle beyond the presentation sort, and chunks
    * concatenate back to the normalized document (spec-certified). */
  def chunks(docs: DataFrame): DataFrame = {
    val k = ChunkTokens
    docs.select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(ceil(size(w) / $k.0) AS INT) - 1), " +
        s"i -> named_struct(" +
        s"'chunk', array_join(slice(w, i * $k + 1, $k), ' '), " +
        s"'n_tokens', size(slice(w, i * $k + 1, $k))))")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        col("col.chunk").as("chunk"), col("col.n_tokens").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Content-defined-chunking cut modulus: boundary after any word whose
    * md5 bucket ≡ 0 (mod this) — expected chunk length = the modulus. */
  val CdcModulus = 64

  /** CONTENT-DEFINED chunking (the FastCDC/Rabin idea at word
    * granularity): a chunk boundary falls after every word whose hash
    * bucket is 0 (mod [[CdcModulus]]), so boundaries depend only on
    * LOCAL content — an edit reshapes at most the chunk it touches and
    * every later chunk hash survives byte-identical (spec-gated), which
    * is what makes CDC the dedup-friendly chunking for evolving corpora
    * (fixed-width [[chunks]] shifts every downstream chunk after any
    * insertion). One scan → per-doc position window (parallel across
    * docs) → per-chunk fold; emits (doc_id, chunk_idx, n_words,
    * chunk_hash) — hashes, not text, so the output stays slim at scale. */
  def chunksCdc(docs: DataFrame, modulus: Int = CdcModulus): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col("doc_id"), posexplode(w).as(Seq("pos", "wd")))
    val flagged = words.withColumn("isb",
      when(pmod(conv(substring(md5(col("wd").cast("binary")), 1, 8), 16, 10)
        .cast("bigint"), lit(modulus.toLong)) === 0, 1L).otherwise(0L))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("chunk_idx", coalesce(sum(col("isb")).over(win), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("wd")))),
            s => s("wd")), " ").cast("binary")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** CHUNK-level exact dedup off the CDC chunk hashes — the synergy
    * content-defined chunking exists for: because boundaries are local,
    * a passage shared between documents lands as the SAME chunk (same
    * hash) in both, so passage-level dedup becomes ONE hash groupBy —
    * no shingle explosion, no pair join (compare
    * [[graft.ops.Dedup.docDupSpans]], which pays the shingle machinery
    * to find spans at arbitrary alignment; CDC trades that generality
    * for a groupBy). Emits each duplicated chunk with its copy count,
    * distinct-doc count, the kept doc (smallest id), and the removable
    * word mass. */
  def cdcChunkDups(docs: DataFrame): DataFrame =
    chunksCdc(docs)
      .groupBy(col("chunk_hash"), col("n_words"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_copies") > 1)
      .withColumn("dup_words", (col("n_copies") - 1) * col("n_words"))
      .orderBy(desc("n_copies"), col("chunk_hash"))

  /** Overlap stride for [[chunksOverlap]]: windows advance 24 tokens, so
    * consecutive 32-token chunks share 8 — the retrieval-embedding prep
    * convention (overlap keeps boundary-spanning facts inside at least
    * one chunk). */
  val ChunkStride = 24

  /** Overlapping sliding-window chunking — the retrieval/embedding prep
    * twin of [[chunks]]: windows of [[ChunkTokens]] tokens every
    * [[ChunkStride]], last window ragged, windows past the last covering
    * start suppressed (a doc of ≤32 tokens is exactly one chunk). Same
    * per-row transform + posexplode shape: linear output, no shuffle
    * beyond the presentation sort. */
  def chunksOverlap(docs: DataFrame): DataFrame = {
    val k = ChunkTokens
    val s = ChunkStride
    docs.select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(greatest(0.0, ceil((size(w) - $k) / $s.0)) AS INT)), " +
        s"i -> named_struct(" +
        s"'chunk', array_join(slice(w, i * $s + 1, $k), ' '), " +
        s"'n_tokens', size(slice(w, i * $s + 1, $k))))")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        col("col.chunk").as("chunk"), col("col.n_tokens").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // ---------------------------------------------------------- PII redaction

  /** PII patterns, all in the RE2∩Java subset (character classes + bounded
    * repetition only — no lookaround, no backreferences) so the oracle
    * replays them byte-identically. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** Deterministic PII wrapper (same fixture rationale as [[withMarkup]]:
    * the synthetic corpus contains no PII, so the gate injects one email,
    * one phone, one IP per doc, all derived from doc_id). */
  def withPii(docs: DataFrame): DataFrame =
    docs.withColumn("raw", concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com"),
      lit(" or call 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1")))

  /** PII scrubbing: count + redact emails, IPv4s, phone-shaped numbers
    * (email before IP before phone — the orders that can't shadow each
    * other), and certify `residual_pii == 0` on the redacted text. Pure
    * per-row codegen'd regexes — one scan, zero shuffles. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val raw = col("raw")
    val redacted = regexp_replace(regexp_replace(regexp_replace(raw,
      lit(EmailRe), lit("<EMAIL>")),
      lit(IpRe), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))
    withPii(docs).select(
      col("doc_id"),
      regexp_count(raw, lit(EmailRe)).as("n_emails"),
      regexp_count(raw, lit(IpRe)).as("n_ips"),
      regexp_count(raw, lit(PhoneRe)).as("n_phones"),
      (regexp_count(redacted, lit(EmailRe)) + regexp_count(redacted, lit(IpRe)) +
        regexp_count(redacted, lit(PhoneRe))).as("residual_pii"),
      md5(redacted.cast("binary")).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  /** The cleaning gate: markup-wrapped docs pushed through [[clean]];
    * `roundtrip_ok` certifies cleaned == whitespace-normalized original. */
  def textClean(docs: DataFrame): DataFrame = {
    val cleaned = clean(col("raw"))
    val normOrig = trim(regexp_replace(col("text"), s"${Dedup.WsClass}+", " "))
    withMarkup(docs).select(
      col("doc_id"),
      length(col("raw")).as("n_raw"),
      length(cleaned).as("n_clean"),
      (cleaned === normOrig).cast("int").as("roundtrip_ok"),
      md5(cleaned.cast("binary")).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  /** Corpus composition report — the dashboard a pipeline owner reads
    * before training: per (source, lang), document and token counts,
    * mean length, the quality keep-rate, the exact-duplicate rate, and
    * language-ID agreement with the recorded label. Composes the same
    * expressions as [[tokens]]/[[quality]]/[[langId]]/[[Dedup.exact]]
    * inline so the whole report is ONE corpus scan, ONE shuffle (the
    * content-hash keeper group) and a |sources|·|langs|-row aggregate —
    * no joins between separately-derived per-doc frames.
    *
    * `dup_rate` counts a doc as duplicate when it is not its exact-hash
    * group's keeper (min doc_id), so groups of n contribute (n−1)/n. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val nTok = size(w)
    val predicted =
      when(hits(langStops(0)._2) >= hits(langStops(1)._2) &&
        hits(langStops(0)._2) >= hits(langStops(2)._2) &&
        hits(langStops(0)._2) >= hits(langStops(3)._2), "en")
        .when(hits(langStops(1)._2) >= hits(langStops(2)._2) &&
          hits(langStops(1)._2) >= hits(langStops(3)._2), "de")
        .when(hits(langStops(2)._2) >= hits(langStops(3)._2), "fr")
        .otherwise("es")
    // keep = the [[quality]] CASE's "keep" branch, on the same rounded ratio
    val keep =
      when(nTok < 5, 0.0)
        .when(round(hits(stopwords).cast("double") / nTok.cast("double"), 4) < 0.01, 0.0)
        .otherwise(1.0)
    val perDoc = docs.select(
      col("doc_id"), col("source"), col("lang"),
      nTok.as("n_tokens"),
      md5(normText.cast("binary")).as("h"),
      predicted.as("plang"),
      keep.as("keep_flag"))
    val keepers = perDoc.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    perDoc.join(keepers, "h")
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col("keep_flag")), 4).as("keep_rate"),
        round(avg(when(col("doc_id") =!= col("keeper"), 1.0).otherwise(0.0)), 4)
          .as("dup_rate"),
        round(avg(when(col("plang") === col("lang"), 1.0).otherwise(0.0)), 4)
          .as("lang_match_rate"))
      .orderBy(col("source"), col("lang"))
  }

  /** Dataset-version DIFF — the audit between two corpus snapshots
    * (dataset versioning: "what changed between v1 and v2 of the
    * training set"): per doc_id, `added` (v2 only), `removed` (v1
    * only), `changed` (both, different content hash), `unchanged`; out
    * comes the 4-row status summary, never the corpus. ONE full-outer
    * equi-join on doc_id comparing md5(text) — each side shuffles once
    * on the id (zero shuffles when both snapshots share a bucketed
    * id layout, [[graft.sources.Layout.writeBucketed]]); the hash
    * column prunes both scans to (doc_id, text).
    *
    * Complements [[Snapshot.diff]]: that produces the PER-DOC changelog
    * (and [[Snapshot.applyChangelog]] rolls a snapshot forward with it);
    * this is the bounded SUMMARY a version audit or CI gate reads —
    * same join shape, 4 rows out instead of a changelog-sized frame. */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("h1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(when(col("h1").isNull, "added")
        .when(col("h2").isNull, "removed")
        .when(col("h1") =!= col("h2"), "changed")
        .otherwise("unchanged").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  /** PMI collocations: top-k adjacent word pairs by pointwise mutual
    * information — the classic corpus-linguistics miner for multiword
    * units ("new york"-style pairs that co-occur far above chance),
    * which a tokenizer/vocab team reads next to [[ngramTopK]]'s raw
    * frequency list (PMI surfaces RARE-but-glued pairs frequency hides).
    *
    * PMI = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) over the bigram table
    * and p(·) over its MARGINS (occurrences in either bigram slot — the
    * contingency-table formulation, so the probabilities share one
    * universe); a `minCount` support floor kills the noisy
    * low-count tail (standard practice — PMI explodes on hapax pairs).
    * The log quantizes to a scaled long on the vocabulary-sized pair
    * table (the [[lmScore]] discipline), so ordering ties are exact.
    *
    * Shape at 100 TB: one bigram explode (linear in tokens), bigram and
    * unigram count aggregates (vocabulary-sized), one join of the two
    * count dims (the totals ride in as broadcast 1-row frames), then a
    * bounded TakeOrderedAndProject. */
  def pmiPairs(docs: DataFrame, k: Int = 20, minCount: Int = 5): DataFrame = {
    val bi = graft.CacheScope.track(
      docs.select(col("doc_id"), w.as("words"))
        .filter(size(col("words")) >= 2)
        .select(explode(expr(
          "transform(slice(words, 1, size(words) - 1), (x, i) -> struct(x AS a, element_at(words, i + 2) AS b))"))
          .as("ab"))
        .select(col("ab.a").as("a"), col("ab.b").as("b")))
    val pairCnt = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = bi.select(col("a").as("t")).unionAll(bi.select(col("b").as("t")))
      .groupBy(col("t")).agg(count(lit(1)).as("c_t"))
    val nBig = bi.agg(count(lit(1)).as("n_big"))
    val nTok = uni.agg(sum(col("c_t")).as("n_tok"))
    pairCnt
      .join(uni.select(col("t").as("a"), col("c_t").as("c_a")), "a")
      .join(uni.select(col("t").as("b"), col("c_t").as("c_b")), "b")
      .crossJoin(broadcast(nBig)).crossJoin(broadcast(nTok))
      .withColumn("pmi6",
        round(log(
          (col("c_ab").cast("double") / col("n_big")) /
          ((col("c_a").cast("double") / col("n_tok")) *
           (col("c_b").cast("double") / col("n_tok")))) * lit(1000000.0))
          .cast("long"))
      .withColumn("pmi", round(col("pmi6").cast("double") / 1000000.0, 4))
      .orderBy(desc("pmi6"), col("a"), col("b"))
      .limit(k)
      .select(col("a"), col("b"), col("c_ab"), col("pmi"))
  }

  /** Lexical-diversity audit per source: type-token ratio and hapax
    * fraction — the template/boilerplate detector at the SOURCE level (a
    * crawl slice full of generated or templated text shows a collapsed
    * TTR and a thin hapax tail long before per-doc repetition flags
    * fire). One (source, word) count fold — map-side combined,
    * vocabulary-sized after aggregation — then a per-source rollup of
    * that table; the corpus is scanned once, nothing else is corpus-
    * sized. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(w).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 4))
      .withColumn("hapax_frac",
        round(col("n_hapax").cast("double") / col("n_types"), 4))
      .orderBy(col("source"))

  /** Out-of-vocabulary rate per source under a FIXED top-`vocabSize`
    * corpus vocabulary — the coverage audit run before freezing a
    * tokenizer/vocab: a source whose tokens fall outside the shared
    * vocab will fragment into subwords (or UNKs) at training time.
    *
    * Shape at 100 TB: ONE token explode folded immediately into a
    * (source, word) count table (map-side combined, vocabulary-sized);
    * both the vocab (top-V by summed count, deterministic word
    * tiebreak, bounded TakeOrdered) and the per-source rates derive
    * from that cached table — the corpus is scanned once. The vocab is
    * broadcast (V rows) back onto the count table, never the tokens. */
  def oovRate(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val sw = graft.CacheScope.track(
      docs.select(col("source"), explode(w).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt")))
    val vocab = sw.groupBy(col("word")).agg(sum(col("cnt")).as("tot"))
      .orderBy(desc("tot"), col("word")).limit(vocabSize)
      .select(col("word"), lit(1).as("inv"))
    sw.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(when(col("inv").isNull, col("cnt")).otherwise(lit(0L)))
          .as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
      .orderBy(col("source"))
  }
}
