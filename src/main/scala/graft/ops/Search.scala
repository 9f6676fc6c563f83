package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword search over `documents` — the lexical retrieval half of a
  * corpus-curation stack (the dense half is [[Similarity]]'s ANN family).
  *
  * Shape at 100 TB: for a bounded query-term set, per-document term
  * frequencies are computed IN THE SCAN (a `filter(words, ...)` count per
  * term — codegen'd, no explode, no per-token row blow-up), the corpus
  * statistics BM25 needs (N, avgdl, per-term document frequencies) reduce
  * to ONE summary row (map-side partial aggregation), and that row is
  * broadcast back for scoring. Total cost: two scans of the text column,
  * one 1-row exchange, one top-k (`TakeOrderedAndProject`) — nothing
  * proportional to corpus size ever shuffles. An inverted index (the
  * [[DedupIndex]]-style materialized variant) only wins once the query
  * load is repeated; this is the scan-time form.
  *
  * Scores are rounded to 4 decimals and tie-broken by doc_id so ranking
  * is reproducible across engines (`ln`/division are IEEE-double but
  * last-ulp-sensitive; the rounding makes the oracle compare exact).
  */
object Search {

  /** The fixed query-term set the driver oracle exercises. */
  val QueryTerms: Seq[String] = Seq("spark", "shuffle", "hash")

  /** Okapi BM25 parameters (the standard defaults). */
  val K1 = 1.2
  val B = 0.75

  val TopK = 20

  private def tf(term: String): Column =
    size(filter(Dedup.words(col("text")), x => x === lit(term)))
      .cast("double")

  /** BM25 top-k: score every document against [[QueryTerms]], keep the
    * best [[TopK]]. Output: doc_id, per-term tf, doc length, score. */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = QueryTerms,
      k: Int = TopK): DataFrame = {
    val perDoc = docs.select(
      (col("doc_id") +:
        size(Dedup.words(col("text"))).cast("double").as("dl") +:
        terms.map(t => tf(t).as(s"tf_$t"))): _*)
    // one summary row: corpus size, average doc length, per-term df
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("double")
          .as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    // idf_t = ln((N - df + 0.5) / (df + 0.5) + 1)  (Lucene/ATIRE form:
    // strictly positive, so a term in >half the corpus can't flip signs)
    def idf(t: String): Column =
      log((col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5)) + lit(1.0))
    def part(t: String): Column =
      idf(t) * (col(s"tf_$t") * (K1 + 1)) /
        (col(s"tf_$t") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    val score = round(terms.map(part).reduce(_ + _), 4)
    perDoc.crossJoin(broadcast(stats))
      .select(
        (col("doc_id") +: col("dl").cast("bigint").as("dl") +:
          terms.map(t => col(s"tf_$t").cast("bigint").as(s"tf_$t"))) :+
          score.as("score"): _*)
      .filter(col("score") > 0)
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank-fusion constant (Cormack et al.'s standard 60). */
  val RrfK = 60

  /** Hybrid retrieval: fuse TWO rankings of the same query over the same
    * corpus — BM25 and a plain tf-idf (VSM-dot) scorer — by reciprocal
    * rank: rrf(d) = Σ_lists 1/(RrfK + rank_list(d)), absent-from-list
    * contributing 0. RRF is the standard score-scale-free fusion step of
    * lexical+X retrieval stacks; here both halves are lexical-over-
    * `documents` because the dense half ([[Similarity]]) ranks a different
    * entity table (`embeddings.vec_id`), and fusing rankings of different
    * id spaces would be semantically fake.
    *
    * Shape at 100 TB: BOTH scores come off ONE shared (doc_id, dl, tf_t…)
    * projection crossed with the ONE broadcast stats row — the two top-k
    * cuts are `TakeOrderedAndProject` over that narrow projection (no
    * sort, no shuffle), ranks come from one ≤ k-element
    * collect_list → sort_array → posexplode per cut (a single-row
    * aggregate — no global rank window, so no WindowExec, and no
    * rank-by-self-join, which would RECOMPUTE the corpus scan on its
    * build side), and the fusion is a ≤ 2k-row full-outer join. Nothing
    * corpus-sized moves beyond the two scans of the projection. */
  def hybridRrf(docs: DataFrame, terms: Seq[String] = QueryTerms,
      k: Int = TopK): DataFrame = {
    val perDoc = docs.select(
      (col("doc_id") +:
        size(Dedup.words(col("text"))).cast("double").as("dl") +:
        terms.map(t => tf(t).as(s"tf_$t"))): _*)
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("double")
          .as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    def bmPart(t: String): Column =
      log((col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5)) + lit(1.0)) *
        (col(s"tf_$t") * (K1 + 1)) /
        (col(s"tf_$t") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    def vsmPart(t: String): Column =
      when(col(s"df_$t") > 0,
        col(s"tf_$t") * log(col("n_docs") / col(s"df_$t"))).otherwise(lit(0.0))
    val scored = perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(terms.map(bmPart).reduce(_ + _), 4).as("s_bm25"),
        round(terms.map(vsmPart).reduce(_ + _), 4).as("s_vsm"))
    def ranked(scoreCol: String, rankName: String): DataFrame =
      scored.filter(col(scoreCol) > 0)
        .orderBy(desc(scoreCol), col("doc_id")).limit(k)
        // rank = 1 + position in the (-score, doc_id)-sorted ≤ k-element list
        .agg(sort_array(collect_list(struct(
          negate(col(scoreCol)).as("ns"), col("doc_id").as("doc_id")))).as("arr"))
        .select(posexplode(col("arr")).as(Seq("i", "e")))
        .select(col("e.doc_id").as("doc_id"),
          (col("i") + 1).cast("int").as(rankName))
    ranked("s_bm25", "r_bm25")
      .join(ranked("s_vsm", "r_vsm"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_bm25"), col("r_vsm"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_vsm")), lit(0.0)), 6).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
  }

  /** Per-document keyword extraction: top-`k` terms by tf-idf over the
    * FULL vocabulary — the explode-based complement to [[bm25TopK]]'s
    * fixed-term scan (when the term set isn't known up front, the token
    * table has to exist).
    *
    * Shape at 100 TB: one explode to (doc, term, tf) — the unavoidable
    * corpus-sized shuffle, grouped on the high-cardinality (doc, term);
    * document frequencies aggregate that same table down to vocabulary
    * size with min-df pruning BEFORE the join back (rare-term tail
    * dropped early, the largest skew source gone); per-doc top-k runs
    * through [[graft.plans.TopK.perKeyMin]]'s bounded heaps, not a
    * full-sort window. Ranking uses the ROUNDED score with a term
    * tie-break — deterministic across engines. */
  def keywords(docs: DataFrame, k: Int = 3, minDf: Int = 2): DataFrame = {
    // linear tf: one token explode + count, O(tokens) work and shuffle —
    // NOT the per-distinct-term list_filter form, whose per-doc cost is
    // quadratic (distinct terms × tokens) and which drags the full word
    // array through the explode
    val tf = docs.select(col("doc_id"),
        explode(Dedup.words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      .filter(col("df") >= minDf)
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("tfidf"))
      .filter(col("tfidf") > 0)
    // bounded per-key heaps (highest tfidf, term tie-break) — top-k
    // without a full per-doc sort; the rank window runs over ≤ k·docs
    // rows AFTER selection
    graft.plans.TopK.perKey(scored, Seq("doc_id"), "tfidf", "term", k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(desc("tfidf"), col("term"))).cast("int"))
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }
}
