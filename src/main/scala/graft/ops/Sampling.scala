package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training-data pipelines.
  *
  * At 100 TB the only splits that work are STATELESS ones: a row's
  * train/val/test assignment must be a pure function of its key, so any
  * executor (or any later re-run over a changed partition layout) assigns
  * identically with zero coordination — no global RNG, no sampled-row
  * table to join against, no ordering dependence. `rand()`-based
  * `sample()`/`sampleBy` give none of those guarantees across retries and
  * recomputed partitions, which is why production corpus pipelines key the
  * split on a content/id hash instead.
  *
  * The bucket is the first two hex digits of md5(salt|id) — uniform on
  * [0,256) and bit-identical in any engine (same no-murmur-seed rationale
  * as [[Dedup]]'s signatures), so the DuckDB oracle reproduces every
  * assignment exactly.
  */
object Sampling {

  /** Portable uniform bucket in [0,256): the first two md5 hex digits of
    * salt|id, parsed base-16 (`conv`). Per-row codegen'd — one scan, zero
    * shuffles; the oracle parses the same two digits with instr arithmetic. */
  def bucket256(salt: String, id: Column): Column = {
    val h = md5(concat(lit(salt + "|"), id.cast("string")).cast("binary"))
    conv(substring(h, 1, 2), 16, 10).cast("bigint")
  }

  /** 80/10/10 split thresholds on the 256-bucket space. */
  val TrainUpper = 205 // 205/256 ≈ 80.1%
  val ValUpper = 230   // 25/256 ≈ 9.8%; remainder ≈ 10.2% test

  /** Assign every document a reproducible train/val/test split. */
  def hashSplit(docs: DataFrame, salt: String = "split"): DataFrame =
    docs.select(col("doc_id"), bucket256(salt, col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** LEAKAGE-SAFE split: the split unit is the near-duplicate COMPONENT,
    * not the document — every member of a component lands in the same
    * split. Doc-keyed [[hashSplit]] cannot prevent the classic eval
    * contamination where a near-copy of a test document sits in train;
    * keying the same deterministic bucket on the component's canonical
    * (minimum) doc_id makes that impossible by construction, and keeps
    * singleton docs' assignment IDENTICAL to [[hashSplit]]'s (their
    * component id IS their doc_id — spec-pinned), so adopting the safe
    * split only moves documents that have near-duplicates.
    *
    * Scale shape: the component map is the banded-LSH + verify + GraphX
    * chain ([[Dedup.nearDupComponents]] — never all-pairs); the split
    * itself adds one codegen'd hash projection, zero extra shuffles. */
  def leakageSafeSplit(docs: DataFrame, salt: String = "split"): DataFrame =
    Dedup.nearDupComponents(docs)
      .select(col("doc_id"), col("component"),
        bucket256(salt, col("component")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** Per-source quota sample: the `quota` docs with the SMALLEST
    * md5(salt|id) per source — the per-domain cap every corpus pipeline
    * applies so no single crawl source dominates the mix. Deterministic for
    * the same reasons as [[hashSplit]] (pure function of the key set, no
    * RNG), and ranking by a uniform hash makes the quota a uniform random
    * sample of each source in distribution while staying replayable.
    *
    * Scale shape: selection runs through the custom [[graft.plans.TopKPerKey]]
    * operator — bounded per-key heaps map-side, so the exchange carries at
    * most `quota` rows per source per input partition. A plain
    * `row_number() OVER (PARTITION BY source)` would instead funnel EVERY
    * row of a source through one reducer — the classic skew cliff when one
    * domain is 30% of the crawl. The rank column is materialized by a
    * window AFTER selection, over ≤ quota·|sources| rows. */
  /** Per-source mixture thresholds on the 256-bucket space: source
    * `src<n>` keeps buckets below 64·(1 + n mod 4) — i.e. 25/50/75/100%
    * of its docs. A deterministic stand-in for the tuned per-domain
    * mixture weights of a real corpus recipe; the mechanism (hash
    * threshold per source, not RNG) is the part that matters. */
  def sourceWeights(docs: DataFrame): DataFrame =
    docs.select(col("source")).distinct()
      .withColumn("keep_below",
        lit(64) * (lit(1) + pmod(substring(col("source"), 4, 10).cast("int"), lit(4))))

  /** Weighted source mixing: down-sample each source to its target weight
    * by hash threshold — the "data mixture" step that turns raw crawl
    * proportions into the training recipe. Same retry/layout determinism
    * as [[hashSplit]] (the keep decision is a pure function of doc_id and
    * the source's weight). The weights side is a TRUE dimension (fixed
    * source vocabulary, SF-independent — verified 20 sources at every SF)
    * so it carries a broadcast hint per the repo-wide policy. */
  def weightedMix(docs: DataFrame, salt: String = "mix"): DataFrame =
    docs.select(col("doc_id"), col("source"),
        bucket256(salt, col("doc_id")).as("bucket"))
      .join(broadcast(sourceWeights(docs)), "source")
      .filter(col("bucket") < col("keep_below"))
      .select(col("doc_id"), col("source"), col("keep_below"))
      .orderBy(col("doc_id"))

  /** EPOCH/UPSAMPLING mixture — the data-REPETITION half of mixture
    * weighting ([[weightedMix]]/[[temperatureMix]] only ever DOWN-sample;
    * real training recipes also repeat high-quality sources, e.g.
    * Wikipedia at 2–5 epochs in the GPT-3/LLaMA data tables). Each
    * source s carries a target epoch count e_s — fractional and > 1
    * allowed: every doc emits floor(e_s) full copies, plus one extra
    * copy iff its [[bucket256]] hash falls below round(frac(e_s)·256)
    * — so e = 2.25 repeats every doc twice and a deterministic quarter
    * of docs a third time, e = 0.5 halves the source, e = 0 drops it,
    * and an UNLISTED source passes through at exactly 1 epoch.
    * Fractions quantize to 1/256 granularity at the API boundary
    * (exact integer thresholds — the cross-engine house rule; the
    * oracle interpolates the same (whole, extra256) integers from the
    * same map, never a float).
    *
    * Scale shape: a broadcast epochs dim, ONE corpus scan, per-row
    * hash + `explode(sequence(...))` — output rows ∝ Σ e_s·n_s, no
    * shuffle at all before the (oracle-only) final sort. copy_idx is
    * emitted so downstream shuffling/packing can decorrelate repeats
    * (consumers salt on (doc_id, copy_idx), never on doc_id alone). */
  def epochMix(docs: DataFrame, epochs: Seq[(String, Double)],
      salt: String = "epoch"): DataFrame = {
    require(epochs.forall { case (_, e) => e >= 0.0 && e <= 16.0 },
      s"epochMix: epoch targets must be in [0, 16], got $epochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = epochs.map { case (s, e) =>
      val whole = math.floor(e).toLong
      (s, whole, math.round((e - whole) * 256).toInt)
    }.toDF("source", "whole", "extra256")
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(dim), Seq("source"), "left_outer")
      .withColumn("n_copies",
        coalesce(col("whole"), lit(1L)) +
          when(bucket256(salt, col("doc_id")) <
            coalesce(col("extra256"), lit(0)), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"),
        col("n_copies"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  /** TEMPERATURE-scaled source mixture — the α-exponent re-weighting
    * training recipes use to keep low-resource sources from drowning
    * (multilingual sampling à la the α = 0.3–0.7 exponents in the
    * mBERT/XLM-R/PaLM data-mixing literature): source share ∝ n_s^α
    * instead of n_s, so small sources are boosted and large ones
    * damped, then each source keeps its hash-ranked prefix up to the
    * re-scaled target. α is FIXED at 0.5 here by design: IEEE-754
    * requires sqrt to be correctly rounded, so both engines compute the
    * bit-identical double — pow is not correctly rounded and could
    * diverge in the last ulp, which the exact-integer house rules
    * forbid. Weights quantize to w6 = round(sqrt(n)·10^6) longs, the
    * per-source target is the exact integer floor((w6·B) / Σw6) with
    * budget B = floor(N/2) — the w6·B product runs in DECIMAL(38,0)
    * (Spark) / HUGEINT (the oracle) because at ~10^9 docs w6·B ≈
    * sqrt(n)·10^6 · n/2 overflows a 64-bit long, and Spark would wrap
    * silently where DuckDB errors — and "which docs" is the md5-ranked prefix
    * within each source (salted, doc_id tie-break) — every number in
    * the output is engine-reproducible.
    *
    * Scale shape: one 20-group count aggregate (map-side combined), a
    * broadcast totals row, the per-source rank via [[KeyedPrefix.rank]]
    * (range-partition + metadata offsets — never a source-partitioned
    * window, which would funnel each source through ONE reducer), and a
    * 20-row summary out. */
  def temperatureMix(docs: DataFrame, salt: String = "tmix"): DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w6",
        round(sqrt(col("n_docs").cast("double")) * 1000000.0).cast("long"))
    val tot = counts.agg(sum(col("w6")).as("wtot"),
      sum(col("n_docs")).as("ntot"))
    val dim = counts.crossJoin(broadcast(tot))
      .withColumn("budget",
        floor(col("ntot").cast("double") * 0.5).cast("long"))
      .withColumn("target",
        expr("(CAST(w6 AS DECIMAL(38,0)) * budget) div wtot"))
      .select(col("source"), col("n_docs"), col("w6"), col("target"))
    val hashed = docs.select(col("doc_id"), col("source"),
      md5(concat(lit(salt + "|"), col("doc_id").cast("string"))
        .cast("binary")).as("h"))
    val kept = KeyedPrefix.rank(hashed, "source", Seq("h", "doc_id"), "rk")
      .join(broadcast(dim.select(col("source"), col("target"))), "source")
      .filter(col("rk") <= col("target"))
      .groupBy(col("source")).agg(count(lit(1)).as("kept_docs"))
    dim.join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("w6"), col("target"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        round(col("target").cast("double") / col("n_docs").cast("double"), 4)
          .as("rate"))
      .orderBy(col("source"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws u ∈ (0,1) from its md5 hash and ranks by u^(1/w) —
    * the top-k of that key IS a w-proportional sample without
    * replacement. Deterministic for the usual reasons: u is a pure
    * function of doc_id (13 hex digits → uniform double), weights are
    * the [[sourceWeights]] dim, and ranking uses the ROUNDED key with a
    * doc_id tie-break so the cross-engine cut is stable.
    *
    * Scale shape: per-row key in the scan, weights broadcast, global
    * top-k via `TakeOrderedAndProject` (per-partition heaps, k rows to
    * the driver per partition) — the selection never shuffles the
    * corpus. */
  def weightedSample(docs: DataFrame, k: Int = 50,
      salt: String = "wsample"): DataFrame = {
    val hex13 = substring(
      md5(concat(lit(salt + "|"), col("doc_id").cast("string")).cast("binary")), 1, 13)
    val u = (conv(hex13, 16, 10).cast("double") + lit(0.5)) /
      lit(java.lang.Math.pow(16.0, 13))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(sourceWeights(docs)), "source")
      .select(col("doc_id"), col("source"),
        col("keep_below").cast("double").as("w"),
        round(pow(u, lit(1.0) / col("keep_below").cast("double")), 6).as("key"))
      .orderBy(desc("key"), col("doc_id"))
      .limit(k)
  }

  def stratifiedQuota(docs: DataFrame, quota: Int = 10,
      salt: String = "strat"): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("source"),
      md5(concat(lit(salt + "|"), col("doc_id").cast("string")).cast("binary")).as("h"))
    graft.plans.TopK.perKeyMin(hashed, Seq("source"), "h", "doc_id", quota)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))).cast("bigint"))
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** The data-recipe COMPOSER — the query a pretraining run actually
    * issues, chaining the family's stages over one corpus in one DAG:
    *
    *   1. per-source relative QUALITY GATE (the [[TextAnalysis.qualityGate]]
    *      recipe: keep docs at/above their source's p25 stopword ratio);
    *   2. TEMPERATURE share over the survivors ([[temperatureMix]]'s α = 0.5
    *      exact-integer targets, md5-ranked keep prefix per source);
    *   3. EPOCH repetition of the admitted docs ([[epochMix]]'s
    *      (whole, extra256) integer interpolation, unlisted sources = 1);
    *   4. TOKEN-BUDGET truncation over the copy stream ([[tokenBudget]]'s
    *      per-source quota — here on the POST-epoch token mass — with the
    *      crossing copy admitted);
    *
    * emitting the final corpus MANIFEST: one row per source with audited
    * counts at every stage (raw → gated → temperature-kept → copies →
    * budget-admitted, docs and tokens), so a recipe change diffs as a
    * 20-row table instead of a 100 TB re-read.
    *
    * Scale shape: ONE corpus scan — every per-row signal all four stages
    * need (quality ratio, token count, epoch bucket, temperature hash)
    * rides a single cached projection (spec-asserted); everything above
    * it is per-source aggregates (map-side combined, |sources| rows),
    * broadcast dims, and exactly two per-source ordered folds — the
    * temperature rank and the budget running sum — both via
    * [[KeyedPrefix]]'s range-partition + metadata-offset discipline, so
    * neither funnels a dominant source through one reducer. Every number
    * in the manifest is integer or pre-rounded — bit-reproducible
    * cross-engine. */
  def recipe(docs: DataFrame, epochs: Seq[(String, Double)]): DataFrame = {
    require(epochs.forall { case (_, e) => e >= 0.0 && e <= 16.0 },
      s"recipe: epoch targets must be in [0, 16], got $epochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = graft.CacheScope.track(docs.select(
      col("doc_id"), col("source"),
      TextAnalysis.stopRatioCol.as("stop_ratio"),
      size(Dedup.words(col("text"))).cast("long").as("n_tokens"),
      bucket256("epoch", col("doc_id")).as("ebucket"),
      md5(concat(lit("tmix|"), col("doc_id").cast("string")
        ).cast("binary")).as("th")))
    // 1. quality gate: per-source exact p25 threshold, broadcast back
    val thr = base.groupBy(col("source"))
      .agg(round(expr("percentile(stop_ratio, 0.25)"), 4).as("thr"))
    val gated = base.join(broadcast(thr), "source")
      .filter(col("stop_ratio") >= col("thr"))
    // 2. temperature share over the survivors (α = 0.5, integer targets)
    val counts = gated.groupBy(col("source")).agg(count(lit(1)).as("n_gated"))
      .withColumn("w6",
        round(sqrt(col("n_gated").cast("double")) * 1000000.0).cast("long"))
    val tot = counts.agg(sum(col("w6")).as("wtot"), sum(col("n_gated")).as("ntot"))
    val dim = counts.crossJoin(broadcast(tot))
      .withColumn("budget", floor(col("ntot").cast("double") * 0.5).cast("long"))
      .withColumn("target", expr("(CAST(w6 AS DECIMAL(38,0)) * budget) div wtot"))
      .select(col("source"), col("n_gated"), col("w6"), col("target"))
    // cached: the temperature-admitted frame feeds the epoch explode AND
    // the manifest's kept-count aggregate — with the KeyedPrefix rank in
    // its lineage, an uncached second consumer would replay the range
    // exchange + offset-broadcast chain
    val admittedTemp = graft.CacheScope.track(
      KeyedPrefix.rank(gated, "source", Seq("th", "doc_id"), "rk")
        .join(broadcast(dim.select(col("source"), col("target"))), "source")
        .filter(col("rk") <= col("target")))
    // 3. epoch repetition: broadcast (whole, extra256) dim, explode copies
    val edim = epochs.map { case (s, e) =>
      val whole = math.floor(e).toLong
      (s, whole, math.round((e - whole) * 256).toInt)
    }.toDF("source", "whole", "extra256")
    // cached: the copy stream has FOUR consumers (the budget prefix sum's
    // two range-exchange passes, the quota aggregate, and the manifest's
    // copy aggregate) — the deepest frame in the DAG
    val copies = graft.CacheScope.track(
      admittedTemp.join(broadcast(edim), Seq("source"), "left_outer")
        .withColumn("n_copies",
          coalesce(col("whole"), lit(1L)) +
            when(col("ebucket") < coalesce(col("extra256"), lit(0)), 1L)
              .otherwise(0L))
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx")))
    // 4. token budget on the post-epoch copy stream, crossing copy admitted
    val weights = base.select(col("source")).distinct()
      .withColumn("keep_below", lit(64) *
        (lit(1) + pmod(substring(col("source"), 4, 10).cast("int"), lit(4))))
    val quota = copies.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .join(broadcast(weights), "source")
      .select(col("source"), expr("(keep_below * src_tokens) div 256").as("quota"))
    val admitted = KeyedPrefix.prefixSum(copies, "source",
        Seq("doc_id", "copy_idx"), "n_tokens", "cum")
      .join(broadcast(quota), "source")
      .filter(col("cum") - col("n_tokens") < col("quota"))
    // the manifest: per-source audited counts at every stage
    val raw = base.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
    val kept = admittedTemp.groupBy(col("source"))
      .agg(count(lit(1)).as("n_temp_kept"))
    val copyAgg = copies.groupBy(col("source"))
      .agg(count(lit(1)).as("copies_total"),
        sum(col("n_tokens")).as("tokens_pre_budget"))
    val admitAgg = admitted.groupBy(col("source"))
      .agg(count(lit(1)).as("copies_admitted"),
        sum(col("n_tokens")).as("tokens_admitted"))
    raw.join(thr, "source")
      .join(broadcast(weights), "source")
      .join(dim, Seq("source"), "left_outer")
      .join(kept, Seq("source"), "left_outer")
      .join(broadcast(edim), Seq("source"), "left_outer")
      .join(copyAgg, Seq("source"), "left_outer")
      .join(quota, Seq("source"), "left_outer")
      .join(admitAgg, Seq("source"), "left_outer")
      .select(col("source"), col("n_raw"), col("thr"),
        coalesce(col("n_gated"), lit(0L)).as("n_gated"),
        coalesce(col("w6"), lit(0L)).as("w6"),
        coalesce(col("target"), lit(0L)).as("target"),
        coalesce(col("n_temp_kept"), lit(0L)).as("n_temp_kept"),
        coalesce(col("whole"), lit(1L)).as("epoch_whole"),
        coalesce(col("extra256"), lit(0)).as("epoch_extra256"),
        coalesce(col("copies_total"), lit(0L)).as("copies_total"),
        coalesce(col("tokens_pre_budget"), lit(0L)).as("tokens_pre_budget"),
        col("keep_below"),
        coalesce(col("quota"), lit(0L)).as("quota"),
        coalesce(col("copies_admitted"), lit(0L)).as("copies_admitted"),
        coalesce(col("tokens_admitted"), lit(0L)).as("tokens_admitted"))
      .orderBy(col("source"))
  }

  /** Curriculum staging (Bengio et al., "Curriculum Learning", ICML
    * 2009 — train easy→hard): difficulty = token count; stage cuts =
    * the EXACT global quartiles of difficulty via
    * [[graft.ops.Quantiles.exactQuantiles]]'s histogram bisection
    * (bounded driver metadata — never a global sort, the op a naive
    * ntile-over-everything would hide a single-partition window in);
    * stage(d) = 1 + |{cuts < d}| ∈ 1..4. Output is the per-(stage,
    * source) manifest a training scheduler consumes: doc and token
    * counts with the difficulty envelope. Work: the bisection's
    * column-pruned passes + ONE manifest aggregate over the cached
    * tokenized scan. */
  def curriculum(docs: DataFrame): DataFrame = {
    val base = graft.CacheScope.track(docs.select(
      col("doc_id"), col("source"),
      size(Dedup.words(col("text"))).cast("long").as("n_tokens")))
    val cuts = Quantiles.exactQuantiles(base, col("n_tokens"),
      Seq(0.25, 0.5, 0.75)).map(_._2)
    val staged = base.withColumn("stage",
      (lit(1) + cuts.map(c => when(col("n_tokens") > c, 1).otherwise(0))
        .reduce(_ + _)).cast("int"))
    staged.groupBy(col("stage"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("stage"), col("source"))
  }

  /** Token-budgeted mixture: real training recipes are specified in
    * TOKENS per source, not documents. Each source's quota is
    * keep_below/256 of its own token mass (the [[sourceWeights]] recipe
    * applied to tokens); docs are admitted in doc_id order until the
    * running token sum crosses the quota, with the crossing doc admitted
    * (quotas are floors — mixtures over-fill, then trim at pack time).
    * All arithmetic is integer (`div` 256, long sums), so the admission
    * set is bit-stable across engines.
    *
    * Scale shape: token counts ride the scan; the running sum is
    * [[KeyedPrefix.prefixSum]]'s range-partition + metadata-offset fold
    * — a source that dominates the corpus spans many partitions instead
    * of funneling through one reducer task. The quota side is |sources|
    * rows (a true dimension) and broadcasts. */
  def tokenBudget(docs: DataFrame): DataFrame = {
    // the tokenized scan feeds both the quota aggregation and the
    // admission join — cache it once (same pattern as docDupSpans /
    // cmsHeavyHitters), freed at the driver's query boundary
    val toks = graft.CacheScope.track(
      docs.select(col("doc_id"), col("source"),
        size(Dedup.words(col("text"))).cast("long").as("n_tokens")))
    val quota = toks.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .join(broadcast(sourceWeights(docs)), "source")
      .select(col("source"),
        expr("(keep_below * src_tokens) div 256").as("quota"))
    KeyedPrefix.prefixSum(toks, "source", Seq("doc_id"), "n_tokens",
        "cum_tokens")
      .join(broadcast(quota), "source")
      .filter(col("cum_tokens") - col("n_tokens") < col("quota"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("quota"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score every raw-corpus document by how much
    * more likely its hashed-unigram features are under a small TARGET
    * distribution (curated data) than under the raw distribution itself —
    * the standard pre-training trick for tilting a web-scale corpus toward
    * a quality exemplar without training a classifier.
    *
    * Features are hashed to 256 buckets (first two md5 hex digits of the
    * token — the repo's portable bucket), both distributions are
    * Laplace-smoothed ((cnt+1)/(N+256)), and each bucket's log-ratio is
    * quantized to a scaled long (round(ln·10⁶)) BEFORE the per-doc sum, so
    * the document score is exact integer arithmetic (the [[TextAnalysis
    * .lmScore]] discipline — no float-addition-order dependence). A doc is
    * kept when its mean log-ratio is positive (more target-like than raw)
    * — a stateless per-doc decision, no global sort, no resampling state.
    *
    * Scale shape: ONE cached token explode (three consumers on different
    * keys: target counts, raw counts, the per-doc score join — the lmScore
    * rationale), two vocabulary-bounded (≤256-row) aggregates, a broadcast
    * join of the 256-row ratio dim back onto the token stream, one per-doc
    * sum. Linear in corpus tokens; nothing on the driver. */
  def dsirScores(docs: DataFrame, targetSource: String = "src0"): DataFrame = {
    val tok = graft.CacheScope.track(
      docs.select(col("doc_id"), col("source"),
        explode(Dedup.words(col("text"))).as("tok"))
        .withColumn("b",
          conv(substring(md5(col("tok").cast("binary")), 1, 2), 16, 10)
            .cast("bigint"))
        .select(col("doc_id"), col("source"), col("b")))
    val tCnt = tok.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("t_cnt"))
    val rCnt = tok.filter(col("source") =!= targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("r_cnt"))
    val nt = tCnt.agg(coalesce(sum(col("t_cnt")), lit(0L)).as("nt"))
    val nr = rCnt.agg(sum(col("r_cnt")).as("nr"))
    // 256-row ratio dim: raw-side buckets, target count 0-defaulted; the
    // totals are 1-row frames cross-joined in (broadcast by size)
    val lr = rCnt.join(tCnt, Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        round(log(
          ((coalesce(col("t_cnt"), lit(0L)) + lit(1.0)) / (col("nt") + lit(256.0))) /
          ((col("r_cnt") + lit(1.0)) / (col("nr") + lit(256.0)))) * lit(1000000.0))
          .cast("long").as("lr6"))
    tok.filter(col("source") =!= targetSource)
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lr6")).cast("double") / (lit(1000000.0) * count(lit(1))), 4)
          .as("dsir_score"))
      .withColumn("keep", (col("dsir_score") > 0.0).cast("int"))
      .orderBy(col("doc_id"))
  }
}
