package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over the corpus — the tokenizer-
  * induction step of a training-data pipeline (Sennrich et al.'s BPE:
  * repeatedly merge the most frequent adjacent token pair). No per-merge
  * data ever lands on the driver (each iteration's winning pair is a
  * 1-row aggregate broadcast into a string `replace` over the word
  * table), but the merge chain IS one scheduled iteration per merge —
  * see the [[MaxSteps]] contract for why that bounds this op to
  * analysis-scale merge counts.
  *
  * Scale shape: BPE trains on the WORD HISTOGRAM, not the corpus — the one
  * corpus-sized operation is the (word, freq) groupBy, cached via
  * CacheScope; every merge iteration after it is vocabulary-sized (pair
  * explode ≈ word-length × |vocab| rows, a 1-row argmin, a broadcast
  * cross). Each iteration's token state is also CacheScope-tracked: the
  * chain branches (winner k feeds both the output union and iteration
  * k+1), so per-step caching keeps the whole train O(steps)
  * vocabulary-sized scans instead of O(steps²).
  *
  * Token state is a spaced string with a strict invariant — tokens
  * separated by TWO spaces, ONE space at each end — so the merge
  * `replace(s, ' l  r ', ' lr ')` (leftmost, non-overlapping, boundary-
  * anchored by the spaces) merges every disjoint adjacent occurrence in
  * one pass AND preserves the invariant: back-to-back pairs work because
  * the pattern's outer single spaces consume only one of each double
  * separator (`' a  a  a  a '` → `' aa  aa '`, proven in `BpeSpec`).
  * Determinism: tie-breaks on (count DESC, left, right) make the merge
  * table engine-reproducible — the DuckDB oracle replays the same chain.
  */
object Bpe {

  val Steps = 5

  /** EXPLICIT SCALE CONTRACT on the merge loop: each merge is one
    * driver-scheduled iteration (a 1-row argmin broadcast + a
    * vocabulary-sized replace), so driver-side job count grows LINEARLY
    * with `steps` — unlike every other iterative op here, whose round
    * count is a small fixed k (PPR, LPA, k-core) or data-bounded (SSSP
    * fixpoint). This op is therefore scoped to ANALYSIS-scale merge
    * counts (corpus audits, fertility studies, merge-table diffing); a
    * production 32k-vocab tokenizer train would be 32k sequential Spark
    * jobs and belongs in a batched top-m-merges-per-round variant, not
    * here. The bound is enforced, not advisory — [[merges]]/[[encode]]/
    * [[encodeFrozen]] refuse `steps` beyond it (BpeSpec pins the
    * refusal). */
  val MaxSteps = 64

  /** The trained merge table: (step, l, r, cnt) — one row per merge, the
    * artifact a tokenizer ships. Precondition: `steps` ≤ the number of
    * merges the corpus supports (a dried-up pair table would emit a
    * null winner and poison the chain) — real corpora support millions,
    * and the hand-built fixture in `BpeSpec` uses steps = 2 for this
    * reason. */
  def merges(docs: DataFrame, steps: Int = Steps): DataFrame =
    chain(docs, steps)._1.reduce(_ unionByName _).orderBy(col("step"))

  /** Encode the corpus under the trained vocabulary: per-document
    * (n_words, n_chars, n_tokens, compression = chars per token). The
    * replace chain runs once per DISTINCT word — encoding cost is
    * vocabulary-sized, and documents join the encoded vocab on `word`
    * (AQE broadcasts it while it fits; the vocab grows sublinearly with
    * the corpus, so no structural broadcast hint) rather than
    * re-tokenizing every occurrence. */
  def encode(docs: DataFrame, steps: Int = Steps): DataFrame = {
    val perWord = chain(docs, steps)._2.select(col("word"),
      size(split(trim(col("s")), "  ")).as("word_tokens"),
      length(col("word")).as("word_chars"))
    docs.select(col("doc_id"), explode(Dedup.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("word_chars")).as("n_chars"),
        sum(col("word_tokens")).as("n_tokens"))
      .withColumn("compression",
        round(col("n_chars").cast("double") / col("n_tokens"), 4))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility audit, per source: tokens/word (fertility) and
    * chars/token under the trained vocabulary — the per-domain check a
    * tokenizer team runs before committing to a vocab (a domain whose
    * fertility is high pays proportionally more compute per byte of text
    * in training). Same vocabulary-sized replace chain as [[encode]]; the
    * corpus pass carries `source` through the word explode so the rollup
    * is one extra map-side-combined aggregate, not a second scan. */
  def fertility(docs: DataFrame, steps: Int = Steps): DataFrame = {
    val perWord = chain(docs, steps)._2.select(col("word"),
      size(split(trim(col("s")), "  ")).as("word_tokens"),
      length(col("word")).as("word_chars"))
    docs.select(col("source"), explode(Dedup.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, "word")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("word_chars")).as("n_chars"),
        sum(col("word_tokens")).as("n_tokens"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 4))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 4))
      .orderBy(col("source"))
  }

  /** FROZEN-tokenizer encode — the production semantics: the merge
    * table is trained ONCE on `trainDocs` and then applied, in training
    * order, to data it has never seen ([[encode]] retrains on its own
    * input, which a deployed pipeline never does — the tokenizer is a
    * versioned artifact). Unseen words replay the frozen merge list from
    * characters, exactly like BPE inference in any tokenizer runtime:
    * merges that don't occur in a word are no-ops, so the replay is
    * total on ANY vocabulary.
    *
    * Shape at 100 TB: the replay runs once per DISTINCT delta word
    * (vocabulary-sized, each step a broadcast 1-row merge + one string
    * replace); delta documents join the encoded vocab on `word` — the
    * same vocabulary-sized-work contract as [[encode]], now split
    * train/apply. */
  def encodeFrozen(trainDocs: DataFrame, deltaDocs: DataFrame,
      steps: Int = Steps): DataFrame = {
    val winners = chain(trainDocs, steps)._1
    var t = deltaDocs
      .select(explode(Dedup.words(col("text"))).as("word"))
      .filter(col("word") =!= "").distinct()
      .select(col("word"), concat(lit(" "),
        array_join(filter(split(col("word"), ""), c => c =!= ""), "  "),
        lit(" ")).as("s"))
    for (best <- winners) {
      // NOT cached per step: unlike chain()'s branching states (winner k
      // feeds both the output union and step k+1), each replay state here
      // has exactly ONE consumer — the next replace — so the linear
      // lineage evaluates once end-to-end either way
      t = t.crossJoin(broadcast(best))
        .select(col("word"),
          expr("replace(s, concat(' ', l, '  ', r, ' '), concat(' ', l, r, ' '))")
            .as("s"))
    }
    // cache only the FINAL replay state: the word explode + full replay
    // chain would otherwise re-run if the vocab join is re-evaluated
    // (AQE re-optimization / broadcast sizing probe both of its sides)
    val perWord = graft.CacheScope.track(t).select(col("word"),
      size(split(trim(col("s")), "  ")).as("word_tokens"),
      length(col("word")).as("word_chars"))
    deltaDocs.select(col("doc_id"), explode(Dedup.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("word_chars")).as("n_chars"),
        sum(col("word_tokens")).as("n_tokens"))
      .withColumn("compression",
        round(col("n_chars").cast("double") / col("n_tokens"), 4))
      .orderBy(col("doc_id"))
  }

  /** Batched-train contract knobs ([[mergesBatched]]): rounds × m merges
    * with driver jobs growing as ROUNDS, not merges — the production
    * shape the [[MaxSteps]] contract names (a 32k vocab at m = 256 is
    * 125 rounds, not 32k sequential jobs). The candidate pool is a fixed
    * top-`4·m` prefix of the (cnt DESC, l, r) ranking — prefix pools are
    * EXACT for the conflict rule below, because conflicts only ever look
    * UP the ranking. */
  val BatchRounds = 2
  val BatchM = 4

  /** Batched top-m merges per round — the scale sibling of [[merges]]:
    * each round takes the top-`4·m` pair candidates, keeps those that
    * share NO token with any higher-ranked candidate (token-disjoint
    * merges commute: merging (a,b) cannot change the adjacency count of
    * any pair disjoint from {a,b}, so the round's counts stay exact for
    * every survivor), and applies the first `m` survivors in rank order
    * in ONE vocabulary-sized pass (an `aggregate` fold over the
    * broadcast merge list).
    *
    * Semantics vs the sequential chain: where merges don't interact —
    * no token sharing among the round's top picks and no freshly-created
    * pair (x, ab) out-counting them — batched(rounds·m) EQUALS the first
    * rounds·m sequential merges (BpeSpec pins this on the golden
    * fixture). They legitimately diverge when (1) a conflicting pair is
    * postponed to the next round (sequential would re-rank it
    * immediately), or (2) a pair CREATED by this round's merge would
    * have out-counted a lower survivor — batched BPE's standard
    * approximation (Sennrich's reference implementation batches the
    * same way for its fast path). A round whose pair table dries up
    * emits no merges and leaves the state fixed — a no-op, mirrored
    * exactly by the oracle's null-tolerant replay (unlike [[merges]],
    * whose mid-CHAIN null winner would poison later steps and so fails
    * fast instead). */
  def mergesBatched(docs: DataFrame, rounds: Int = BatchRounds,
      m: Int = BatchM): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds <= MaxSteps,
      s"Bpe: rounds=$rounds exceeds MaxSteps=$MaxSteps — raise m, not the " +
        "round count (driver jobs grow with rounds)")
    require(m >= 1, s"Bpe: m must be >= 1, got $m")
    val poolK = 4 * m
    val hist = graft.CacheScope.track(
      docs.select(explode(Dedup.words(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("freq")))
    var t = hist.select(col("word"), col("freq"),
      concat(lit(" "),
        array_join(filter(split(col("word"), ""), c => c =!= ""), "  "),
        lit(" ")).as("s"))
    var winners = Seq.empty[DataFrame]
    for (rd <- 1 to rounds) {
      val tk = t.select(col("freq"), split(trim(col("s")), "  ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("freq"), col("tk"),
          explode(sequence(lit(0), size(col("tk")) - 2)).as("i"))
        .select(col("tk")(col("i")).as("l"), col("tk")(col("i") + 1).as("r"),
          col("freq"))
      val pairs = tk.groupBy(col("l"), col("r"))
        .agg(sum(col("freq")).as("cnt"))
      // top-poolK prefix via TakeOrderedAndProject (bounded heaps, never
      // a global sort); the rank window then runs over ≤ poolK rows —
      // metadata-sized by construction, not a key-less window smell
      val cand = pairs.orderBy(desc("cnt"), col("l"), col("r")).limit(poolK)
        .withColumn("rn", row_number().over(
          Window.orderBy(desc("cnt"), col("l"), col("r"))))
      // survivor = shares no token with ANY higher-ranked candidate
      // (non-greedy: a pair dropped by a dropped pair stays dropped —
      // deterministic and oracle-replicable, and a postponed pair simply
      // wins a later round)
      val surv = graft.CacheScope.track(
        cand.as("a").join(cand.as("b"),
          col("b.rn") < col("a.rn") &&
            (col("b.l") === col("a.l") || col("b.l") === col("a.r") ||
              col("b.r") === col("a.l") || col("b.r") === col("a.r")),
          "left_anti")
          .withColumn("seq", row_number().over(Window.orderBy(col("rn"))))
          .filter(col("seq") <= m))
      winners = winners :+ surv.select(lit(rd).as("round"),
        col("seq").cast("int").as("seq"), col("l"), col("r"), col("cnt"))
      // ONE pass applies the whole round: token-disjoint merges cannot
      // overlap in the string, so the seq-ordered fold equals sequential
      // application
      val msel = surv.agg(sort_array(collect_list(
        struct(col("seq"), col("l"), col("r")))).as("ms"))
      t = graft.CacheScope.track(t.crossJoin(broadcast(msel))
        .select(col("word"), col("freq"),
          expr("aggregate(ms, s, (acc, x) -> replace(acc, " +
            "concat(' ', x.l, '  ', x.r, ' '), concat(' ', x.l, x.r, ' ')))")
            .as("s")))
    }
    winners.reduce(_ unionByName _).orderBy(col("round"), col("seq"))
  }

  /** The shared merge chain: per-step winners plus the final token
    * state (word, freq, s). */
  private def chain(docs: DataFrame, steps: Int): (Seq[DataFrame], DataFrame) = {
    require(steps <= MaxSteps,
      s"Bpe: steps=$steps exceeds MaxSteps=$MaxSteps — the merge loop is " +
        "one driver job per merge (see the MaxSteps contract); a " +
        "vocab-scale train needs a batched variant, not a bigger bound")
    // the ONE corpus-sized operation: the word histogram
    val hist = graft.CacheScope.track(
      docs.select(explode(Dedup.words(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("freq")))
    // initial state: characters, double-space separated
    var t = hist.select(col("word"), col("freq"),
      concat(lit(" "),
        array_join(filter(split(col("word"), ""), c => c =!= ""), "  "),
        lit(" ")).as("s"))
    var winners = Seq.empty[DataFrame]
    for (k <- 1 to steps) {
      val tk = t.select(col("freq"), split(trim(col("s")), "  ").as("tk"))
        // single-token words carry no pairs; without the filter Spark's
        // sequence(0, -1) would DESCEND ([0, -1]) and emit null pairs
        // (DuckDB's range(0) is empty — the engines would diverge)
        .filter(size(col("tk")) >= 2)
        .select(col("freq"), col("tk"),
          explode(sequence(lit(0), size(col("tk")) - 2)).as("i"))
        .select(col("tk")(col("i")).as("l"), col("tk")(col("i") + 1).as("r"),
          col("freq"))
      val pairs = tk.groupBy(col("l"), col("r"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs.agg(min_by(struct(col("l"), col("r"), col("cnt")),
          struct(negate(col("cnt")), col("l"), col("r"))).as("b"))
        // a dried-up pair table (steps > the merges this corpus supports)
        // makes min_by emit a null struct, and the null winner would
        // poison every downstream token state into null rows SILENTLY —
        // fail fast instead. coalesce evaluates lazily, so the healthy
        // path never touches raise_error and stays codegen'd.
        .select(lit(k).as("step"),
          coalesce(col("b.l"), raise_error(lit(
            s"BPE: corpus supports fewer than $k merges — " +
              s"the step-$k pair table is empty; lower `steps`"))).as("l"),
          col("b.r").as("r"), col("b.cnt").as("cnt"))
      winners = winners :+ best
      // cache each state: the chain branches (winner k feeds both the
      // output union and iteration k+1), so uncached recompute would be
      // O(steps²) vocabulary-sized scans instead of O(steps)
      t = graft.CacheScope.track(t.crossJoin(broadcast(best))
        .select(col("word"), col("freq"),
          expr("replace(s, concat(' ', l, '  ', r, ' '), concat(' ', l, r, ' '))")
            .as("s")))
    }
    (winners, t)
  }
}
