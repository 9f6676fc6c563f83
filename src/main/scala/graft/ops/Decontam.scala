package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose token-n-gram
  * overlap with a held-out evaluation set is high enough to constitute
  * test-set leakage — the standard pre-training hygiene pass (the GPT-3 /
  * PaLM appendix procedure: drop any training doc sharing too many 13-gram
  * collisions with an eval benchmark; here 3-shingles on the synthetic
  * corpus, same structure).
  *
  * Scale shape: distinct-shingle explode on both sides, one equi-join on
  * the shingle string (high cardinality → even partitioning), then a
  * per-doc aggregate. Never all-pairs, never a driver-side set. In
  * production the benchmark side is a FIXED eval suite (MBs, not TBs) and
  * would carry a broadcast hint; in this fixture it's an SF-proportional
  * slice of `documents`, so per the repo-wide hint policy (SCALING.md) it
  * gets none and AQE sizes the join.
  */
object Decontam {

  /** Overlap fraction at or above which a doc is flagged contaminated.
    * The flag is computed on the 4-dp ROUNDED fraction in both engines so
    * the threshold compare can never straddle a ulp. */
  val ContaminatedFrac = 0.5

  /** Per-doc 3-shingle overlap with the `benchSource` docs' shingle set.
    * Output: doc_id, n_sh (distinct shingles), n_hit (of those, how many
    * appear anywhere in the benchmark), overlap_frac, contaminated. */
  def overlap(docs: DataFrame, benchSource: String = "src0"): DataFrame = {
    val benchSh = Dedup.shingles(docs.filter(col("source") === benchSource))
      .select("sh").distinct().withColumn("hit", lit(1))
    val corpusSh = Dedup.shingles(docs.filter(col("source") =!= benchSource))
    // One corpus shingle pass: LEFT join against the (distinct) benchmark
    // set — multiplicity stays 1 — then a single per-doc aggregate counts
    // totals and hits together. A semi-join + separate total count would
    // shingle the corpus twice on different exchange keys (no reuse).
    corpusSh.join(benchSh, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_hit"))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_sh").cast("double"), 4))
      .withColumn("contaminated",
        (col("overlap_frac") >= ContaminatedFrac).cast("int"))
      .orderBy(col("doc_id"))
  }
}
