package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SymSpell-style fuzzy join: match corrupted tokens to a vocabulary at
  * edit distance ≤ 1 WITHOUT an all-pairs levenshtein — candidates come
  * from a deletion-neighborhood equi-join (a token of length L expands
  * to L+1 keys: itself plus every single-character deletion; two tokens
  * within one edit share at least one key), then the tiny candidate set
  * is verified with exact levenshtein and the best match kept
  * (min distance, then alphabetical, per corrupted token).
  *
  * Shape at 100 TB: the expansion is a bounded (len+1)× row fan-out on
  * BOTH sides — linear, not quadratic — and the join is a plain
  * hash-equi on the deletion key. This is the blocking scheme that
  * makes fuzzy matching feasible at corpus scale; the brute-force
  * one-vs-all scorer ([[FuzzySearch]]) stays the per-query tool.
  *
  * The corrupted probe set is contract-derived (like [[Snapshot]]'s
  * old/new split): every 29th document contributes its first token of
  * length ≥ 4, with one character dropped at a doc_id-determined
  * position — so the oracle replays the corruption exactly.
  */
object FuzzyJoin {

  /** All single-character deletions of `c`, PLUS the token itself. */
  private def deletionKeys(c: Column): Column =
    array_union(
      array(c),
      transform(sequence(lit(0), length(c) - 1),
        i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c)))))

  /** Vocabulary: distinct tokens of length ≥ 4 across the corpus. */
  def vocabulary(docs: DataFrame): DataFrame =
    docs.select(explode(Dedup.words(col("text"))).as("token"))
      .filter(length(col("token")) >= 4)
      .distinct()

  /** Deterministic corrupted probes: first length ≥ 4 token of every
    * 29th doc, one char dropped at position doc_id/29 mod len. */
  def probes(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 29 === 0)
      .select(col("doc_id"),
        filter(Dedup.words(col("text")), w => length(w) >= 4)(0).as("orig"))
      .filter(col("orig").isNotNull)
      .withColumn("pos", pmod((col("doc_id") / 29).cast("long"), length(col("orig"))))
      .select(col("doc_id"),
        concat(col("orig").substr(lit(1), col("pos")),
          col("orig").substr(col("pos") + lit(2), length(col("orig"))))
          .as("corrupted"))

  /** The fuzzy join itself: probes × vocabulary at edit distance ≤ 1 via
    * deletion-key blocking; best match per probe. */
  def matchTokens(docs: DataFrame): DataFrame = {
    val vocabKeys = vocabulary(docs)
      .select(col("token"), explode(deletionKeys(col("token"))).as("k"))
    val probeKeys = probes(docs)
      .select(col("doc_id"), col("corrupted"),
        explode(deletionKeys(col("corrupted"))).as("k"))
    probeKeys.join(vocabKeys, "k")
      .select(col("doc_id"), col("corrupted"), col("token"),
        levenshtein(col("corrupted"), col("token")).as("dist"))
      .filter(col("dist") <= 1)
      .groupBy(col("doc_id"), col("corrupted"))
      .agg(min(struct(col("dist"), col("token"))).as("best"))
      .select(col("doc_id"), col("corrupted"),
        col("best.token").as("matched"), col("best.dist").as("dist"))
      .orderBy(col("doc_id"))
  }
}
