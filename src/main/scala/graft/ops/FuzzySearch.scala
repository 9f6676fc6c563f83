package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's fuzzy name search (fastapi/services/student_service.py:222-266
  * and src/llm_cypher.py:25-38): score every name against a query string,
  * threshold, return top-k. The reference collects ALL names to the client
  * and scores with rapidfuzz; here scoring runs inside the engine and top-k
  * plans as TakeOrderedAndProject — no full sort, no driver collect
  * (SURVEY.md §2.9 U1).
  */
object FuzzySearch {

  /** Levenshtein-normalized similarity 0–100 — built-in, codegen'd, and
    * exactly reproducible in DuckDB (`levenshtein`) for the oracle. */
  def levRatio(a: Column, b: Column): Column =
    round(
      (lit(1.0) -
        levenshtein(a, b).cast("double") /
          greatest(length(a), length(b)).cast("double")) * 100.0,
      4)

  /** Top-k fuzzy search with the reference's defaults (threshold 70, limit 10,
    * student_service.py:230). `scoreCol` lets callers pick the scorer:
    * [[levRatio]] (oracle-checkable) or the exact rapidfuzz-parity
    * `indel_ratio` expression (graft.functions.IndelRatio). */
  def topK(
      students: DataFrame, query: String,
      scoreOf: Column => Column,
      threshold: Double = 70.0, k: Int = 10): DataFrame =
    students
      .withColumn("score", scoreOf(col("name")))
      .filter(col("score") >= threshold)
      .select(col("id"), col("name"), col("score"))
      .orderBy(desc("score"), col("id")) // id tiebreak → deterministic top-k
      .limit(k)
}
