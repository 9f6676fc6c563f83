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

  /** U2 — the chatbot's fuzzy question-preprocessing (src/llm_cypher.py:41-57):
    * tokenize the question, and for each non-stopword token of ≥3 chars find
    * the best-matching student name above a threshold. The reference loops
    * tokens client-side over a collected name list; here it's one vectorized
    * plan: explode(tokens) × names → score → per-token top-1 as an
    * AGGREGATE (`min_by` over the (-score, name) ordering key = max score,
    * min name on ties — identical to the previous row_number ordering),
    * not a window: a `row_number().over(partitionBy(token))` funnels every
    * score for a token through ONE task, while min_by keeps map-side
    * partial aggregation — each task reduces to one candidate per token
    * before the shuffle. */
  def correctTokens(
      students: DataFrame, question: String,
      threshold: Double = 75.0): DataFrame = {
    val stop = Seq("the", "a", "an", "of", "and", "who", "what", "is", "are",
      "in", "on", "with", "find", "show")
    val tokens = students.sparkSession.range(1)
      .select(explode(split(lower(lit(question)), " ")).as("token"))
      .filter(length(col("token")) >= 3 && !col("token").isin(stop: _*))
    tokens.crossJoin(students.select(col("name")))
      .withColumn("score", levRatio(col("name"), col("token")))
      .groupBy(col("token"))
      .agg(min_by(struct(col("name"), col("score")),
        struct(negate(col("score")), col("name"))).as("best"))
      .filter(col("best.score") >= threshold)
      .select(col("token"), col("best.name").as("corrected"),
        col("best.score").as("score"))
      .orderBy(col("token"))
  }

  /** Top-k fuzzy search with the reference's defaults (threshold 70, limit 10,
    * student_service.py:230). `scoreCol` lets callers pick the scorer:
    * [[levRatio]] (oracle-checkable) or the exact rapidfuzz-parity
    * `indel_ratio` expression (graft.functions.IndelRatio).
    *
    * Projection parity: the reference returns the FULL StudentDetail per hit
    * (student_service.py:244-266), so every student column rides along with
    * the score (the score itself is kept — it orders the cut and the
    * reference sorts by it before dropping it). */
  def topK(
      students: DataFrame, query: String,
      scoreOf: Column => Column,
      threshold: Double = 70.0, k: Int = 10): DataFrame =
    students
      .withColumn("score", scoreOf(col("name")))
      .filter(col("score") >= threshold)
      .orderBy(desc("score"), col("id")) // id tiebreak → deterministic top-k
      .limit(k)
}
