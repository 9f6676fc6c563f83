package graft

import org.apache.spark.sql.functions._

import graft.functions.IndelRatio

/** rapidfuzz `fuzz.ratio` parity goldens (values from rapidfuzz's published
  * docs/semantics: 100*(1 - indel/(m+n)), indel = m+n-2*LCS). */
class IndelRatioSpec extends SparkSpec {

  test("scalar goldens") {
    assert(IndelRatio.ratio("", "") === 100.0)
    assert(IndelRatio.ratio("abc", "") === 0.0)
    assert(IndelRatio.ratio("abcd", "abcd") === 100.0)
    // rapidfuzz doc example: fuzz.ratio("this is a test", "this is a test!")
    assert(math.abs(IndelRatio.ratio("this is a test", "this is a test!") - 96.55172413793103) < 1e-9)
    // kitten/sitting: LCS=4 ("ittn"), indel=5, 100*(1-5/13)
    assert(math.abs(IndelRatio.ratio("kitten", "sitting") - 100.0 * (1 - 5.0 / 13)) < 1e-9)
    assert(math.abs(IndelRatio.ratio("aayush", "ayush") - 100.0 * (1 - 1.0 / 11)) < 1e-9)
    // substitutions cost 2 under indel (≠ levenshtein): abc→abd LCS=2, indel=2
    assert(math.abs(IndelRatio.ratio("abc", "abd") - 100.0 * (1 - 2.0 / 6)) < 1e-9)
  }

  test("expression works in a plan (codegen path) and is null-safe") {
    IndelRatio.register(spark)
    val df = spark.sql(
      "SELECT indel_ratio('aayush', 'ayush') AS r, indel_ratio(NULL, 'x') AS n")
    val row = df.collect().head
    assert(math.abs(row.getDouble(0) - 100.0 * (1 - 1.0 / 11)) < 1e-9)
    assert(row.isNullAt(1))
  }

  test("matches DuckDB-checkable levenshtein ratio on equal-cost cases") {
    // Pure insert/delete cases where indel == levenshtein distance.
    val lev = spark.sql("SELECT levenshtein('aayush', 'ayush') AS d")
      .collect().head.getAs[Number]("d").longValue
    assert(lev === 1L)
  }
}
