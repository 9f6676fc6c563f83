package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Curriculum staging ([[Sampling.curriculum]]): exact quartile cuts
  * (k = ceil(q·n)-th smallest, duplicates counted) and the
  * 1 + |{cuts < d}| stage rule, on a hand-enumerable fixture. */
class CurriculumSpec extends SparkSpec {

  test("8 docs of lengths 1..8 split into four 2-doc stages") {
    import spark.implicits._
    // doc k has k tokens; n = 8 -> cuts at the 2nd, 4th, 6th smallest
    // (= 2, 4, 6), so stages are {1,2}, {3,4}, {5,6}, {7,8}
    val docs = (1 to 8).map(k => (k.toLong, "s", Seq.fill(k)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Sampling.curriculum(docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      (1, "s", 2L, 3L, 1L, 2L),
      (2, "s", 2L, 7L, 3L, 4L),
      (3, "s", 2L, 11L, 5L, 6L),
      (4, "s", 2L, 15L, 7L, 8L)))
  }
}
