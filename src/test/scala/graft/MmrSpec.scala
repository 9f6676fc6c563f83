package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** MMR diversified top-k ([[Similarity.mmrRerank]]): the greedy must
  * demote a near-duplicate of an already-selected hit below a less
  * relevant but diverse candidate — the behavior pure relevance ranking
  * cannot produce, proved on a hand-computed fixture. */
class MmrSpec extends SparkSpec {

  test("near-duplicate of the top hit is demoted below the diverse candidate") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, false),
      StructField("label", IntegerType, false),
      StructField("embedding", ArrayType(FloatType), false)))
    def v(xs: Double*) = xs.map(_.toFloat)
    // anchor 0 = e1; A(1) most relevant; B(2) a near-copy of A, slightly
    // less relevant; C(3) diverse (negative second component), less
    // relevant than both. Pure relevance: A, B, C. MMR (λ=0.7):
    //   step 2: B scores .7·.898 − .3·sim(B,A≈1.0) ≈ 0.329
    //           C scores .7·.895 − .3·sim(C,A≈0.611) ≈ 0.443 → C wins
    val emb = spark.createDataFrame(Seq(
      Row(0L, 0, v(1.0, 0.0, 0.0, 0.0)),
      Row(1L, 0, v(0.9, 0.4359, 0.0, 0.0)),
      Row(2L, 0, v(0.898, 0.44, 0.0, 0.0)),
      Row(3L, 0, v(0.895, -0.446, 0.0, 0.0))
    ).asJava, schema)
    val got = Similarity.mmrRerank(emb, anchorId = 0L, shortlist = 30, k = 3)
      .select(col("rank"), col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === Seq((1, 1L), (2, 3L), (3, 2L)),
      s"MMR did not diversify: $got")
    // control: pure relevance would have ordered A, B, C
    val rel = Similarity.bruteForceTopK(emb, nQueries = 1, k = 3)
      .select(col("rank"), col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rel === Seq((1, 1L), (2, 2L), (3, 3L)))
  }
}
