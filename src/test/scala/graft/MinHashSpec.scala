package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Dedup

/** The native single-pass MinHashSigs expression must equal the
  * explode-shingles → groupBy → min(md5) dataflow form on real documents
  * (and on the short-text / null-word edges the dataflow form defines). */
class MinHashSpec extends SparkSpec {

  private def sigMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getLong(0) -> (0 until Dedup.NumHashes).map(i => r.getString(i + 1))
    }.toMap

  test("expression signature == dataflow signature on sf0.001 documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaExpr = sigMap(Dedup.minhashSignature(docs))
    val viaFlow = sigMap(Dedup.minhashSignatureOf(Dedup.shingles(docs)))
    assert(viaExpr.size === viaFlow.size)
    assert(viaExpr === viaFlow)
  }

  test("verifySliver toggle: sliver-restricted verify == full-view verify") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Dedup.ngramJaccard(docs).collect().map(_.toSeq)
    spark.conf.set("spark.graft.verifySliver", "true")
    val sliver =
      try Dedup.ngramJaccard(docs)
      finally spark.conf.unset("spark.graft.verifySliver")
    assert(sliver.collect().map(_.toSeq).toSeq === full.toSeq,
      "the candidate-sliver verify path diverged from the full-view verify")
    // the sliver plan actually restricts: a LeftSemi join must be present
    assert(sliver.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "verifySliver=true built no semi-join restriction")
    CacheScope.unpersistAll()
  }

  test("short texts (<3 words) hash the whole text as one shingle") {
    import spark.implicits._
    val docs = Seq((1L, "two words"), (2L, "one"), (3L, "")).toDF("doc_id", "text")
    val viaExpr = sigMap(Dedup.minhashSignature(docs))
    val viaFlow = sigMap(Dedup.minhashSignatureOf(Dedup.shingles(docs)))
    assert(viaExpr === viaFlow)
    // the single-shingle min IS md5("i|" ++ text) — pin h0 directly
    val h0 = org.apache.commons.codec.digest.DigestUtils.md5Hex("0|two words")
    assert(viaExpr(1L).head === h0)
  }

  test("null words are skipped with no separator, matching concat_ws") {
    graft.functions.MinHashSigs.register(spark)
    val got = spark.sql(
      "SELECT minhash_sigs(array('a', CAST(NULL AS STRING), 'b', 'c', 'd')) AS a")
      .collect().head.getSeq[String](0)
    // windows (a,∅,b) (∅,b,c) (b,c,d) → concat_ws drops the null:
    val shingleSet = Seq("a b", "b c", "b c d")
    val expected = (0 until Dedup.NumHashes).map(i =>
      shingleSet.map(sh =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$i|$sh")).min)
    assert(got === expected)
  }
}
