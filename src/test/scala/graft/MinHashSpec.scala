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

  test("componentsDelta: label takeover relabels old members; maintained " +
      "== from-scratch on the real corpus") {
    import spark.implicits._
    // standing corpus: docs 1 and 2 are exact dups (component 1), 7 is
    // unique; delta: doc 0 is another copy — its SMALLER id must take
    // over the component label, relabeling the old members 1 and 2
    // (the affected-components-only rewrite path); 5 joins the same
    // component; 8 is a singleton
    val dup = "alpha beta gamma delta epsilon"
    val index = Seq((1L, dup), (2L, dup), (7L, "seven unique words here now"))
      .toDF("doc_id", "text")
    val delta = Seq((0L, dup), (5L, dup), (8L, "eight other words live here"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.componentsDelta(index, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    CacheScope.unpersistAll()
    assert(got === Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 0L, 0), (5L, 0L, 0),
      (7L, 7L, 1), (8L, 8L, 1)))
    // the maintenance identity on real documents: maintained assignment
    // over the 80/20 split == nearDupComponents from scratch on the
    // whole corpus (the shared-oracle contract, asserted engine-side too)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val maintained = graft.ops.Dedup.componentsDelta(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0))
      .collect().map(_.toSeq).toSeq
    CacheScope.unpersistAll()
    val scratch = graft.ops.Dedup.nearDupComponents(docs)
      .collect().map(_.toSeq).toSeq
    CacheScope.unpersistAll()
    assert(maintained === scratch)
  }
}
