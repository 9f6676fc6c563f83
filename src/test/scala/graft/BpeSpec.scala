package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Bpe

/** BPE merge training: the double-space separator invariant that makes one
  * `replace` pass merge every disjoint adjacent occurrence, and the merge
  * chain on a hand-computable corpus. */
class BpeSpec extends SparkSpec {

  test("boundary-anchored replace merges back-to-back pairs and keeps the invariant") {
    import spark.implicits._
    val cases = Seq(
      (" a  a  a  a ", " a  a ", " aa ", " aa  aa "),   // disjoint pairs both merge
      (" a  a  a ", " a  a ", " aa ", " aa  a "),       // greedy leftmost on odd runs
      (" x  a  b  y ", " a  b ", " ab ", " x  ab  y "), // interior, neighbors intact
      (" ab  a  b ", " a  b ", " ab ", " ab  ab "),     // 'ab' token != (a, b) pair
      (" a  ba ", " a  b ", " ab ", " a  ba "))         // right boundary respected
    cases.toDF("s", "find", "repl", "want")
      .select(expr("replace(s, find, repl)").as("got"), col("want"))
      .collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("merge chain on a hand-computed corpus") {
    import spark.implicits._
    // histogram: aa -> 1, ab -> 3. Step 1: pairs (a,a):1, (a,b):3 -> merge
    // (a,b). Step 2: only (a,a):1 remains -> merge (a,a).
    val docs = Seq((0L, "aa ab"), (1L, "ab ab")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, steps = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((1, "a", "b", 3L), (2, "a", "a", 1L)))
    CacheScope.unpersistAll()
  }

  test("merges fails fast when steps exceed the corpus's supported merges") {
    import spark.implicits._
    // after (a,b) and (a,a) every word is a single token — step 3's pair
    // table is empty, which must THROW, not emit a null winner that
    // silently null-poisons every downstream token state
    val docs = Seq((0L, "aa ab"), (1L, "ab ab")).toDF("doc_id", "text")
    val ex = intercept[Exception] { Bpe.merges(docs, steps = 3).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("supports fewer than 3 merges")),
      s"expected the fail-fast BPE error, got: $ex")
    CacheScope.unpersistAll()
  }

  test("encode on the hand-computed corpus: token counts track the merge depth") {
    import spark.implicits._
    val docs = Seq((0L, "aa ab"), (1L, "ab ab")).toDF("doc_id", "text")
    // steps=2 merges (a,b) then (a,a): every word is one token
    val full = Bpe.encode(docs, steps = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(full === Seq((0L, 2L, 4L, 2L, 2.0), (1L, 2L, 4L, 2L, 2.0)))
    CacheScope.unpersistAll()
    // steps=1 merges only (a,b): 'aa' stays two tokens
    val one = Bpe.encode(docs, steps = 1).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(one === Seq((0L, 3L), (1L, 2L)))
    CacheScope.unpersistAll()
  }

  test("fertility rolls encode up per source with exact token/word ratios") {
    import spark.implicits._
    // steps=2 merges (a,b) then (a,a): every word is one token, so
    // fertility = 1.0 everywhere; srcA has 2 words (4 chars), srcB 2 words
    val docs = Seq((0L, "aa ab", "srcA"), (1L, "ab ab", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = Bpe.fertility(docs, steps = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(out === Seq(("srcA", 2L, 4L, 2L, 1.0, 2.0),
      ("srcB", 2L, 4L, 2L, 1.0, 2.0)))
    CacheScope.unpersistAll()
    // steps=1 merges only (a,b): 'aa' stays two tokens -> srcA fertility 1.5
    val one = Bpe.fertility(docs, steps = 1).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toSeq
    assert(one === Seq(("srcA", 1.5), ("srcB", 1.0)))
    CacheScope.unpersistAll()
  }

  test("encodeFrozen replays trained merges on unseen delta words") {
    import spark.implicits._
    // train: merges (a,b) then (a,a). Delta doc has a seen word ('ab'),
    // a fully-mergeable seen word ('aa'), and an UNSEEN word ('ba') on
    // which both merges are no-ops -> 2 char tokens.
    val train = Seq((0L, "aa ab"), (1L, "ab ab")).toDF("doc_id", "text")
    val delta = Seq((2L, "ab ba aa")).toDF("doc_id", "text")
    val out = Bpe.encodeFrozen(train, delta, steps = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out === Seq((2L, 3L, 6L, 4L, 1.5)))
    CacheScope.unpersistAll()
  }

  test("PROPERTY: spaced-string replace == greedy leftmost list merge") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the reference semantics: one merge pass consumes disjoint adjacent
    // (l, r) occurrences left to right
    def refMerge(ts: List[String], l: String, r: String): List[String] =
      ts match {
        case a :: b :: rest if a == l && b == r => (a + b) :: refMerge(rest, l, r)
        case a :: rest                          => a :: refMerge(rest, l, r)
        case Nil                                => Nil
      }
    // adversarial alphabet: tokens that concatenate into each other
    val tok = Gen.oneOf("a", "b", "aa", "ab", "ba", "aab")
    val gen = for {
      n  <- Gen.chooseNum(1, 12)
      ts <- Gen.listOfN(n, tok)
      l  <- tok; r <- tok
    } yield (ts, l, r)
    val prop = Prop.forAll(gen) { case (ts, l, r) =>
      val spaced = " " + ts.mkString("  ") + " "
      // String.replace is literal leftmost non-overlapping — the same
      // semantics as Spark's replace() (parity pinned by the fixture
      // cases above)
      val got = spaced.replace(s" $l  $r ", s" $l$r ")
      val want = " " + refMerge(ts, l, r).mkString("  ") + " "
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("MaxSteps contract is enforced: a vocab-scale steps ask is refused") {
    import graft.model.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the merge loop schedules one driver iteration per merge — the bound
    // is the op's explicit scale contract, not a soft default
    val e = intercept[IllegalArgumentException] {
      Bpe.merges(docs, steps = Bpe.MaxSteps + 1)
    }
    assert(e.getMessage.contains("MaxSteps"))
    val e2 = intercept[IllegalArgumentException] {
      Bpe.encodeFrozen(docs, docs, steps = 32768)
    }
    assert(e2.getMessage.contains("MaxSteps"))
  }

  test("five merges on sf0.001 documents are deterministic across reruns") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.merges(docs).collect().map(_.toSeq).toSeq
    CacheScope.unpersistAll()
    val b = Bpe.merges(docs.repartition(7)).collect().map(_.toSeq).toSeq
    CacheScope.unpersistAll()
    assert(a === b) // partition layout cannot change the merge table
    assert(a.size === Bpe.Steps)
  }

  test("batched merges == sequential where the round's picks don't interact") {
    import spark.implicits._
    // pairs (a,b):3 and (c,d):2 are token-disjoint and no created pair
    // can out-count them — one batched round of 2 must equal the first
    // 2 sequential merges exactly
    val docs = Seq((0L, "ab ab ab"), (1L, "cd cd")).toDF("doc_id", "text")
    val seqm = Bpe.merges(docs, steps = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    CacheScope.unpersistAll()
    val bat = Bpe.mergesBatched(docs, rounds = 1, m = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    CacheScope.unpersistAll()
    assert(bat === Seq((1, 1, "a", "b", 3L), (1, 2, "c", "d", 2L)))
    assert(bat.map(t => (t._3, t._4, t._5)) === seqm)
  }

  test("batched merges postpone token-sharing picks to the next round " +
      "(the documented divergence from the sequential chain)") {
    import spark.implicits._
    // pairs (a,b):3 and (b,c):2 share token b: round 1 keeps only the
    // higher-ranked (a,b); (b,c) is postponed and wins round 2 — the
    // sequential chain would have merged both in steps 1-2
    val docs = Seq((0L, "ab ab ab"), (1L, "bc bc")).toDF("doc_id", "text")
    val bat = Bpe.mergesBatched(docs, rounds = 2, m = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    CacheScope.unpersistAll()
    assert(bat === Seq((1, 1, "a", "b", 3L), (2, 1, "b", "c", 2L)))
    // the conflict rule is NON-greedy: within one word ' a  b  c  d ',
    // (b,c) is dropped by (a,b), and (c,d) is dropped by the DROPPED
    // (b,c) — deterministic and oracle-replicable; (c,d)'s chance comes
    // next round, where (ab,c) outranks it on the l tiebreak
    val chain = Seq((0L, "abcd abcd")).toDF("doc_id", "text")
    val bat2 = Bpe.mergesBatched(chain, rounds = 2, m = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    CacheScope.unpersistAll()
    assert(bat2 === Seq((1, 1, "a", "b", 2L), (2, 1, "ab", "c", 2L)))
  }

  test("a dried-up batched round is a no-op, not a poison") {
    import spark.implicits._
    // two merges exhaust this corpus; the remaining rounds emit nothing
    // and leave the state fixed (unlike the sequential chain, which
    // fails fast — a mid-CHAIN null winner would poison later steps,
    // but a batched round composes through an empty merge list safely)
    val docs = Seq((0L, "aa ab"), (1L, "ab ab")).toDF("doc_id", "text")
    val bat = Bpe.mergesBatched(docs, rounds = 3, m = 1).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getString(3))).toSeq
    CacheScope.unpersistAll()
    assert(bat === Seq((1, "a", "b"), (2, "a", "a")))
  }

  test("batched rounds bound is enforced like MaxSteps") {
    import spark.implicits._
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.mergesBatched(docs, rounds = Bpe.MaxSteps + 1)
    }
    assert(e.getMessage.contains("MaxSteps"))
  }
}
