package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Decontam, Sampling, TextAnalysis, Windows}

/** Round-5 pipeline operators: text cleaning, hash-keyed dataset split,
  * and time-series gap-fill. The DuckDB oracle proves engine parity; these
  * specs pin the operator-level invariants the oracle can't express
  * (determinism across repartitioning, full roundtrip, fill density). */
class PipelineOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  test("textClean strips every tag and URL and recovers the original text") {
    val out = TextAnalysis.textClean(docs).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("roundtrip_ok") == 1))
    // n_clean strictly smaller than n_raw: the markup really was there
    assert(out.forall(r => r.getAs[Int]("n_clean") < r.getAs[Int]("n_raw")))
  }

  test("clean handles multiple tags/URLs per row and preserves inner text") {
    import spark.implicits._
    val rows = Seq(
      "<p>a</p> http://x.io/1 b <br/> https://y.io/2?q=1 c",
      "plain text stays",
      "  <a href=\"z\">link</a>  ").toDF("s")
      .select(TextAnalysis.clean(col("s")).as("c")).as[String].collect()
    assert(rows === Seq("a b c", "plain text stays", "link"))
  }

  test("hashSplit is a pure function of the id: stable across repartitioning") {
    val once = Sampling.hashSplit(docs).collect().toSeq
    val again = Sampling.hashSplit(docs.repartition(13)).collect().toSeq
    assert(once === again)
    // every bucket in [0,256), split thresholds honored
    assert(once.forall { r =>
      val b = r.getAs[Long]("bucket")
      val s = r.getAs[String]("split")
      b >= 0 && b < 256 &&
        s == (if (b < Sampling.TrainUpper) "train"
              else if (b < Sampling.ValUpper) "val" else "test")
    })
  }

  test("repetition flags a degenerate doc and clears a diverse one") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "spam spam spam spam spam spam"),          // one word repeated
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // all distinct
      (3L, "one")).toDF("doc_id", "text")             // single word, no bigrams
    val out = TextAnalysis.repetition(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("repetitive") == 1)
    assert(out(1L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(out(2L).getAs[Int]("repetitive") == 0)
    assert(out(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(out(3L).getAs[Double]("top_bigram_frac") == 0.0)
    // fractions are fractions
    val all = TextAnalysis.repetition(docs).collect()
    assert(all.forall { r =>
      Seq("dup_word_frac", "top_word_frac", "top_bigram_frac")
        .map(r.getAs[Double]).forall(f => f >= 0.0 && f <= 1.0)
    })
  }

  test("decontam flags an exact benchmark copy and clears disjoint text") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "src0"), // benchmark
      (2L, "the quick brown fox jumps over the lazy dog", "src1"), // verbatim leak
      (3L, "completely different words with zero shingle overlap here", "src1"))
      .toDF("doc_id", "text", "source")
    val out = Decontam.overlap(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(1L)) // benchmark docs are not scored
    assert(out(2L).getAs[Int]("contaminated") == 1 &&
      out(2L).getAs[Double]("overlap_frac") == 1.0)
    assert(out(3L).getAs[Int]("contaminated") == 0 &&
      out(3L).getAs[Long]("n_hit") == 0L)
  }

  test("pmiPairs surfaces glued pairs over frequent-but-independent ones") {
    import spark.implicits._
    // "aa bb" always co-occur (5 times, never apart); "cc dd" co-occur 5
    // times but each also appears alone often -> lower PMI
    val glue = (1 to 5).map(i => (i.toLong, "aa bb"))
    val indep = (6 to 10).map(i => (i.toLong, "cc dd"))
    val noise = (11 to 30).map(i =>
      (i.toLong, if (i % 2 == 0) "cc xx" else "dd yy"))
    val docs = (glue ++ indep ++ noise).toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(docs, k = 10, minCount = 5).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("a") == "aa" && top.getAs[String]("b") == "bb")
    val byPair = out.map(r =>
      (r.getAs[String]("a"), r.getAs[String]("b")) -> r.getAs[Double]("pmi")).toMap
    assert(byPair(("aa", "bb")) > byPair(("cc", "dd")))
  }

  test("lexicalDiversity: exact TTR and hapax fraction per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa bb", "srcA"), // 3 tokens, types {aa, bb}, hapax {bb}
      (2L, "cc cc cc cc", "srcB")) // 4 tokens, 1 type, 0 hapax
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.lexicalDiversity(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("srcA").getAs[Long]("n_tokens") == 3L)
    assert(out("srcA").getAs[Long]("n_types") == 2L)
    assert(out("srcA").getAs[Long]("n_hapax") == 1L)
    assert(out("srcA").getAs[Double]("ttr") == 0.6667)
    assert(out("srcA").getAs[Double]("hapax_frac") == 0.5)
    assert(out("srcB").getAs[Double]("ttr") == 0.25)
    assert(out("srcB").getAs[Long]("n_hapax") == 0L)
  }

  test("oovRate: tokens outside the top-V vocab accumulate per source") {
    import spark.implicits._
    // vocab of size 2 = {"aa", "bb"} (most frequent); srcB's "zz" is OOV
    val docs = Seq(
      (1L, "aa aa bb bb aa", "srcA"),
      (2L, "aa bb zz zz", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.oovRate(docs, vocabSize = 2).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("srcA").getAs[Long]("n_oov") == 0L)
    assert(out("srcA").getAs[Double]("oov_rate") == 0.0)
    assert(out("srcB").getAs[Long]("n_tokens") == 4L)
    assert(out("srcB").getAs[Long]("n_oov") == 2L)
    assert(out("srcB").getAs[Double]("oov_rate") == 0.5)
  }

  test("dsirScores tilts toward target-like docs, statelessly") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma alpha beta gamma alpha beta gamma", "src0"),
      (2L, "alpha beta gamma alpha beta gamma", "src1"), // target-like
      (3L, "zulu yankee xray whiskey victor uniform", "src1")) // off-target
      .toDF("doc_id", "text", "source")
    val out = Sampling.dsirScores(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(1L)) // target docs are not scored
    assert(out(2L).getAs[Long]("n_tokens") == 6L)
    assert(out(2L).getAs[Double]("dsir_score") >
      out(3L).getAs[Double]("dsir_score"))
    assert(out(2L).getAs[Int]("keep") == 1)
    assert(out(3L).getAs[Int]("keep") == 0)
  }

  test("decontam spans merges adjacent hits and scores partial coverage") {
    import spark.implicits._
    // bench doc carries two phrases; train doc 2 leaks BOTH, back to back
    // (one merged span); train doc 3 leaks one phrase mid-doc (one span,
    // partial coverage); train doc 4 is clean (absent from output).
    val fixture = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "src0"),
      (2L, "alpha beta gamma delta epsilon zeta", "src1"),
      (3L, "xx yy alpha beta gamma zz ww qq rr tt", "src1"),
      (4L, "totally clean words here nothing shared anywhere at all", "src1"))
      .toDF("doc_id", "text", "source")
    val out = Decontam.spans(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(1L) && !out.contains(4L))
    // doc 2: every position hits -> one span covering all 6 words
    assert(out(2L).getAs[Long]("n_spans") == 1L)
    assert(out(2L).getAs[Long]("covered_words") == 6L)
    assert(out(2L).getAs[Double]("cover_frac") == 1.0)
    // doc 3: only "alpha beta gamma" (pos 2) hits -> one 3-word span of 10
    assert(out(3L).getAs[Long]("n_spans") == 1L)
    assert(out(3L).getAs[Long]("covered_words") == 3L)
    assert(out(3L).getAs[Double]("cover_frac") == 0.3)
  }

  test("decontam spans splits hits separated by an uncovered gap") {
    import spark.implicits._
    // hits at pos 0 and pos 8: extents [0,2] and [8,10], gap > 0 -> 2 spans
    val fixture = Seq(
      (1L, "alpha beta gamma", "src0"),
      (2L, "delta epsilon zeta", "src0"),
      (3L, "alpha beta gamma f1 f2 f3 f4 f5 delta epsilon zeta", "src1"))
      .toDF("doc_id", "text", "source")
    val out = Decontam.spans(fixture).collect().head
    assert(out.getAs[Long]("n_spans") == 2L)
    assert(out.getAs[Long]("covered_words") == 6L)
    assert(out.getAs[Long]("n_words") == 11L)
  }

  test("piiRedact counts every injected pattern and leaves zero residual") {
    val out = TextAnalysis.piiRedact(docs).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("n_emails") == 1 &&
      r.getAs[Int]("n_ips") == 1 && r.getAs[Int]("n_phones") == 1 &&
      r.getAs[Int]("residual_pii") == 0))
  }

  test("stratifiedQuota takes min(quota, |source|) rows, stable across layout") {
    val quota = 10
    val out = Sampling.stratifiedQuota(docs, quota)
    val got = out.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(got.keySet === sizes.keySet)
    assert(got.forall { case (s, n) => n == math.min(quota.toLong, sizes(s)) })
    // pure function of the key set: identical under repartitioning
    assert(out.collect().toSeq ===
      Sampling.stratifiedQuota(docs.repartition(13), quota).collect().toSeq)
  }

  test("weightedMix keeps full-weight sources whole and is layout-stable") {
    val mixed = Sampling.weightedMix(docs)
    val out = mixed.collect().toSeq
    assert(out.nonEmpty)
    // full-weight sources (src<n> with n % 4 == 3 → keep_below = 256) lose nothing
    val fullSources = Sampling.sourceWeights(docs)
      .filter(col("keep_below") === 256)
      .collect().map(_.getAs[String]("source")).toSet
    assert(fullSources.nonEmpty)
    val perSourceIn = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val perSourceKept = mixed.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    fullSources.foreach(s => assert(perSourceKept.getOrElse(s, 0L) == perSourceIn(s)))
    // down-weighted sources never gain docs
    perSourceKept.foreach { case (s, n) => assert(n <= perSourceIn(s)) }
    // pure function of (doc_id, source): identical under repartitioning
    assert(out === Sampling.weightedMix(docs.repartition(13)).collect().toSeq)
  }

  test("epochMix: whole copies exact, fractional extras hash-deterministic, " +
      "drop and pass-through sources behave") {
    val epochs = Seq("src1" -> 2.25, "src2" -> 0.5, "src4" -> 0.0)
    val mixed = Sampling.epochMix(docs, epochs)
    val out = mixed.collect().toSeq
    val perSourceIn = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val perSourceOut = mixed.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    // dropped source emits nothing
    assert(perSourceOut.getOrElse("src4", 0L) === 0L)
    // unlisted sources pass through at exactly one epoch, copy_idx 0
    perSourceIn.keys.filterNot(Set("src1", "src2", "src4")).foreach { s =>
      assert(perSourceOut(s) === perSourceIn(s), s"source $s not 1-epoch")
    }
    assert(mixed.filter(col("source") === "src3" && col("copy_idx") =!= 0)
      .count() === 0)
    // src1 at 2.25: every doc twice, plus a hash-selected extra — count
    // is n·2 + |bucket < 64|, and every doc has copy_idx 0 and 1
    val n1 = perSourceIn("src1")
    val extras = docs.filter(col("source") === "src1")
      .filter(Sampling.bucket256("epoch", col("doc_id")) < 64).count()
    assert(perSourceOut("src1") === n1 * 2 + extras)
    assert(mixed.filter(col("source") === "src1" && col("copy_idx") === 1)
      .count() === n1)
    assert(mixed.filter(col("source") === "src1" && col("copy_idx") === 2)
      .count() === extras)
    // src2 at 0.5: the bucket<128 half survives once
    val kept2 = docs.filter(col("source") === "src2")
      .filter(Sampling.bucket256("epoch", col("doc_id")) < 128).count()
    assert(perSourceOut.getOrElse("src2", 0L) === kept2)
    // pure function of (doc_id, source): identical under repartitioning
    assert(out === Sampling.epochMix(docs.repartition(13), epochs).collect().toSeq)
    // out-of-range targets refused
    intercept[IllegalArgumentException](
      Sampling.epochMix(docs, Seq("src1" -> 17.0)))
  }

  test("chunks reassemble to the normalized document, all full but the tail") {
    val k = TextAnalysis.ChunkTokens
    val rejoined = TextAnalysis.chunks(docs)
      .groupBy("doc_id")
      .agg(
        // order inside the agg: collect_list has no cross-partition order
        expr("array_join(transform(array_sort(collect_list(struct(chunk_idx, chunk))), " +
          "s -> s.chunk), ' ')").as("rejoined"),
        sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_tokens") =!= k, 1).otherwise(0)).as("ragged"))
    val orig = docs.select(col("doc_id"),
      graft.ops.Dedup.normText(col("text")).as("nt"),
      size(graft.ops.Dedup.words(col("text"))).as("n_tok"))
    val joined = rejoined.join(orig, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("rejoined") === r.getAs[String]("nt"))
      assert(r.getAs[Long]("total_tokens") === r.getAs[Int]("n_tok").toLong)
      assert(r.getAs[Long]("n_chunks") ===
        (r.getAs[Int]("n_tok") + k - 1) / k)
      assert(r.getAs[Long]("ragged") <= 1) // at most the tail is short
    }
  }

  test("qualityRank: per-source percent ranks replay exactly") {
    val out = TextAnalysis.qualityRank(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (src, rows) =>
      val n = rows.length
      rows.foreach { case (id, _, ratio, rank) =>
        val want =
          if (n == 1) 0.0
          else BigDecimal(rows.count(_._3 < ratio).toDouble / (n - 1))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(rank === want, s"doc $id in $src")
      }
      // calibration property: the worst doc(s) rank 0.0 always; the best
      // ranks 1.0 when it is untied (ties share the lower rank)
      if (n > 1) {
        assert(rows.filter(r => r._3 == rows.map(_._3).min).forall(_._4 == 0.0))
        val mx = rows.map(_._3).max
        if (rows.count(_._3 == mx) == 1)
          assert(rows.find(_._3 == mx).get._4 === 1.0)
      }
    }
  }

  test("langIdMixed: majority replays from per-chunk votes; flags are consistent") {
    import graft.ops.Dedup
    // independent replay: chunk the words locally, vote with the same
    // stopword-argmax + tie order, take the majority (votes desc, lang asc)
    val stops = Map(
      "en" -> Set("the", "a", "of", "and"), "de" -> Set("der", "die", "und", "das"),
      "fr" -> Set("le", "et", "les", "une"), "es" -> Set("el", "y", "los", "una"))
    val order = Seq("en", "de", "fr", "es")
    val words = docs.select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val out = TextAnalysis.langIdMixed(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, lang, nMaj, nCh) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val votes = words(id).grouped(TextAnalysis.ChunkTokens).map { cw =>
        val h = order.map(l => l -> cw.count(stops(l))).toMap
        order.find(l => order.forall(o =>
          h(l) > h(o) || (h(l) == h(o) && order.indexOf(l) <= order.indexOf(o)))).get
      }.toSeq
      val want = votes.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      assert(nCh === votes.size.toLong, s"doc $id chunk count")
      assert(lang === want._1 && nMaj === want._2.toLong, s"doc $id majority")
      assert(r.getInt(5) === (if (nMaj < nCh) 1 else 0), s"doc $id mixed flag")
    }
    // the synthetic corpus is strictly single-language (verified: every
    // doc votes pure at sf0.001 AND sf0.01) — so the mixed path is
    // exercised on a constructed bilingual doc instead: an English page
    // with an embedded Spanish passage must flag mixed while its pure
    // twin stays clean, and doc-level langId on the SAME mixed doc shows
    // why the chunk vote exists (the global argmax hides the passage)
    assert(out.forall(_.getInt(5) === 0), "synthetic corpus assumed pure")
    import spark.implicits._
    val en = Seq.fill(16)("the cat of a dog and the end").mkString(" ")   // 128 en tokens
    val es = Seq.fill(8)("el gato y los perros una casa").mkString(" ")   // 56 es tokens
    val mixed = Seq((1L, en + " " + es, "en", "src0", 1L),
        (2L, en, "en", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.langIdMixed(mixed).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(5)))).toMap
    assert(got(1L) === (("en", 1)), "embedded Spanish passage not flagged")
    assert(got(2L) === (("en", 0)), "pure doc falsely flagged")
    val docLevel = TextAnalysis.langId(mixed).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    assert(docLevel(1L) === "en", "doc-level argmax should hide the passage")
  }

  test("thresholdSweep: counts replay from the pair list and fall monotonically") {
    import graft.ops.Dedup
    val pairs = Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val out = Dedup.thresholdSweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Dedup.SweepThresholds)
    out.foreach { case (t, nPairs, nDocs) =>
      val surv = pairs.filter(_._3 >= t)
      assert(nPairs === surv.length.toLong, s"pairs at $t")
      assert(nDocs === surv.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong,
        s"docs at $t")
    }
    // the audit's point: both curves are non-increasing in t
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.reverse.toSeq)
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.reverse.toSeq)
    CacheScope.unpersistAll()
  }

  test("leakageSafeSplit: one split per component; singletons match hashSplit") {
    val out = Sampling.leakageSafeSplit(docs).collect()
    assert(out.nonEmpty)
    // split integrity: every near-dup component is wholly in ONE split
    out.groupBy(_.getLong(1)).foreach { case (comp, rows) =>
      assert(rows.map(_.getString(3)).toSet.size === 1,
        s"component $comp straddles splits")
    }
    // docs WITH near-duplicates exist in the fixture and move as groups
    assert(out.groupBy(_.getLong(1)).exists(_._2.length > 1))
    // singleton docs (component == doc_id and nothing else in it) keep the
    // doc-keyed assignment: adopting the safe split changes nothing for them
    val plain = Sampling.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val sizes = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val singles = out.filter(r =>
      r.getLong(0) == r.getLong(1) && sizes(r.getLong(1)) == 1)
    assert(singles.nonEmpty)
    singles.foreach { r =>
      assert(r.getString(3) === plain(r.getLong(0)),
        s"singleton ${r.getLong(0)} moved splits")
    }
  }

  test("chunksOverlap: every chunk is the exact token window, coverage is total") {
    val k = TextAnalysis.ChunkTokens
    val st = TextAnalysis.ChunkStride
    val words = docs.select(col("doc_id"),
        graft.ops.Dedup.words(col("text")).as("w")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val out = TextAnalysis.chunksOverlap(docs).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rows) =>
      val w = words(id)
      val expectWindows = 1 + math.max(0, math.ceil((w.size - k) / st.toDouble).toInt)
      assert(rows.length === expectWindows, s"doc $id window count")
      rows.foreach { r =>
        val i = r.getInt(1)
        val want = w.slice(i * st, i * st + k)
        assert(r.getString(2) === want.mkString(" "), s"doc $id chunk $i content")
        assert(r.getInt(3) === want.size)
      }
      // total coverage: the last window reaches the final token
      val lastStart = (expectWindows - 1) * st
      assert(lastStart + k >= w.size, s"doc $id tail uncovered")
      // consecutive full windows overlap by exactly k - stride tokens
      if (rows.length > 1 && w.size >= k + st) {
        val c0 = rows.find(_.getInt(1) == 0).get.getString(2).split(" ")
        val c1 = rows.find(_.getInt(1) == 1).get.getString(2).split(" ")
        assert(c0.drop(st).toSeq === c1.take(k - st).toSeq, s"doc $id overlap")
      }
    }
  }

  test("nearDupComponents: verified pairs share components, keepers are minima") {
    import spark.implicits._
    // identical texts guarantee LSH collision (equal signatures) and
    // jaccard 1.0 — a deterministic 3-doc cluster plus a singleton
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fixture = Seq(
      (10L, t), (11L, t), (12L, t),
      (20L, "totally unrelated words with no shingle overlap at all here"))
      .toDF("doc_id", "text")
    val comp = graft.ops.Dedup.nearDupComponents(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Int]("is_keeper"))).toMap
    assert(comp(10L) == (10L, 1) && comp(11L) == (10L, 0) && comp(12L) == (10L, 0))
    assert(comp(20L) == (20L, 1))
    // real corpus: every verified pair is intra-component; component ids
    // are their own members' minimum; exactly one keeper per component
    val out = graft.ops.Dedup.nearDupComponents(docs).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    graft.ops.Dedup.ngramJaccard(docs).filter(col("jaccard") >= 0.5)
      .collect().foreach { r =>
        assert(byDoc(r.getAs[Long]("src")) === byDoc(r.getAs[Long]("dst")))
      }
    val members = byDoc.groupBy(_._2).view.mapValues(_.keys.min).toMap
    members.foreach { case (compId, minMember) => assert(compId === minMember) }
    assert(out.count(_.getAs[Int]("is_keeper") == 1) === members.size)
  }

  test("nearDupTriangles: cliques count, chains and singletons are zero") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fixture = Seq(
      (10L, t), (11L, t), (12L, t), // identical triple → one triangle
      (20L, "totally unrelated words with no shingle overlap at all here"))
      .toDF("doc_id", "text")
    val tri = graft.ops.Dedup.nearDupTriangles(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("triangles")).toMap
    assert(tri === Map(10L -> 1, 11L -> 1, 12L -> 1, 20L -> 0))
  }

  test("incrementalNearDup == the cross-split slice of the full-corpus verify") {
    // band keys are per-document properties, so a delta×index band
    // collision is exactly a full-corpus collision that crosses the split;
    // the verified incremental pairs must therefore equal the cross-split
    // subset of ngramJaccard's verified pairs (orientation normalized)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val index = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = graft.ops.Dedup.incrementalNearDup(index, delta).collect()
      .map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("index_id"),
        r.getAs[Double]("jaccard"))).toSet
    val full = graft.ops.Dedup.ngramJaccard(docs)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[Double]("jaccard")))
      .collect {
        case (s, d, j) if s % 5 == 0 && d % 5 != 0 => (s, d, j)
        case (s, d, j) if d % 5 == 0 && s % 5 != 0 => (d, s, j)
      }.toSet
    assert(inc === full)
    // and a fresh exact duplicate of an index doc is flagged at jaccard 1.0
    import spark.implicits._
    val idx = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "completely different content with other words here")).toDF("doc_id", "text")
    val dup = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val hits = graft.ops.Dedup.incrementalNearDup(idx, dup).collect()
    assert(hits.length === 1 &&
      hits.head.getAs[Long]("index_id") === 1L &&
      hits.head.getAs[Double]("jaccard") === 1.0)
  }

  test("pivot -> unpivot roundtrips to the direct long-form counts") {
    val events = Tables.events(spark, sfDir)
    val long = SparkEntry.queries("w7_unpivot")(spark, sfDir)
    // melting the wide table recovers every non-zero direct count...
    val direct = events
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val melted = long.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    direct.foreach { case (k, n) => assert(melted(k) === n) }
    // ...and the zero-filled remainder is exactly the missing combinations
    assert(melted.count(_._2 == 0L) === melted.size - direct.size)
  }

  test("qualityGate keeps exactly the at-or-above-source-p25 slice") {
    val docs = Tables.documents(spark, sfDir)
    val kept = TextAnalysis.qualityGate(docs)
    // every kept row satisfies its own threshold, thresholds are per-source
    assert(kept.filter(col("stop_ratio") < col("thr")).count() === 0)
    // p25 gate keeps at least 75% of every source (ties can keep more)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy("source").count().collect().foreach { r =>
      val (src, n) = (r.getString(0), r.getLong(1))
      assert(n >= perSource(src) * 3 / 4, s"$src kept only $n/${perSource(src)}")
      assert(n < perSource(src), s"$src gate kept everything — vacuous")
    }
  }

  test("profile: one row per column, stats replay against direct queries") {
    val orders = Tables.orders(spark, sfDir)
    val p = graft.ops.Profile.ordersProfile(orders)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.size === 5)
    val n = orders.count()
    p.values.foreach(r => assert(r.getLong(1) === n))
    assert(p("o_custkey").getLong(3) ===
      orders.select("o_custkey").distinct().count())
    assert(p("o_orderstatus").isNullAt(6), "string column has no mean")
    assert(p("o_totalprice").getString(4).toDouble ===
      orders.agg(min("o_totalprice")).head().getDouble(0))
  }

  test("labelCentroids: aggregator buffers == the exploded groupBy shape") {
    val emb = Tables.embeddings(spark, sfDir)
    val viaAgg = graft.ops.Centroids.labelCentroids(emb)
    // the 64×-row reference shape the aggregator exists to avoid
    val viaExplode = emb
      .select(col("label"), posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long"))).as(Seq("dim", "q")))
      .groupBy(col("label"), col("dim"))
      .agg(round(sum(col("q")).cast("double") / (lit(1000.0) * count(lit(1))), 6)
        .as("centroid"), count(lit(1)).as("n"))
    assert(viaAgg.exceptAll(viaExplode).isEmpty &&
      viaExplode.exceptAll(viaAgg).isEmpty)
    // sanity: every label present, all dims covered
    assert(viaAgg.select("label").distinct().count() ===
      emb.select("label").distinct().count())
    assert(viaAgg.groupBy("label").count().filter(col("count") =!= 64).count() === 0)
  }

  test("kmeansAssign: every vector lands on its exact-arithmetic argmin centroid") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = graft.ops.Centroids.kmeansAssign(emb)
    assert(out.count() === emb.count())
    // replay one vector's distances by hand against the centroid table
    val cent = graft.ops.Centroids.labelCentroids(emb)
      .collect().groupBy(_.getInt(0)).map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(r =>
          math.round(r.getDouble(2) * 1000000.0))
      }
    val probe = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).collect().head
    val xq = probe.getSeq[Float](1).map(x =>
      math.round(x.toDouble * 1000) * 1000L)
    val best = cent.map { case (l, c) =>
      (xq.zip(c).map { case (x, ci) => val d = x - ci; d * d }.sum, l)
    }.min
    val got = out.filter(col("vec_id") === probe.getLong(0))
      .select("assigned").head().getInt(0)
    assert(got === best._2)
    // labels are only weakly cluster-correlated in the synthetic data, so
    // churn is high — but the own-centroid pull must beat the 1/k chance
    // rate (10%) by a wide margin, and SOME vectors must move
    val stayedFrac = 1.0 - out.filter(col("moved")).count().toDouble / emb.count()
    assert(stayedFrac > 0.2 && stayedFrac < 1.0, s"implausible stay rate $stayedFrac")
  }

  test("pqCodes: 8 codes per vector; sub-0 code replays by hand") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = graft.ops.Centroids.pqCodes(emb)
    assert(out.count() === emb.count() * 8)
    assert(out.groupBy("vec_id").count().filter(col("count") =!= 8).count() === 0)
    val cent = graft.ops.Centroids.labelCentroids(emb)
      .filter(col("dim") < 8).collect()
      .groupBy(_.getInt(0)).map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(r => math.round(r.getDouble(2) * 1000000.0))
      }
    val probe = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).collect().head
    val xs = probe.getSeq[Float](1).take(8).map(x =>
      math.round(x.toDouble * 1000) * 1000L)
    val best = cent.map { case (l, c) =>
      (xs.zip(c).map { case (x, ci) => val d = x - ci; d * d }.sum, l)
    }.min._2
    val got = out.filter(col("vec_id") === probe.getLong(0) && col("sub") === 0)
      .head().getInt(2)
    assert(got === best)
  }

  test("canonicalKeepers picks by source priority, then min id; singletons drop") {
    import spark.implicits._
    // weights: src1 -> 64*(1+1%4)=128, src3 -> 256, src5 -> 128
    val docs = Seq(
      (1L, "src1", "same text"), (2L, "src3", "same text"),   // src3 wins
      (10L, "src1", "other text"), (11L, "src5", "other text"), // tie -> min id
      (20L, "src1", "lonely text"))                             // singleton
      .toDF("doc_id", "source", "text")
    val out = graft.ops.Dedup.canonicalKeepers(docs)
      .select("keeper", "keeper_source", "n_dups").as[(Long, String, Long)]
      .collect().toSet
    assert(out === Set((2L, "src3", 2L), (10L, "src1", 2L)))
  }

  test("prefix filter finds EVERY Jaccard>=0.5 pair (no false negatives)") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.ops.Dedup.prefixFilterPairs(docs)
      .select("src", "dst").as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toSet
    // brute force: ALL pairs through the same shingle-overlap verify
    val sh = graft.ops.Dedup.shingles(docs)
    val sizes = sh.groupBy("doc_id").count()
    val brute = sh.toDF("src", "sh")
      .join(sh.toDF("dst", "sh2"), col("sh") === col("sh2") && col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("src", "sza"), "src")
      .join(sizes.toDF("dst", "szb"), "dst")
      .filter(round(col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")), 4) >= 0.5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute, "prefix filter disagreed with brute force")
    // and it can only find MORE than the banded-LSH probabilistic path
    val lsh = graft.ops.Dedup.ngramJaccard(docs).filter(col("jaccard") >= 0.5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(got), "LSH found a pair the exact join missed")
  }

  test("fuzzy join: blocking finds exactly the brute-force dist<=1 best match") {
    val docs = Tables.documents(spark, sfDir)
    val out = graft.ops.FuzzyJoin.matchTokens(docs)
    val probes = graft.ops.FuzzyJoin.probes(docs)
    // every probe matches (the uncorrupted original is always in vocab)
    assert(out.count() === probes.count() && probes.count() > 0)
    // the blocked result equals brute force over the full vocabulary
    val brute = probes.crossJoin(graft.ops.FuzzyJoin.vocabulary(docs))
      .select(col("doc_id"), col("corrupted"), col("token"),
        levenshtein(col("corrupted"), col("token")).as("dist"))
      .filter(col("dist") <= 1)
      .groupBy(col("doc_id"), col("corrupted"))
      .agg(min(struct(col("dist"), col("token"))).as("best"))
      .select(col("doc_id"), col("corrupted"),
        col("best.token").as("matched"), col("best.dist").as("dist"))
    assert(out.exceptAll(brute).isEmpty && brute.exceptAll(out).isEmpty,
      "deletion-neighborhood blocking missed a dist<=1 candidate")
  }

  test("funnel: stages partition users; each conversion strictly follows in time") {
    val events = Tables.events(spark, sfDir)
    val out = Windows.funnel(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum === events.select("user_id").distinct().count())
    // replay a purchase-stage user's chain directly from the event log
    val ev = events.select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    def chain(u: Long): String = {
      val mine = ev.filter(_._1 == u)
      val tv = mine.filter(_._2 == "view").map(_._3).minOption
      val dayMs = 24L * 3600 * 1000
      val tc = tv.flatMap(t => mine.filter(e => e._2 == "click" &&
        e._3.after(t) && e._3.getTime <= t.getTime + dayMs).map(_._3).minOption)
      val tp = tc.flatMap(t => mine.filter(e => e._2 == "purchase" &&
        e._3.after(t) && e._3.getTime <= t.getTime + dayMs).map(_._3).minOption)
      if (tp.isDefined) "3_purchase" else if (tc.isDefined) "2_click"
      else if (tv.isDefined) "1_view" else "0_none"
    }
    val users = events.select("user_id").distinct().collect().map(_.getLong(0))
    val replayed = users.map(chain).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(replayed === out)
  }

  test("retentionCohorts: offsets start at 0 and counts never exceed cohort size") {
    val events = Tables.events(spark, sfDir)
    val out = Windows.retentionCohorts(events)
    assert(out.filter(col("day_offset") < 0).count() === 0)
    // offset 0 row of each cohort IS the cohort size (first day is active)
    val sizes = out.filter(col("day_offset") === 0).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out.collect().foreach { r =>
      assert(r.getLong(2) <= sizes(r.getString(0)),
        s"cohort ${r.getString(0)} offset ${r.getInt(1)} exceeds cohort size")
    }
  }

  test("overlapBloom == exact overlap (sketch prunes, verify kills false positives)") {
    val exact = graft.ops.Decontam.overlap(docs).collect().toSeq
    val bloom = graft.ops.Decontam.overlapBloom(docs).collect().toSeq
    assert(bloom === exact)
  }

  test("overlapBloom stays exact even at a terrible fpp (correctness ≠ sketch quality)") {
    val exact = graft.ops.Decontam.overlap(docs).collect().toSeq
    val sloppy = graft.ops.Decontam.overlapBloom(docs, fpp = 0.5).collect().toSeq
    assert(sloppy === exact)
  }

  test("gapfillDaily yields a dense users × days grid with zero-filled gaps") {
    val events = Tables.events(spark, sfDir)
    val filled = Windows.gapfillDaily(events)
    val nUsers = events.select("user_id").distinct().count()
    val nDays = events.select(to_date(col("ts")).as("d")).agg(
      datediff(max(col("d")), min(col("d")))).head().getInt(0) + 1
    assert(filled.count() === nUsers * nDays)
    // non-zero rows agree with a direct per-(user, day) count
    val direct = events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .count().count()
    assert(filled.filter(col("n_events") > 0).count() === direct)
    assert(filled.filter(col("n_events") === 0).count() ===
      nUsers * nDays - direct)
  }

  test("tokenBudget: quotas are floors, crossing doc admitted, layout-stable") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Sampling.tokenBudget(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // every admitted doc started strictly under its source's quota
    out.foreach { case (id, _, n, cum, quota) =>
      assert(cum - n < quota, s"doc $id admitted at/after quota")
    }
    // per source: the budget is actually used up — either the running sum
    // crossed the quota, or the source was exhausted (all its docs kept)
    val bySrc = out.groupBy(_._2)
    val srcDocs = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_._4).max >= rows.map(_._5).head ||
        rows.size.toLong === srcDocs(src),
        s"$src stopped early with budget left")
    }
    // admission is a pure function of the data, not the layout
    val again = Sampling.tokenBudget(docs.repartition(7)).collect()
      .map(r => r.getLong(0)).toSet
    assert(again === out.map(_._1).toSet)
  }

  test("containment: exact values replay from shingle sets; identical docs hit 1.0") {
    import graft.ops.Dedup
    val out = Dedup.containment(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val shSets = Dedup.shingles(docs).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    out.foreach { case (src, dst, exact, est) =>
      val want = BigDecimal(
        (shSets(src) & shSets(dst)).size.toDouble / shSets(src).size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(exact === want, s"($src,$dst) containment mismatch")
      assert(est >= 0.0)
      // identical texts => identical signatures => j_est 1 => est exactly 1
      if (shSets(src) == shSets(dst) && exact == 1.0) assert(est === 1.0)
    }
    CacheScope.unpersistAll()
  }

  test("corpus_curate packs a strict subset of corpus_build (the gates bite)") {
    val build = SparkEntry.queries("corpus_build")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val curate = SparkEntry.queries("corpus_curate")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curate.subsetOf(build),
      "span/budget gates must only remove docs from the build set")
    assert(curate.size < build.size, "the extra gates removed nothing")
    CacheScope.unpersistAll()
  }

  test("corpus_release drops the eval suite and contaminated docs from curate") {
    val docs = Tables.documents(spark, sfDir)
    val release = SparkEntry.queries("corpus_release")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(release.nonEmpty)
    // no released doc comes from the benchmark source
    val src0 = docs.filter(org.apache.spark.sql.functions.col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(release.intersect(src0).isEmpty, "released an eval-suite doc")
    // no released doc is flagged contaminated by the decontam oracle op
    val dirty = graft.ops.Decontam.overlap(docs)
      .filter(org.apache.spark.sql.functions.col("contaminated") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(release.intersect(dirty).isEmpty, "released a contaminated doc")
    CacheScope.unpersistAll()
  }

  test("bandStats: buckets partition the corpus, collision mass bounds the pair job") {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = docs.count()
    val stats = Dedup.bandStats(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.map(_._1).toSeq === (0 until Dedup.NumBands))
    // every doc lands in exactly one bucket per band
    val perBucketSums = Dedup.lshBands(docs).groupBy("b").count().collect()
      .map(r => r.getLong(1)).toSet
    assert(perBucketSums === Set(nDocs))
    // the per-band collision mass upper-bounds the DISTINCT candidate
    // pair count the LSH join actually emits (pairs colliding in several
    // bands are counted once there, once per band here)
    val distinctPairs = Dedup.lshCandidatePairs(docs).count()
    assert(stats.map(_._4).sum >= distinctPairs)
    stats.foreach { case (_, nb, mx, _) =>
      assert(nb <= nDocs && mx >= 1L)
    }
  }

  test("substring dedup: windows carry multiplicity, spans account per doc") {
    import spark.implicits._
    import graft.ops.Dedup
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (0L, s"$eight tail0"),   // 2 windows, window[0] shared with doc 1
      (1L, s"$eight tail1"),   // 2 windows
      (2L, s"$eight $eight"),  // 9 windows; within-doc repeat of window[0]
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"), // 2 windows, all unique
      (4L, "short doc")) // < 8 words: no windows
      .toDF("doc_id", "text")

    // the shared first window appears in docs 0, 1 and twice in doc 2
    val dups = Dedup.substringDups(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dups.head === ((eight, 4L, 3L, 0L)))
    // doc 2's self-overlap windows (w2..w8 w1 etc.) appear once each
    assert(dups.length === 1)

    val spans = Dedup.docDupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(spans === Seq(
      (0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5),
      (2L, 9L, 2L, round2(2.0 / 9)), (3L, 2L, 0L, 0.0)))
    CacheScope.unpersistAll()
  }

  private def round2(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("temperatureMix: √-scaled shares boost small sources, damp large; exact targets, kept == target") {
    val rows = graft.ops.Sampling.temperatureMix(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val nTot = rows.map(_._2).sum
    val budget = nTot / 2
    // targets sum to at most the budget (floor division loses < #sources)
    val tTot = rows.map(_._4).sum
    assert(tTot <= budget && tTot > budget - rows.length,
      s"targets $tTot vs budget $budget")
    // every target was satisfiable: the hash-ranked prefix exists
    rows.foreach { case (s, n, _, target, kept, rate) =>
      assert(kept === target, s"$s kept $kept != target $target")
      assert(target <= n, s"$s target exceeds its corpus")
      assert(rate === BigDecimal(target.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the temperature property: relative to raw proportions, the
    // LARGEST source's share shrinks and the SMALLEST source's share
    // grows (√ damping is monotone) — only asserted when sizes differ
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    if (big._2 > small._2) {
      assert(big._4.toDouble / tTot < big._2.toDouble / nTot,
        "largest source was not damped")
      assert(small._4.toDouble / tTot > small._2.toDouble / nTot,
        "smallest source was not boosted")
    }
    // exact w6 quantization replay
    rows.foreach { case (_, n, w6, _, _, _) =>
      assert(w6 === BigDecimal(math.sqrt(n.toDouble) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
  }

  test("recipe composer: stage-consistent manifest, ONE documents scan (inside the cache)") {
    val epochs = Seq("src1" -> 2.25, "src2" -> 0.5, "src4" -> 0.0)
    val out = graft.ops.Sampling.recipe(docs, epochs)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    try {
      assert(rows.size === 20, s"one manifest row per source, got ${rows.size}")
      rows.foreach { case (s, r) =>
        val (nRaw, nGated) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_gated"))
        val (target, kept) = (r.getAs[Long]("target"), r.getAs[Long]("n_temp_kept"))
        val (copies, admitted) =
          (r.getAs[Long]("copies_total"), r.getAs[Long]("copies_admitted"))
        val (preTok, admTok, quota) = (r.getAs[Long]("tokens_pre_budget"),
          r.getAs[Long]("tokens_admitted"), r.getAs[Long]("quota"))
        // the stage funnel only narrows (docs), then repeats (copies)
        assert(nGated <= nRaw && nGated > 0, s"$s gate: $nGated of $nRaw")
        assert(kept === math.min(target, nGated), s"$s temp kept $kept")
        val (whole, extra) = epochs.toMap.get(s) match {
          case Some(e) => (math.floor(e).toLong, e % 1 > 0)
          case None => (1L, false)
        }
        // copies bounded by the epoch dim exactly
        assert(copies >= kept * whole && copies <= kept * (whole + (if (extra) 1 else 0)),
          s"$s copies $copies vs kept $kept @ whole=$whole extra=$extra")
        // budget: admitted never exceeds the pre-budget mass, and the
        // crossing-copy rule fills at least min(quota, everything)
        assert(admitted <= copies && admTok <= preTok, s"$s budget shrank wrong")
        assert(admTok >= math.min(quota, preTok), s"$s under-filled: $admTok < min($quota, $preTok)")
      }
      assert(rows("src4").getAs[Long]("copies_total") === 0L, "epoch 0.0 must drop src4")
      // plan shape: every documents read lives INSIDE the one cached base
      // projection — dedupe cached subtrees (many consumers, one cache)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      val seen = scala.collection.mutable.Set[SparkPlan]()
      def walk(p: SparkPlan, inCache: Boolean): (Int, Int) = {
        val self = p match {
          case f: FileSourceScanExec if f.toString.contains("documents") =>
            if (inCache) (0, 1) else (1, 0)
          case _ => (0, 0)
        }
        val kids: Seq[(SparkPlan, Boolean)] = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan -> inCache)
          case q: QueryStageExec => Seq(q.plan -> inCache)
          case m: InMemoryTableScanExec =>
            val cached = m.relation.cachedPlan
            if (seen.add(cached)) Seq(cached -> true) else Nil
          case other => other.children.map(_ -> inCache)
        }
        kids.map { case (k, c) => walk(k, c) }
          .foldLeft(self) { case ((a, b), (x, y)) => (a + x, b + y) }
      }
      val (outside, inside) = walk(out.queryExecution.executedPlan, inCache = false)
      assert(outside === 0, "documents rescanned outside the cached base projection")
      assert(inside === 1, s"expected one documents scan inside the cache, got $inside")
    } finally graft.CacheScope.unpersistAll()
  }

  test("chunksCdc: a front edit preserves every chunk hash after the first boundary") {
    import spark.implicits._
    // 400 words, deterministic content; doc 2 = doc 1 with 5 words
    // prepended. CDC boundaries depend only on local hashes, so every
    // chunk of doc 1 EXCEPT its first must reappear verbatim in doc 2.
    // Fixed-width chunking shifts everything — the control assertion.
    val words = (1 to 400).map(i => s"tok${i * 7 % 97}x$i")
    val base = words.mkString(" ")
    val edited = ((1 to 5).map(i => s"new$i") ++ words).mkString(" ")
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = TextAnalysis.chunksCdc(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val d1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val d2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSet
    assert(d1.length > 2, "fixture produced too few chunks to test stability")
    val surviving = d1.drop(1)
    assert(surviving.forall(d2.contains),
      "a post-edit chunk hash changed — boundaries are not content-defined")
    // control: fixed-width chunks do NOT survive the same edit
    val fx = TextAnalysis.chunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val f1 = fx.filter(_._1 == 1L).map(_._2).drop(1)
    val f2set = fx.filter(_._1 == 2L).map(_._2).toSet
    assert(!f1.forall(f2set.contains),
      "fixed-width chunking unexpectedly survived the front edit")
    // and the chunk-dedup view finds exactly those shared chunks as
    // cross-doc duplicates (keeper = the smaller doc id)
    val dups = TextAnalysis.cdcChunkDups(docs).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    val dupHashes = dups.map(_._1).toSet
    assert(surviving.forall(dupHashes.contains),
      "a cross-doc shared chunk is missing from the dedup view")
    assert(dups.forall { case (_, nDocs, keeper) =>
      nDocs == 2L && keeper == 1L })
  }
}
