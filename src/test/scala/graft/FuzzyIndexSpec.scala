package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.FuzzySearch

/** The q-gram fuzzy index: count-filtered candidates (Gravano et al.,
  * VLDB 2001) + exact rescore must equal the scan path row-for-row, the
  * lossless-filter fallback must cover short queries, and the probe
  * plan must prune posting buckets statically. */
class FuzzyIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("indexed fuzzy search == scan path row-for-row; probe prunes posting buckets") {
    import java.nio.file.Files
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzy-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzy_test LOCATION '$wh'")
    val t = "graft_fuzzy_test.idx"
    FuzzySearch.buildIndex(students, t)

    for (q <- Seq("customer#000000012", "custoner#000000011", "xyzzy",
        "customer", "customer#0000000121111")) {
      val scan = FuzzySearch.topK(students, q,
        c => FuzzySearch.levRatio(c, lit(q)))
      val indexed = FuzzySearch.topKIndexed(spark, t, q)
      assert(collectRows(indexed) === collectRows(scan),
        s"indexed fuzzy search diverged from the scan path for query '$q'")
    }

    // plan contract: the postings scan carries STATIC partition filters
    // on bucket (the query's gram set is a literal), and the raw
    // customer parquet is never read — only the index tables
    val plan = FuzzySearch.topKIndexed(spark, t, "customer#000000012")
      .queryExecution.executedPlan
    val planStr = plan.toString
    assert(!planStr.contains("customer.parquet"),
      s"corpus scanned at query time:\n$planStr")
    val gramScan = scans(plan).find(_.relation.partitionSchema.nonEmpty)
    assert(gramScan.isDefined, s"no partitioned postings scan:\n$planStr")
    assert(gramScan.get.partitionFilters.nonEmpty,
      s"postings scan not bucket-pruned:\n$planStr")
  }

  test("delta ingest: postings appended from the delta alone, merged == scan path; re-ingest refused") {
    import java.nio.file.Files
    import spark.implicits._
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzyd-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzyd_test LOCATION '$wh'")
    val t = "graft_fuzzyd_test.idx"
    FuzzySearch.buildIndex(students.filter(col("id") % 5 =!= 0), t)
    FuzzySearch.indexDelta(t, students.filter(col("id") % 5 === 0))
    // every name landed exactly once; merged index == full scan path
    assert(spark.table(s"${t}_names").count() === students.count())
    val q = "customer#000000012"
    val scan = FuzzySearch.topK(students, q,
      c => FuzzySearch.levRatio(c, lit(q)))
    assert(collectRows(FuzzySearch.topKIndexed(spark, t, q))
      === collectRows(scan),
      "delta-maintained fuzzy index diverged from the scan path")
    // a replayed delta would double gram counts — must be refused loudly
    intercept[IllegalArgumentException] {
      FuzzySearch.indexDelta(t, students.filter(col("id") % 5 === 0))
    }
    // compaction: layout-only (row-identical query), guard folds to one
    // generation, one file per bucket dir
    FuzzySearch.compactIndex(spark, t)
    assert(collectRows(FuzzySearch.topKIndexed(spark, t, q))
      === collectRows(scan), "compaction moved a fuzzy-index result")
    val (gens, _) = graft.ops.IngestGuard.sidecarSize(spark, t)
    assert(gens === 1L, s"compaction left $gens guard generations")
    val loc = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("idx_grams",
          Some("graft_fuzzyd_test"))).location.toString))
    val maxFiles = loc.listFiles().filter(_.isDirectory)
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles === 1,
      s"compaction left $maxFiles files in a bucket dir")
    // the policy fires on the generation bound after fresh deltas
    FuzzySearch.indexDelta(t, Seq((900001L, "zzz", "c", "b", "s", "a"))
      .toDF("id", "name", "college", "board", "stream", "address"))
    assert(FuzzySearch.compactIfNeeded(spark, t, maxBatches = 1),
      "2 guard generations did not trigger the batch-bound compaction")
    // at-least-once replay through the idempotent twin is a no-op (the
    // streaming contract): gram counts must not double
    val nNames = spark.table(s"${t}_names").count()
    val nGrams = spark.table(s"${t}_grams").count()
    FuzzySearch.indexDeltaIdempotent(t, students.filter(col("id") % 5 === 0))
    assert(spark.table(s"${t}_names").count() === nNames,
      "idempotent replay duplicated name rows")
    assert(spark.table(s"${t}_grams").count() === nGrams,
      "idempotent replay duplicated gram postings")
    // a mixed batch (one novel + replays) ingests exactly the novel row
    FuzzySearch.indexDeltaIdempotent(t,
      students.filter(col("id") % 5 === 0).limit(3).unionByName(
        Seq((900002L, "qqq", "c", "b", "s", "a"))
          .toDF("id", "name", "college", "board", "stream", "address")))
    assert(spark.table(s"${t}_names").count() === nNames + 1,
      "mixed idempotent batch did not ingest exactly the novel row")
  }

  test("batch fuzzy search: one probe serves every query == per-query indexed results") {
    import java.nio.file.Files
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzyb-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzyb_test LOCATION '$wh'")
    val t = "graft_fuzzyb_test.idx"
    FuzzySearch.buildIndex(students, t)
    val qs = Seq(0L -> "customer#000000012", 1L -> "custoner#000000011",
      2L -> "xyzzy#0000")
    val batch = FuzzySearch.topKIndexedBatch(spark, t, qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getInt(4)))
    // per-query singles through the same index, re-projected to the
    // batch's output shape
    val singles = qs.flatMap { case (qid, q) =>
      FuzzySearch.topKIndexed(spark, t, q, k = 5)
        .select(col("id"), col("name"), col("score")).collect()
        .sortBy(r => (-r.getDouble(2), r.getLong(0))).zipWithIndex
        .map { case (r, i) =>
          (qid, r.getLong(0), r.getString(1), r.getDouble(2), i + 1) }
    }
    assert(batch.toSeq === singles,
      "batch fuzzy search diverged from per-query indexed results")
    // the garbage query contributes zero rows (negative case)
    assert(!batch.exists(_._1 == 2L))

    // DataFrame-native contract (the external-ANN-API precedent for the
    // lexical family): a caller-supplied (qid, q) FRAME — gram extraction
    // and bucketing run in-engine, so the driver does O(1) work per query
    // and the plan carries no per-query literal lists
    import spark.implicits._
    val qdf = FuzzySearch.topKIndexedBatch(spark, t,
      qs.toDF("qid", "q"), 70.0, 5, positional = false, prefixSkip = true)
    assert(qdf.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3), r.getInt(4))).toSeq === singles,
      "DataFrame-native batch form diverged from the Seq wrapper")
    // plan contract: the postings scan is DPP-pruned by the broadcast
    // query-gram frame (runtime bucket pruning — the batch analog of the
    // single-query path's static isin pruning), and the raw corpus
    // parquet is never read
    val plan = qdf.queryExecution.executedPlan
    assert(!plan.toString.contains("customer.parquet"),
      s"corpus scanned by the batch probe:\n$plan")
    val gramScans = scans(plan).filter(_.relation.partitionSchema.nonEmpty)
    assert(gramScans.nonEmpty, s"no partitioned postings scan:\n$plan")
    assert(gramScans.forall(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"batch postings scan not DPP-pruned:\n$plan")

    // per-gram skew stats: recomputable invariants against the postings
    val st = FuzzySearch.indexStats(spark, t).collect()(0)
    val g = spark.table(s"${t}_grams")
    assert(st.getAs[Long]("n_postings") === g.count())
    assert(st.getAs[Long]("n_grams") ===
      g.select(col("gram")).distinct().count())
    assert(st.getAs[Long]("max_gram") === g.groupBy(col("gram")).count()
      .agg(max(col("count"))).collect()(0).getLong(0))
    assert(st.getAs[Double]("imbalance") >= 1.0)
  }

  test("rebuild-in-session: a live cached batch probe neither breaks nor stales a rebuild") {
    import java.nio.file.Files
    import spark.implicits._
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzyr-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzyr_test LOCATION '$wh'")
    val t = "graft_fuzzyr_test.idx"
    val qs = Seq(0L -> "customer#000000012").toDF("qid", "q")
    // iteration 1: build + batch query — leaves the pinned shared-count
    // subtree REGISTERED (the bench harness unpersists only after both
    // iterations)
    FuzzySearch.buildIndex(students, t)
    val first = FuzzySearch.topKIndexedBatch(spark, t, qs, 70.0, 5, positional = false, prefixSkip = true)
      .collect().map(_.toSeq).toSeq
    // iteration 2: rebuild over the SAME catalog with that cache live —
    // an overwrite-CTAS would recache the dependent against the dropped
    // table and die with TABLE_OR_VIEW_NOT_FOUND; the drop-first write
    // cascade-uncaches instead
    FuzzySearch.buildIndex(students, t)
    val second = FuzzySearch.topKIndexedBatch(spark, t, qs, 70.0, 5, positional = false, prefixSkip = true)
      .collect().map(_.toSeq).toSeq
    assert(second === first, "rebuild changed batch results")
    graft.CacheScope.unpersistAll()
  }

  test("correctTokensIndexed: U2's token correction off the index == scan path") {
    import java.nio.file.Files
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzyu2-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzyu2_test LOCATION '$wh'")
    val t = "graft_fuzzyu2_test.idx"
    FuzzySearch.buildIndex(students, t)
    for (question <- Seq(
        "who is customr#000000042 nearby custoner#000000011 and friends",
        // duplicates collapse, stopwords and short tokens drop, a
        // no-match token contributes nothing
        "find customer#000000012 and customer#000000012 xq zzzneverhit",
        "the a an of")) {
      val scan = collectRows(FuzzySearch.correctTokens(students, question))
      val idx = collectRows(
        FuzzySearch.correctTokensIndexed(spark, t, question))
      assert(idx === scan,
        s"index-served token correction diverged for '$question'")
    }
  }

  test("positional gram filter: lossless, and at least as strong as the bag filter (measured)") {
    import java.nio.file.Files
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzyp-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzyp_test LOCATION '$wh'")
    val t = "graft_fuzzyp_test.idx"
    FuzzySearch.buildIndex(students, t)
    val nNames = students.count()
    for (q <- Seq("customer#000000012", "custoner#000000011",
        "customer#0000000121111")) {
      val pos = FuzzySearch.indexedCandidates(spark, t, q, 70.0,
        positional = true).count()
      val bag = FuzzySearch.indexedCandidates(spark, t, q, 70.0,
        positional = false).count()
      // the windowed positional count is per-gram <= the bag-min count,
      // so its candidate set can only shrink; rescored results already
      // proven identical to the scan path in the first test
      assert(pos <= bag,
        s"positional filter ADMITTED more candidates than bag for '$q': " +
          s"$pos > $bag")
      info(f"'$q': candidates bag=$bag%d positional=$pos%d " +
        f"(corpus $nNames%d, reduction ${100.0 * (bag - pos) / math.max(bag, 1)}%.1f%%)")
    }

    // where the position filter BITES: names sharing the query's grams
    // at MISALIGNED positions (the query embedded past the window
    // width). On the student fixture the shared customer# prefixes are
    // position-ALIGNED, so the window never cuts (the 0% above is the
    // honest measurement, recorded in BASELINE.md); misaligned gram
    // matches are the filter's actual lever, and the bag filter cannot
    // see them
    import spark.implicits._
    val q0 = "customer#000000012"
    val shifted = (1L to 20L).map(i =>
      (i, ("z" * 18) + q0, "c", "b", "s", "a")) :+
      ((21L, q0, "c", "b", "s", "a"))
    val tiny = shifted.toDF("id", "name", "college", "board", "stream",
      "address")
    val wh2 = Files.createTempDirectory("graft-fuzzyp2-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzyp2_test LOCATION '$wh2'")
    val t2 = "graft_fuzzyp2_test.idx"
    FuzzySearch.buildIndex(tiny, t2)
    val pos2 = FuzzySearch.indexedCandidates(spark, t2, q0, 70.0,
      positional = true).count()
    val bag2 = FuzzySearch.indexedCandidates(spark, t2, q0, 70.0,
      positional = false).count()
    info(s"misaligned-gram fixture: candidates bag=$bag2 positional=$pos2")
    // bag counting admits every shifted name (17 shared grams >= bound
    // 15); the 18-position shift exceeds the d_max=10 window, so the
    // positional count is 0 and only the exact hit survives
    assert(bag2 === 21 && pos2 === 1,
      s"position filter did not prune misaligned gram matches: " +
        s"bag=$bag2 positional=$pos2")
    // and it stays lossless: same top-k as the scan path
    assert(collectRows(FuzzySearch.topKIndexed(spark, t2, q0,
        positional = true))
      === collectRows(FuzzySearch.topK(tiny, q0,
        c => FuzzySearch.levRatio(c, lit(q0)))),
      "position filter lost a true match on the misaligned fixture")

    // the toggle changes the candidate set, never the answer: positional
    // results == bag results == scan on the students fixture, for the
    // single AND the batch entry points
    import org.apache.spark.sql.functions.lit
    for (q <- Seq("customer#000000012", "custoner#000000011")) {
      assert(collectRows(FuzzySearch.topKIndexed(spark, t, q,
          positional = true))
        === collectRows(FuzzySearch.topK(students, q,
          c => FuzzySearch.levRatio(c, lit(q)))),
        s"positional single-query path diverged from the scan for '$q'")
    }
    val qs = Seq(0L -> "customer#000000012", 1L -> "custoner#000000011")
    assert(collectRows(FuzzySearch.topKIndexedBatch(spark, t, qs, 70.0, 5,
        positional = true))
      === collectRows(FuzzySearch.topKIndexedBatch(spark, t, qs, 70.0, 5,
        positional = false)),
      "positional batch path diverged from the bag batch path")
  }

  test("prefix filter (hot-gram skip): lossless, and the hottest posting lists are never read (measured)") {
    import java.nio.file.Files
    import spark.implicits._
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzys-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzys_test LOCATION '$wh'")
    val t = "graft_fuzzys_test.idx"
    FuzzySearch.buildIndex(students, t)

    // no sidecar yet: prefixSkip degrades gracefully to the plain probe
    for (q <- Seq("customer#000000012", "custoner#000000011")) {
      assert(collectRows(FuzzySearch.topKIndexed(spark, t, q,
          prefixSkip = true))
        === collectRows(FuzzySearch.topKIndexed(spark, t, q)),
        s"prefixSkip without a _gramdf sidecar diverged for '$q'")
    }

    FuzzySearch.writeGramDf(spark, t)
    // identical answers with the skip ON across the fixture query mix
    // (exact, typo, garbage, short query, long query), alone and
    // composed with the positional filter — both are lossless screens
    // ahead of the exact rescore
    for (q <- Seq("customer#000000012", "custoner#000000011", "xyzzy",
        "customer", "customer#0000000121111")) {
      val scan = collectRows(FuzzySearch.topK(students, q,
        c => FuzzySearch.levRatio(c, lit(q))))
      assert(collectRows(FuzzySearch.topKIndexed(spark, t, q,
          prefixSkip = true)) === scan,
        s"prefix-skip probe diverged from the scan for '$q'")
      assert(collectRows(FuzzySearch.topKIndexed(spark, t, q,
          positional = true, prefixSkip = true)) === scan,
        s"prefix-skip + positional diverged from the scan for '$q'")
    }

    // a DELTA keeps the sidecar FRESH when present (additive per-gram
    // count append, delta-sized — never a postings re-scan): answers
    // equal the scan over the grown corpus AND the folded df accounting
    // matches the standing postings exactly — the round-14 staleness
    // policy hole (heavy ingest silently degrading the skip ordering
    // between compactions) is closed
    FuzzySearch.indexDelta(t, Seq(
      (900100L, "customer#000000012x", "c", "b", "s", "a"))
      .toDF("id", "name", "college", "board", "stream", "address"))
    val grown = students.unionByName(Seq(
      (900100L, "customer#000000012x", "c", "b", "s", "a"))
      .toDF("id", "name", "college", "board", "stream", "address"))
    assert(collectRows(FuzzySearch.topKIndexed(spark, t,
        "customer#000000012", prefixSkip = true))
      === collectRows(FuzzySearch.topK(grown, "customer#000000012",
        c => FuzzySearch.levRatio(c, lit("customer#000000012")))),
      "sidecar after delta lost a result")
    import org.apache.spark.sql.functions.sum
    assert(spark.table(s"${t}_gramdf").agg(sum("df")).collect()(0).getLong(0)
      === spark.table(s"${t}_grams").count(),
      "delta left the df sidecar stale: folded counts != standing postings")

    // WHERE THE SKIP BITES (measured on the grams-scan row metric): a
    // corpus whose names share a long hot prefix with short distinctive
    // tails — the hot prefix grams carry posting lists ∝ corpus while
    // the tail grams identify the answer. The skip budget (min positive
    // bound − 1) covers every hot-prefix occurrence, so the probe never
    // reads the hot lists at all: at 100 TB this is the difference
    // between a probe ∝ hottest-gram df and one ∝ the rare grams' lists
    // 7-char hot prefix (6 'aa' occurrences, posting list ∝ corpus) +
    // 17-char seeded-random letter tails (every tail gram's df ≈ 6 —
    // rare, not necessarily unique). At threshold 70 and len 24 the
    // skip budget is min-positive-bound − 1 = 8 ≥ the 6 hot
    // occurrences, so the 'aa' list drops out of the probe entirely
    val rnd = new scala.util.Random(7)
    val tails = (1L to 200L).map(i =>
      i -> (1 to 17).map(_ => ('b' + rnd.nextInt(24)).toChar).mkString)
    val hot = tails.map { case (i, tl) =>
      (i, "aaaaaaa" + tl, "c", "b", "s", "a") }
      .toDF("id", "name", "college", "board", "stream", "address")
    val wh2 = Files.createTempDirectory("graft-fuzzys2-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzys2_test LOCATION '$wh2'")
    val t2 = "graft_fuzzys2_test.idx"
    FuzzySearch.buildIndex(hot, t2)
    FuzzySearch.writeGramDf(spark, t2)
    val q2 = "aaaaaaa" + tails.find(_._1 == 42L).get._2
    def gramScanRows(skip: Boolean): Long = {
      // rows SURVIVING the gram predicate — the posting mass the probe
      // aggregates. Measured at the Filter above the postings scan: the
      // scan's own metric only reflects bucket pruning (parquet data
      // filters are row-group granular; the row-level cut is the
      // FilterExec's)
      import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val c = FuzzySearch.indexedCandidates(spark, t2, q2, 70.0,
        positional = false, prefixSkip = skip)
      c.collect()
      def walk(x: SparkPlan): Seq[FilterExec] = x match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec       => walk(qs.plan)
        case f: FilterExec =>
          Seq(f) ++ f.children.flatMap(walk)
        case o => o.children.flatMap(walk)
      }
      walk(c.queryExecution.executedPlan)
        .filter(_.condition.toString.contains("gram#"))
        .map(_.metrics("numOutputRows").value).sum
    }
    val massFull = gramScanRows(skip = false)
    val massSkip = gramScanRows(skip = true)
    info(s"hot-prefix fixture: grams-scan rows full=$massFull skip=$massSkip")
    assert(massSkip * 5 <= massFull,
      s"prefix skip did not avoid the hot posting lists: " +
        s"full=$massFull skip=$massSkip")
    // and the answers still match the scan path exactly
    assert(collectRows(FuzzySearch.topKIndexed(spark, t2, q2,
        prefixSkip = true))
      === collectRows(FuzzySearch.topK(hot, q2,
        c => FuzzySearch.levRatio(c, lit(q2)))),
      "prefix skip lost a result on the hot-prefix fixture")
  }

  test("count filter is lossless for short queries (vacuous-bound fallback)") {
    import java.nio.file.Files
    import spark.implicits._
    // short names + a 2-char query: bound <= 0 rows must still be found
    // even with zero shared grams ('zz' shares none with 'ab')
    val tiny = Seq(
      (1L, "ab", "c", "b", "s", "a"), (2L, "az", "c", "b", "s", "a"),
      (3L, "zz", "c", "b", "s", "a"), (4L, "abcd", "c", "b", "s", "a"))
      .toDF("id", "name", "college", "board", "stream", "address")
    val wh = Files.createTempDirectory("graft-fuzzy2-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzy2_test LOCATION '$wh'")
    val t = "graft_fuzzy2_test.idx"
    FuzzySearch.buildIndex(tiny, t)
    for (q <- Seq("ab", "zz", "a")) {
      val scan = FuzzySearch.topK(tiny, q,
        c => FuzzySearch.levRatio(c, lit(q)), threshold = 50.0)
      val indexed = FuzzySearch.topKIndexed(spark, t, q, threshold = 50.0)
      assert(collectRows(indexed) === collectRows(scan),
        s"short-query fallback lost rows for '$q'")
    }
    // non-integer thresholds are refused (the bound math is integer-exact)
    intercept[IllegalArgumentException] {
      FuzzySearch.topKIndexed(spark, t, "ab", threshold = 70.5)
    }
  }

  test("gramdf sidecar lifecycle: files bounded by generations, compaction folds to one") {
    import java.nio.file.Files
    import spark.implicits._
    val students = Tables.students(spark, sfDir)
    val wh = Files.createTempDirectory("graft-fuzzygd-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_fuzzygd_test LOCATION '$wh'")
    val t = "graft_fuzzygd_test.idx"
    FuzzySearch.buildIndex(students.filter(col("id") % 5 =!= 0), t)
    FuzzySearch.writeGramDf(spark, t)
    def sidecarFiles: Int = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier("idx_gramdf",
            Some("graft_fuzzygd_test"))).location.toString))
      loc.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(sidecarFiles === 1, "fresh writeGramDf must be one file")
    // each ingest generation appends ONE tiny advisory file — the bound
    // is 1 (base) + #generations, never postings-proportional
    for (r <- 0 to 2)
      FuzzySearch.indexDelta(t,
        students.filter(col("id") % 5 === 0 && (col("id") / 5) % 3 === r))
    assert(sidecarFiles === 4,
      s"3 delta generations must add exactly 3 sidecar files, got $sidecarFiles")
    // a delete adds one negative-correction file
    FuzzySearch.indexDelete(t, Seq(5L, 10L).toDF("id"))
    assert(sidecarFiles === 5)
    // compaction folds the sidecar with the postings rewrite: ONE file
    // again, and the folded df equals an exact recount of the surviving
    // postings (base + deltas − victims)
    FuzzySearch.compactIndex(spark, t)
    assert(sidecarFiles === 1,
      s"compaction must fold the gramdf sidecar to one file, got $sidecarFiles")
    val foldedSum = spark.table(s"${t}_gramdf")
      .agg(sum("df")).collect()(0).getLong(0)
    assert(foldedSum === spark.table(s"${t}_grams").count(),
      "folded gramdf must equal an exact recount of the surviving postings")
    // and the prefix-skip probe still equals the scan path on the
    // surviving corpus
    val survivors = students.filter(col("id") =!= 5L && col("id") =!= 10L)
    val q = "customer#000000012"
    assert(collectRows(FuzzySearch.topKIndexed(spark, t, q))
      === collectRows(FuzzySearch.topK(survivors, q,
        c => FuzzySearch.levRatio(c, lit(q)))),
      "post-compaction prefix-skip probe diverged from the scan path")
  }

}
