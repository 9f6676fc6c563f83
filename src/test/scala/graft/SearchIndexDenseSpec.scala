package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Centroids, Search, Similarity}

/** Round-8 retrieval additions: the materialized inverted index (must be
  * row-identical to the scan-time BM25 and must never scan the corpus at
  * query time) and the lexical+dense hybrid over bridge-pooled doc
  * embeddings. */
class SearchIndexDenseSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bm25Indexed: row-identical to bm25TopK, no corpus scan, bucketed postings") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val wh = Files.createTempDirectory("graft-bm25-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25_test LOCATION '$wh'")
    Search.buildIndex(docs, "graft_bm25_test.bm25")

    val indexed = Search.bm25Indexed(spark, "graft_bm25_test.bm25")
    val got = indexed.collect().map(_.toSeq)
    val want = Search.bm25TopK(docs).collect().map(_.toSeq)
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)

    // query-time plan touches only the index tables — the documents
    // parquet must not appear, and the postings scan must be bucketed
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"), s"corpus scanned at query time:\n$plan")
    assert(plan.contains("Bucketed: true"), s"postings scan not bucketed:\n$plan")
  }

  test("bm25TopKBatch: DataFrame-native batch == per-query chains; one shared postings pass; stats invariants") {
    import java.nio.file.Files
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val wh = Files.createTempDirectory("graft-bm25b-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25b_test LOCATION '$wh'")
    val t = "graft_bm25b_test.bm25"
    Search.buildIndex(docs, t)

    val qs = Seq(0L -> "spark shuffle hash", 1L -> "vector join merge",
      2L -> "zzznope", 3L -> "scan scan filter")
    val batch = Search.bm25TopKBatch(spark, t, qs.toDF("qid", "q"), 10)
    val rows = batch.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getInt(4)))

    // anchor parity: qid 0 is the QueryTerms query — same docs, dls, and
    // ranks as the single-query index path; scores agree to 4dp (the
    // batch folds term-sorted, the fixed-column form folds in QueryTerms
    // order — IEEE order sensitivity is what the rounding absorbs)
    val single = Search.bm25Indexed(spark, t, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(r.fieldIndex("score"))))
    val anchor = rows.filter(_._1 == 0L)
    assert(anchor.map(x => (x._2, x._3, x._4)).toSeq === single.toSeq,
      "batch anchor query diverged from the single-query indexed path")
    // duplicate terms dedup: 'scan scan filter' == 'scan filter'
    val dedupTwin = Search.bm25TopKBatch(spark, t,
      Seq(3L -> "scan filter").toDF("qid", "q"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(rows.filter(_._1 == 3L).toSeq === dedupTwin.toSeq,
      "duplicate query terms were not deduped")
    // the no-hit query contributes zero rows
    assert(!rows.exists(_._1 == 2L))

    // plan contract: ONE postings scan shared by every query (the
    // df aggregate and the scoring both read the pinned join), no
    // corpus scan, and no per-query literal lists (driver O(1)/query)
    val plan = batch.queryExecution.executedPlan
    assert(!plan.toString.contains("documents.parquet"),
      s"corpus scanned by the batch probe:\n$plan")
    // distinct: both consumers of the pinned join descend into the SAME
    // cached relation — one physical pass, seen through two cache reads
    val postingScans = scans(plan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("postings")))
      .distinct
    assert(postingScans.size === 1,
      s"batch probe reads the postings ${postingScans.size}x, want 1 " +
        s"shared pass:\n$plan")
    assert(!plan.toString.contains("zzznope"),
      s"query strings leaked into the scan plan as literals:\n$plan")

    // rebuild-in-session: the pinned postings join from the batch above
    // is still registered — a rebuild must neither die on the recache of
    // that dependent nor serve it the stale generation (the
    // FuzzySearch.writeIndex drop-first regression, BM25 family)
    Search.buildIndex(docs, t)
    val rows2 = Search.bm25TopKBatch(spark, t, qs.toDF("qid", "q"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows2.toSeq === rows.toSeq, "rebuild changed batch BM25 results")

    // index stats: recomputable invariants against the postings
    val st = Search.indexStats(spark, t).collect()(0)
    val p = spark.table(s"${t}_postings")
    assert(st.getAs[Long]("n_postings") === p.count())
    assert(st.getAs[Long]("n_terms") ===
      p.select(col("term")).distinct().count())
    val hottest = p.groupBy(col("term")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(st.getAs[Long]("max_df") === hottest)
    assert(st.getAs[Double]("imbalance") >= 1.0)
  }

  test("indexDelta: delta-maintained index equals full build equals scan path") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val wh = Files.createTempDirectory("graft-bm25-delta-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25_delta_test LOCATION '$wh'")
    Search.buildIndex(docs.filter(col("doc_id") % 5 =!= 0),
      "graft_bm25_delta_test.idx")
    Search.indexDelta("graft_bm25_delta_test.idx",
      docs.filter(col("doc_id") % 5 === 0))

    // the disjointness guard is itself delta-proportional: its fast-path
    // probe reads the bloom sidecar + the delta ONLY — the standing
    // postings table must not appear anywhere in the executed probe plan
    val guardPlan = graft.ops.IngestGuard.lastProbePlan
    assert(guardPlan.nonEmpty, "guard fast path did not run")
    assert(guardPlan.contains("bloom_might_contain"),
      s"guard probe is not the bloom fast path:\n$guardPlan")
    assert(!guardPlan.contains("idx_postings"),
      s"disjointness guard scanned the standing postings:\n$guardPlan")

    val got = Search.bm25Indexed(spark, "graft_bm25_delta_test.idx")
      .collect().map(_.toSeq)
    val want = Search.bm25TopK(docs).collect().map(_.toSeq)
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)

    // the ingest contract: delta postings derive from the delta alone —
    // a second delta's write plan must not read the standing postings
    // table (ingest cost independent of index size)
    val p = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), graft.ops.Dedup.words(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("idx_postings"), s"delta ingest reads the index:\n$p")

    // the disjointness precondition is ENFORCED, not documented: a
    // re-ingest of already-indexed doc_ids would silently double-count
    // tf/df/n_docs in the additive stats — it must throw instead, and
    // the failed attempt must leave the index answers untouched
    val before = Search.bm25Indexed(spark, "graft_bm25_delta_test.idx")
      .collect().map(_.toSeq)
    val ex = intercept[IllegalArgumentException] {
      Search.indexDelta("graft_bm25_delta_test.idx",
        docs.filter(col("doc_id") % 5 === 0))
    }
    assert(ex.getMessage.contains("doc_id"))
    val after = Search.bm25Indexed(spark, "graft_bm25_delta_test.idx")
      .collect().map(_.toSeq)
    assert(after.toSeq === before.toSeq, "failed re-ingest mutated the index")
  }

  test("compactIndex: layout-only — answers identical, files collapse, guard survives") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val wh = Files.createTempDirectory("graft-bm25-compact-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25_compact_test LOCATION '$wh'")
    // build + TWO delta ingests: 3 file generations, 3 stats rows, 3 guard blobs
    Search.buildIndex(docs.filter(col("doc_id") % 5 < 3), "graft_bm25_compact_test.idx")
    Search.indexDelta("graft_bm25_compact_test.idx", docs.filter(col("doc_id") % 5 === 3))
    Search.indexDelta("graft_bm25_compact_test.idx", docs.filter(col("doc_id") % 5 === 4))
    assert(spark.table("graft_bm25_compact_test.idx_stats").count() === 3)
    assert(spark.table("graft_bm25_compact_test.idx_guard").count() === 3)
    val before = Search.bm25Indexed(spark, "graft_bm25_compact_test.idx")
      .collect().map(_.toSeq)

    def parquetFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles()).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(parquetFiles).sum
    }
    val pDir = new java.io.File(wh, "idx_postings")
    val filesBefore = parquetFiles(pDir)

    Search.compactIndex(spark, "graft_bm25_compact_test.idx")

    val after = Search.bm25Indexed(spark, "graft_bm25_compact_test.idx")
      .collect().map(_.toSeq)
    assert(after.toSeq === before.toSeq, "compaction moved a result")
    assert(after.toSeq === Search.bm25TopK(docs).collect().map(_.toSeq).toSeq,
      "compacted index diverged from the scan path")
    // layout actually compacted: stats/guard fold to one row, file count drops
    assert(spark.table("graft_bm25_compact_test.idx_stats").count() === 1)
    assert(spark.table("graft_bm25_compact_test.idx_guard").count() === 1)
    val filesAfter = parquetFiles(pDir)
    assert(filesAfter < filesBefore,
      s"postings files did not shrink: $filesBefore -> $filesAfter")
    // the rebuilt guard still enforces disjointness over pre-compaction ids
    val ex = intercept[IllegalArgumentException] {
      Search.indexDelta("graft_bm25_compact_test.idx",
        docs.filter(col("doc_id") % 5 === 4))
    }
    assert(ex.getMessage.contains("doc_id"))
  }

  test("compactIfNeeded: fires on generation count, no-op below threshold") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val wh = Files.createTempDirectory("graft-bm25-policy-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25_policy_test LOCATION '$wh'")
    Search.buildIndex(docs.filter(col("doc_id") % 5 < 3), "graft_bm25_policy_test.idx")
    Search.indexDelta("graft_bm25_policy_test.idx", docs.filter(col("doc_id") % 5 === 3))
    Search.indexDelta("graft_bm25_policy_test.idx", docs.filter(col("doc_id") % 5 === 4))
    val want = Search.bm25Indexed(spark, "graft_bm25_policy_test.idx")
      .collect().map(_.toSeq)
    // 3 generations, threshold 4: below -> no-op
    assert(!Search.compactIfNeeded(spark, "graft_bm25_policy_test.idx", maxBatches = 4))
    assert(spark.table("graft_bm25_policy_test.idx_guard").count() === 3)
    // threshold 2: 3 > 2 -> compacts down to one generation, answers fixed
    assert(Search.compactIfNeeded(spark, "graft_bm25_policy_test.idx", maxBatches = 2))
    assert(spark.table("graft_bm25_policy_test.idx_guard").count() === 1)
    assert(!Search.compactIfNeeded(spark, "graft_bm25_policy_test.idx", maxBatches = 2))
    assert(Search.bm25Indexed(spark, "graft_bm25_policy_test.idx")
      .collect().map(_.toSeq).toSeq === want.toSeq)
  }

  test("compactIfNeeded: byte bound fires on an oversized sidecar at any generation count") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val wh = Files.createTempDirectory("graft-bm25-bytes-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25_bytes_test LOCATION '$wh'")
    val t = "graft_bm25_bytes_test.idx"
    Search.buildIndex(docs.filter(col("doc_id") % 5 < 3), t)
    Search.indexDelta(t, docs.filter(col("doc_id") % 5 === 3))
    Search.indexDelta(t, docs.filter(col("doc_id") % 5 === 4))
    val (gens, bytes) = graft.ops.IngestGuard.sidecarSize(spark, t)
    assert(gens === 3 && bytes > 0)
    val want = Search.bm25Indexed(spark, t).collect().map(_.toSeq)

    // both bounds loose: no-op
    assert(!Search.compactIfNeeded(spark, t, maxBatches = 100,
      maxSidecarBytes = 10L << 20))
    // generation bound loose, byte bound below the current sidecar: fires —
    // the batch-size-shaped blowup (few huge batches, tiny generation
    // count) is caught by bytes, not rows
    assert(Search.compactIfNeeded(spark, t, maxBatches = 100,
      maxSidecarBytes = bytes - 1))
    val (gens2, bytes2) = graft.ops.IngestGuard.sidecarSize(spark, t)
    assert(gens2 === 1, "sidecar did not fold to one bloom")
    // the fold is one bloom over the full id set — sized by corpus + fpp,
    // NOT by generation count (at tiny scale it can be marginally larger
    // than the sum of loose-fpp batch blobs; what must not happen is
    // per-generation growth)
    assert(bytes2 <= bytes * 2, s"folded sidecar did not stay bounded: $bytes -> $bytes2")
    assert(Search.bm25Indexed(spark, t).collect().map(_.toSeq).toSeq === want.toSeq)

    // the probe plan's literal payload is now ONE blob term — the bound
    // the ingest path ships to every task
    val pred = graft.ops.IngestGuard.suspectPredicate(spark, t, "doc_id").get
    val nTerms = "bloom_might_contain".r
      .findAllMatchIn(pred.toString).length
    assert(nTerms === 1, s"probe predicate carries $nTerms blob terms")

    // IVF twin: same policy, same bounds
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0),
      "graft_bm25_bytes_test.ann")
    Similarity.ivfIndexDelta("graft_bm25_bytes_test.ann",
      emb.filter(col("vec_id") % 5 === 0))
    val (agens, abytes) =
      graft.ops.IngestGuard.sidecarSize(spark, "graft_bm25_bytes_test.ann")
    assert(agens === 2)
    val awant = Similarity.annIvfIndexedTopK(spark, "graft_bm25_bytes_test.ann")
      .collect().map(_.toSeq)
    assert(!Similarity.compactIvfIfNeeded(spark, "graft_bm25_bytes_test.ann",
      maxBatches = 100, maxSidecarBytes = 10L << 20))
    assert(Similarity.compactIvfIfNeeded(spark, "graft_bm25_bytes_test.ann",
      maxBatches = 100, maxSidecarBytes = abytes - 1))
    assert(graft.ops.IngestGuard
      .sidecarSize(spark, "graft_bm25_bytes_test.ann")._1 === 1)
    assert(Similarity.annIvfIndexedTopK(spark, "graft_bm25_bytes_test.ann")
      .collect().map(_.toSeq).toSeq === awant.toSeq)
  }

  test("compactIvfIndex: layout-only — ANN answers identical, quantizer untouched") {
    import java.nio.file.Files
    val emb = Tables.embeddings(spark, sfDir)
    val wh = Files.createTempDirectory("graft-ivf-compact-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ivfc_test LOCATION '$wh'")
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), "graft_ivfc_test.idx")
    Similarity.ivfIndexDelta("graft_ivfc_test.idx", emb.filter(col("vec_id") % 5 === 0))
    val before = Similarity.annIvfIndexedTopK(spark, "graft_ivfc_test.idx")
      .collect().map(_.toSeq)
    val centBefore = spark.table("graft_ivfc_test.idx_centroids")
      .collect().map(_.toSeq).toSet

    Similarity.compactIvfIndex(spark, "graft_ivfc_test.idx")

    val after = Similarity.annIvfIndexedTopK(spark, "graft_ivfc_test.idx")
      .collect().map(_.toSeq)
    assert(after.toSeq === before.toSeq, "compaction moved an ANN result")
    assert(spark.table("graft_ivfc_test.idx_centroids")
      .collect().map(_.toSeq).toSet === centBefore,
      "compaction touched the frozen quantizer")
    assert(spark.table("graft_ivfc_test.idx_guard").count() === 1)
    // disjointness still enforced against pre-compaction ids
    intercept[IllegalArgumentException] {
      Similarity.ivfIndexDelta("graft_ivfc_test.idx",
        emb.filter(col("vec_id") % 5 === 0))
    }
  }

  test("annIvfIndexedTopK: index-served ANN == in-query trained IVF, corpus unscanned, cells DPP-pruned") {
    import java.nio.file.Files
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val wh = Files.createTempDirectory("graft-ivf-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ivf_test LOCATION '$wh'")
    Similarity.buildIvfIndex(emb, "graft_ivf_test.idx")
    val want = Similarity.annIvfTrainedTopK(emb).collect().map(_.toSeq)
    val got = Similarity.annIvfIndexedTopK(spark, "graft_ivf_test.idx")
    val rows = got.collect()
    assert(rows.map(_.toSeq).toSeq === want.toSeq,
      "index-served ANN diverged from the in-query trained IVF")

    // query-time contract: the corpus parquet is never read, and the
    // candidate-side index scan prunes partitions via dynamic pruning
    val plan = got.queryExecution.executedPlan
    assert(!plan.toString.contains("embeddings.parquet"),
      s"corpus scanned at query time:\n$plan")
    val partScans = scans(plan).filter(_.relation.partitionSchema.nonEmpty)
    assert(partScans.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"no dynamic partition pruning on the index scan:\n$plan")
  }

  test("ivfIndexDelta: frozen-quantizer ingest lands deltas in stored cells; re-ingest throws") {
    import java.nio.file.Files
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val wh = Files.createTempDirectory("graft-ivf-delta-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ivfd_test LOCATION '$wh'")
    Similarity.buildIvfIndex(base, "graft_ivfd_test.idx")
    val centBefore = spark.table("graft_ivfd_test.idx_centroids")
      .collect().map(_.toSeq).toSet
    Similarity.ivfIndexDelta("graft_ivfd_test.idx", delta)

    // guard fast path: probe plan reads sidecar + delta, never the
    // standing inverted lists
    val guardPlan = graft.ops.IngestGuard.lastProbePlan
    assert(guardPlan.contains("bloom_might_contain") &&
      !guardPlan.contains("idx_ivf"),
      s"ivf disjointness guard scanned the standing lists:\n$guardPlan")

    // every vector landed exactly once; the quantizer is untouched
    val idx = spark.table("graft_ivfd_test.idx_ivf")
    assert(idx.count() === emb.count())
    assert(idx.select("vec_id").distinct().count() === emb.count())
    assert(spark.table("graft_ivfd_test.idx_centroids")
      .collect().map(_.toSeq).toSet === centBefore,
      "delta ingest mutated the frozen quantizer")
    // delta cells are drawn from the stored centroid set (no new cells)
    val cells = spark.table("graft_ivfd_test.idx_centroids")
      .select(col("c_label")).collect().map(_.get(0)).toSet
    val deltaCells = idx.join(delta.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("cell")).distinct().collect().map(_.get(0)).toSet
    assert(deltaCells.subsetOf(cells))

    // the query path serves the merged lists
    val got = Similarity.annIvfIndexedTopK(spark, "graft_ivfd_test.idx")
    assert(got.count() > 0)

    // disjointness is enforced, and the failed attempt changes nothing
    val before = idx.count()
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexDelta("graft_ivfd_test.idx", delta)
    }
    assert(ex.getMessage.contains("vec_id"))
    assert(spark.table("graft_ivfd_test.idx_ivf").count() === before,
      "failed re-ingest mutated the index")

    // the IDEMPOTENT twin: a replayed delta is a silent no-op (streaming
    // at-least-once contract), not a throw and not duplicate list entries
    val answersBefore = Similarity.annIvfIndexedTopK(spark, "graft_ivfd_test.idx")
      .collect().map(_.toSeq)
    Similarity.ivfIndexDeltaIdempotent("graft_ivfd_test.idx", delta)
    assert(spark.table("graft_ivfd_test.idx_ivf").count() === before,
      "replayed idempotent ingest added rows")
    assert(Similarity.annIvfIndexedTopK(spark, "graft_ivfd_test.idx")
      .collect().map(_.toSeq).toSeq === answersBefore.toSeq,
      "replayed idempotent ingest changed ANN answers")
  }


  test("docVectors: bridge + integer-sum pooling matches the posexplode derivation") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val got = Search.docVectors(docs, emb)
      .select(col("doc_id"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap

    // independent shape: posexplode + groupBy(doc, dim) + re-assemble
    val nDocs = docs.count()
    val alt = emb.select(
        ((col("vec_id") * Search.BridgeMul + Search.BridgeAdd) % nDocs).as("doc_id"),
        posexplode(transform(col("embedding"),
          x => round(x.cast("double") * Centroids.Scale).cast("long")))
          .as(Seq("dim", "q")))
      .groupBy(col("doc_id"), col("dim")).agg(sum(col("q")).as("s"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("s")))).as("ds"))
      .select(col("doc_id"), transform(col("ds"), e => e("s").cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    assert(got === alt)
    assert(got.nonEmpty)
  }

  test("hybridRrfDenseAnn: bucketed dense cut ranks a subset in the exact cosine order") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Search.hybridRrfDense(docs, emb).collect()
    val ann = Search.hybridRrfDenseAnn(docs, emb).collect()
    assert(ann.nonEmpty)
    // lexical half identical between variants
    def bmRanks(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bmRanks(ann) === bmRanks(exact))
    // dense half: the ANN list is a (possibly strict) subset of vectors,
    // ranked in the SAME relative cosine order as the exact cut ranks them
    def dRanked(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(!_.isNullAt(2)).sortBy(_.getInt(2)).map(_.getLong(0)).toSeq
    val exactOrder = dRanked(exact).zipWithIndex.toMap
    val annOrder = dRanked(ann)
    val inExact = annOrder.filter(exactOrder.contains)
    assert(inExact === inExact.sortBy(exactOrder), "ANN reordered shared docs")
    // plan guard: no rank window in the bucketed variant either
    val plan = Search.hybridRrfDenseAnn(docs, emb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window crept in:\n$plan")
    CacheScope.unpersistAll()
  }

  test("hybridRrfDense: lexical ranks = bm25TopK order, dense ranks = cosine order, rrf formula exact") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val out = Search.hybridRrfDense(docs, emb).collect()
    assert(out.nonEmpty)

    // lexical half: rank i goes to the i-th doc of the bm25 top-k
    val bmDocs = Search.bm25TopK(docs).select("doc_id")
      .collect().map(_.getLong(0))
    val gotBm = out.filter(!_.isNullAt(1))
      .map(r => r.getInt(1) -> r.getLong(0)).sortBy(_._1).map(_._2)
    assert(gotBm.toSeq === bmDocs.toSeq)

    // dense half: ranks follow (rounded cos DESC, doc_id) over the pooled
    // vectors, query doc excluded
    val vecs = Search.docVectors(docs, emb)
      .select(col("doc_id"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qv = vecs(Search.DenseQueryDoc)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val denseOrder = vecs.toSeq.filter(_._1 != Search.DenseQueryDoc)
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(Search.TopK).map(_._1)
    val gotDense = out.filter(!_.isNullAt(2))
      .map(r => r.getInt(2) -> r.getLong(0)).sortBy(_._1).map(_._2)
    assert(gotDense.toSeq === denseOrder.toSeq)

    // plan guard: both rank cuts are TakeOrderedAndProject + a single-row
    // sorted-list aggregate — never a global rank window (WindowExec would
    // move the scored set to one partition)
    val plan = Search.hybridRrfDense(docs, emb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window crept in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k cut not bounded:\n$plan")

    // fused score is exactly Σ 1/(60+rank) rounded to 6dp
    out.foreach { r =>
      val want =
        (if (r.isNullAt(1)) 0.0 else 1.0 / (Search.RrfK + r.getInt(1))) +
        (if (r.isNullAt(2)) 0.0 else 1.0 / (Search.RrfK + r.getInt(2)))
      val want6 = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want6, s"rrf mismatch for doc ${r.getLong(0)}")
    }
    CacheScope.unpersistAll()
  }
}
