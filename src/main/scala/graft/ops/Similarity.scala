package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over the `embeddings` table
  * (vec_id, embedding ARRAY<FLOAT>, label).
  *
  * Dot products run on `array<double>` through the native
  * [[graft.functions.DotProduct]] codegen expression — a sequential
  * left-to-right fold, deterministic summation order, so results are
  * reproducible across engines (the DuckDB oracle computes the same
  * doubles; final values are rounded to absorb any last-ulp divergence).
  * Norms are computed once per VECTOR, not per pair — the pair row does one
  * dot product and one multiply.
  *
  * Scale path: brute-force top-k is the correctness baseline (fine when the
  * query set is small — broadcast queries × one pass over vectors). For
  * corpus×corpus similarity the label/LSH-blocked, sign-sketch (ANN),
  * lattice-IVF, and multi-probe variants bound candidates — all bucket
  * equi-joins.
  */
object Similarity {

  /** Sequential-fold dot product (deterministic): native codegen expression
    * (one loop, no per-row intermediate array). Bit-identical to
    * [[dotDataflow]] — same summation order. Callers with a session in
    * reach must ensure [[graft.functions.DotProduct.register]] ran (all
    * entry points in this object do). */
  def dot(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** The built-ins-only dataflow form, kept as the portability baseline and
    * for the equivalence spec. */
  def dotDataflow(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Pair-side cosine from PRE-COMPUTED norms: one dot product per pair
    * instead of three. sqrt(dot(v,v)) is computed once per VECTOR and
    * multiplied in the pair row — the same doubles in the same order as
    * [[cosine]], so results are bit-identical (the oracle rows prove it);
    * only the redundant per-pair recomputation is gone. */
  private def cosFromNorms(v: Column, qv: Column, nrm: Column, qnrm: Column): Column =
    dot(v, qv) / (nrm * qnrm)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Per-query top-k over a scored candidate set WITHOUT a per-query window
    * funnel: the cut is [[graft.plans.TopKPerKey]]'s partial/final bounded
    * heaps (at most k rows per query per input partition cross the
    * exchange), proved hash-equal to the window form by `sim_topk_custom`.
    * The rank window that follows materializes 1..k over the ALREADY-CUT
    * sliver — its input is ≤ k rows per query by construction, so it can
    * never become the one-task-per-query funnel the raw window was at
    * corpus scale. Ranking and heap use the same (rounded cos DESC, vec_id
    * ASC) key, so the cut and the rank agree deterministically. */
  private def rankedTopKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.TopK.perKey(scored, Seq("qid"), "cos", "vec_id", k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), col("vec_id"))))
  }

  private def vecs(embeddings: DataFrame): DataFrame = {
    graft.functions.DotProduct.register(embeddings.sparkSession)
    embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
  }

  /** Brute-force cosine top-k: queries (small) broadcast against every
    * vector; per-query top-k via a rank window partitioned by query —
    * ranking on the ROUNDED cosine with vec_id tiebreak keeps the cut
    * deterministic across engines. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = withNorm(vecs(embeddings))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    import org.apache.spark.sql.expressions.Window
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("cos"), 4).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  val NumPlanes = 6
  val Dim = 64

  /** Deterministic random-hyperplane signs: sign(p,d) = parity of the first
    * md5 hex digit of "p_d" — reproducible in any engine with md5 (the
    * DuckDB oracle recomputes the same planes in SQL). */
  private lazy val planeSigns: Array[Array[Double]] =
    Array.tabulate(NumPlanes, Dim) { (p, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${p}_$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 1) 1.0 else -1.0
    }

  /** Sign-sketch bucket: one bit per hyperplane (sign of the projection). */
  def bucketCol(v: Column): Column =
    concat((0 until NumPlanes).map { p =>
      val s = array(planeSigns(p).toIndexedSeq.map(lit): _*)
      when(dot(v, s) > 0, "1").otherwise("0")
    }: _*)

  /** LSH-bucketed ANN — the scale path for similarity search: vectors are
    * sketched into 2^NumPlanes sign buckets; queries probe ONLY their own
    * bucket (candidates ≈ N/2^planes instead of N). Same equi-join shape an
    * IVF index would use with a coarse-quantizer cell id. Recall is partial
    * by construction (single-probe); multi-probe = also joining neighboring
    * buckets at Hamming distance 1. */
  def annTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val e = withNorm(vecs(embeddings)).withColumn("bucket", bucketCol(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      // slim to scalar columns BEFORE the cut — the heap exchange should
      // carry (qid, vec_id, cos, bucket), not 64-dim vectors
      .select(col("qid"), col("vec_id"), col("bucket"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("bucket"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Multi-probe ANN: queries probe their own bucket AND every bucket at
    * Hamming distance 1 (one sign bit flipped) — the standard recall lever
    * for sign-sketch LSH. Candidates ≈ (1+planes)·N/2^planes; still an
    * equi-join on bucket. */
  def annMultiProbeTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val e = withNorm(vecs(embeddings)).withColumn("bucket", bucketCol(col("v")))
    val flips = (0 until NumPlanes).map { p =>
      concat(
        substring(col("bucket"), 1, p),
        when(substring(col("bucket"), p + 1, 1) === "1", "0").otherwise("1"),
        substring(col("bucket"), p + 2, NumPlanes - p - 1))
    }
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        explode(array(col("bucket") +: flips: _*)).as("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("cos"), 4).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  val IvfDims = 3
  val IvfCell = 0.2

  /** IVF-style ANN with a DETERMINISTIC coarse quantizer: the centroid set
    * is a fixed lattice (cell width [[IvfCell]] over the first [[IvfDims]]
    * dimensions) — grid-cell assignment IS nearest-centroid assignment for
    * a lattice, the inverted lists are the cell groups, and probing is an
    * equi-join on cell id (nprobe=1). A production IVF trains centroids
    * with k-means; a lattice is used so the oracle can recompute cells in
    * SQL (trained centroids aren't reproducible across engines). Recall
    * rises with wider cells or neighbor-cell probes, exactly like
    * [[annMultiProbeTopK]]'s Hamming-1 expansion. */
  def annIvfTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val cellExpr = concat_ws("_", (0 until IvfDims).map(d =>
      floor(col("v")(d) / IvfCell).cast("long").cast("string")): _*)
    val e = withNorm(vecs(embeddings)).withColumn("cell", cellExpr)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cell"))
    val scored = e.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      // slim to scalar columns BEFORE the cut — the heap exchange carries
      // (qid, vec_id, cell, cos), not 64-dim vectors
      .select(col("qid"), col("vec_id"), col("cell"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF with a TRAINED coarse quantizer: cells are the label-seeded
    * integer-space centroids ([[Centroids.labelCentroids]] — exactly one
    * deterministic k-means round), every vector lives in its argmin cell
    * (the inverted lists), and each query probes its `nprobe` nearest
    * cells — the recall lever [[annIvfTopK]]'s fixed lattice gets from
    * wider cells, here from more probes, which is how production IVF
    * actually tunes. Cell assignment and probe choice compare distances
    * in EXACT integer space (the [[Centroids.kmeansAssign]] contract), so
    * both are engine-reproducible; candidate scoring is the exact rounded
    * cosine and the per-query cut is the bounded-heap
    * [[graft.plans.TopKPerKey]].
    *
    * Shape at 100 TB: centroids are k·dims values — a broadcast; cell
    * assignment is a broadcast cross + partial min-struct agg, so the one
    * corpus exchange carries a single slim row per vector; probing is an
    * equi-join on cell id against nprobe·queries broadcast rows; the heap
    * cut bounds what crosses the final exchange. Production materializes
    * the inverted lists once (the buildIndex pattern); here they derive
    * in-query so the DuckDB oracle can replay the whole chain. */
  def annIvfTrainedTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2): DataFrame = {
    // two consumers (vector assignment, query probes) of the corpus-sized
    // centroid aggregation — materialize it once (CacheScope; the cached
    // set is k·dims values, label-count rows)
    val cent = graft.CacheScope.track(Centroids.centroidVectors(embeddings))
    val celled = assignedCells(embeddings, cent)
    val e = withNorm(vecs(embeddings))
      .withColumn("xq", transform(col("v"),
        x => round(x * 1000).cast("long") * lit(1000L)))
    val dist = aggregate(
      zip_with(col("xq"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    // nprobe nearest cells per query through the same bounded heaps —
    // nQueries·|cells| rows, cut map-side
    val probes = graft.plans.TopK.perKeyMin(
        e.filter(col("vec_id") < nQueries).join(broadcast(cent))
          .select(col("vec_id").as("qid"), col("c_label").as("cell"),
            dist.as("d2")),
        Seq("qid"), "d2", "cell", nprobe)
      .select(col("qid"), col("cell"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      .join(probes, "qid")
    val scored = celled.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Materialize the trained-IVF index — the "production builds the
    * inverted lists once" promise of [[annIvfTrainedTopK]] made real, the
    * [[Search.buildIndex]] pattern applied to ANN: `{table}_ivf` holds
    * (vec_id, v, nrm) PARTITIONED BY cell, so the inverted lists are
    * partition directories and a probe's cell equi-join prunes at SCAN
    * time via dynamic partition pruning (the layout_dpp discipline);
    * `{table}_centroids` holds the trained quantizer. Build cost = the
    * centroid aggregation + one corpus argmin pass; every query after
    * reads only its probed cells — never the corpus. */
  /** (vec_id, v, nrm, cell) — every vector of `df` assigned to its argmin
    * cell over the GIVEN centroids (broadcast cross + partial min-struct
    * agg; one slim row per vector crosses the exchange). Shared by the
    * index build and the frozen-quantizer delta ingest. */
  private def assignedCells(df: DataFrame, cent: DataFrame): DataFrame = {
    val e = withNorm(vecs(df))
      .withColumn("xq", transform(col("v"),
        x => round(x * 1000).cast("long") * lit(1000L)))
    val dist = aggregate(
      zip_with(col("xq"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    e.join(broadcast(cent))
      .select(col("vec_id"), col("v"), col("nrm"), col("label"),
        col("c_label"), dist.as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("c_label"))).as("best"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        // filterable ATTRIBUTES ride along into the inverted lists:
        // columnar storage makes them free for every probe that doesn't
        // read them, and the attribute-filtered probe pushes its
        // predicate into the pruned list scan instead of joining back
        // to the corpus (annIvfFilteredTopK)
        first(col("label")).as("label"))
      .select(col("vec_id"), col("v"), col("nrm"), col("label"),
        col("best.c_label").as("cell"))
  }

  def buildIvfIndex(embeddings: DataFrame, table: String): Unit = {
    dropStaleArtifacts(embeddings.sparkSession, table, keep = Set.empty)
    val cent = graft.CacheScope.track(Centroids.centroidVectors(embeddings))
    cent.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_centroids")
    assignedCells(embeddings, cent)
      .repartition(col("cell")) // one file per cell from generation zero
      .write.mode("overwrite").partitionBy("cell").format("parquet")
      .saveAsTable(s"${table}_ivf")
    graft.ops.IngestGuard.write(embeddings.sparkSession, embeddings, "vec_id",
      table, overwrite = true)
  }

  /** Incremental ingest into a standing IVF index: delta vectors are
    * assigned against the STORED centroids — the quantizer is FROZEN at
    * build time, as in production IVF, so the standing corpus is never
    * re-read or re-assigned and ingest cost is delta-sized (the
    * [[Search.indexDelta]] contract for ANN). The centroids drift from
    * what full retraining would give as deltas accumulate; that drift is
    * measurable by comparing `sim_ann_ivf_index_delta` against a fresh
    * [[buildIvfIndex]] — the re-train-vs-ingest trade every production
    * IVF schedules. vec_id-disjointness is ENFORCED via
    * [[graft.ops.IngestGuard]] (the additive bloom sidecar — the ingest
    * never reads the standing inverted lists; the exact semi-probe runs
    * only on a bloom hit): a re-ingested vector would silently duplicate
    * inside its inverted list. */
  def ivfIndexDelta(table: String, delta: DataFrame): Unit = {
    val spark = delta.sparkSession
    if (!ingestPreamble(table, delta, Seq("centroids"), "ivfIndexDelta"))
      return
    assignedCells(delta, spark.table(s"${table}_centroids"))
      .repartition(col("cell")) // one file per touched cell per generation
      .write.mode("append").partitionBy("cell").format("parquet")
      .saveAsTable(s"${table}_ivf")
    graft.ops.IngestGuard.write(spark, delta, "vec_id", table,
      overwrite = false)
  }

  /** The shared ingest preamble every IVF-family delta runs — ONE site
    * for the protocol the round-12 adjudication hardened, so a future
    * fix cannot miss an index family. Returns false when the delta is
    * empty (caller no-ops: skip the empty list-file generation;
    * IngestGuard.write already skips zero-row blooms). Otherwise:
    *
    *  1. The frozen trained artifacts are a PREREQUISITE (ingest
    *     assigns/encodes against them) — fail with intent, not a bare
    *     table-not-found five calls deep.
    *  2. A first delta against a trained-but-listless catalog
    *     bootstraps the lists; nothing standing exists to clash with.
    *     A missing `_ivf` NEXT TO a standing `_guard` is NOT that — it
    *     is an interrupted compaction swap; bootstrapping would create
    *     delta-only lists that a guard sized for the full corpus then
    *     "protects": silent data loss at query time. Roll the swap
    *     forward; refuse loudly if that fails.
    *  3. vec_id disjointness asserted via the guard sidecar
    *     (delta-proportional — the standing lists are never read). */
  private def ingestPreamble(table: String, delta: DataFrame,
      artifacts: Seq[String], caller: String): Boolean = {
    val spark = delta.sparkSession
    if (delta.isEmpty) return false
    val names = artifacts.map(a => s"${table}_$a")
    require(names.forall(spark.catalog.tableExists),
      s"$caller needs the trained artifacts: ${names.mkString(" and ")} — " +
        "run the matching build first (an IVF-family index cannot " +
        "bootstrap from an empty catalog; assignment/encoding require " +
        "the stored quantizers)")
    if (!spark.catalog.tableExists(s"${table}_ivf") &&
        spark.catalog.tableExists(s"${table}_guard")) {
      recoverIvfSwap(spark, table)
      require(spark.catalog.tableExists(s"${table}_ivf"),
        s"$caller refusing to bootstrap: ${table}_guard exists but " +
          s"${table}_ivf is missing and no staged copy was found to roll " +
          "forward — delta-only inverted lists under a full-corpus guard " +
          "would silently drop the standing vectors from every probe. " +
          "Restore the lists (or drop the stale _guard) before ingesting")
    }
    if (spark.catalog.tableExists(s"${table}_ivf"))
      graft.ops.IngestGuard.assertDisjoint(spark, table, delta, "vec_id",
        spark.table(s"${table}_ivf"), caller)
    true
  }

  /** Drop the OTHER layouts' trained artifacts when (re)building a
    * table under a given layout: every consumer (delta ingest, retrain,
    * the query entry points) dispatches on which artifact tables exist,
    * so a stale `_pqbook` left by a previous fused build under the same
    * name would silently retrain/ingest the wrong layout. */
  private def dropStaleArtifacts(spark: org.apache.spark.sql.SparkSession,
      table: String, keep: Set[String]): Unit = {
    Seq("pqbook", "sqrange").filterNot(keep).foreach(a =>
      spark.sql(s"DROP TABLE IF EXISTS ${table}_$a"))
    // stale tombstones die with the generation they were cut against —
    // a fresh build's vec_ids owe nothing to a previous index's deletes
    graft.ops.Tombstones.drop(spark, table)
  }

  /** At-least-once-safe IVF ingest — [[ivfIndexDelta]]'s idempotent twin
    * (the [[Search.indexDeltaIdempotent]] contract for ANN): already-
    * indexed vec_ids are SKIPPED, so a replayed streaming micro-batch is
    * a no-op instead of duplicate list entries or a crash loop. Exact
    * confirmation only for the bloom-suspect sliver; the novel set is
    * lineage-cut before writes (it derives from the table being appended
    * to — the insert-time cache-invalidation trap, see the Search twin). */
  def ivfIndexDeltaIdempotent(table: String, delta: DataFrame): Unit = {
    val spark = delta.sparkSession
    if (!spark.catalog.tableExists(s"${table}_ivf")) {
      ivfIndexDelta(table, delta); return
    }
    val novel = novelAgainstLists(spark, table, delta)
    if (!novel.isEmpty) ivfIndexDelta(table, novel)
  }

  /** The delta rows whose vec_id is NOT already in the standing lists —
    * the replay filter both idempotent ingest twins share. Exact
    * confirmation only for the bloom-suspect sliver; the novel set is
    * lineage-cut before writes (it derives from the table being appended
    * to — the insert-time cache-invalidation trap, see the Search twin). */
  private def novelAgainstLists(spark: org.apache.spark.sql.SparkSession,
      table: String, delta: DataFrame): DataFrame = {
    val standingIds = spark.table(s"${table}_ivf").select(col("vec_id"))
    graft.ops.IngestGuard.suspectPredicate(spark, table, "vec_id") match {
      case Some(hit) =>
        val suspects = delta.select(col("vec_id")).distinct().filter(hit)
        if (suspects.isEmpty) delta
        else {
          val present = standingIds
            .join(broadcast(suspects), Seq("vec_id"), "left_semi").distinct()
          delta.join(broadcast(present), Seq("vec_id"), "left_anti")
            .localCheckpoint()
        }
      case None =>
        delta.join(standingIds.distinct(), Seq("vec_id"), "left_anti")
          .localCheckpoint()
    }
  }

  /** At-least-once-safe FUSED ingest — [[ivfPqIndexDelta]]'s idempotent
    * twin (the [[ivfIndexDeltaIdempotent]] contract for the PQ-fused
    * lists): a replayed streaming micro-batch must be a no-op, not
    * duplicate (vec_id, codes) rows in a cell partition. Same
    * delta-proportional replay filter ([[novelAgainstLists]]); the novel
    * survivors are then assigned AND encoded against the stored frozen
    * artifacts exactly as a batch delta would be. */
  def ivfPqIndexDeltaIdempotent(table: String, delta: DataFrame): Unit = {
    val spark = delta.sparkSession
    if (!spark.catalog.tableExists(s"${table}_ivf")) {
      ivfPqIndexDelta(table, delta); return
    }
    val novel = novelAgainstLists(spark, table, delta)
    if (!novel.isEmpty) ivfPqIndexDelta(table, novel)
  }

  /** Compact a delta-grown IVF index: every [[ivfIndexDelta]] appends its
    * own file set into each touched cell partition plus one guard blob —
    * after many ingests a probed cell reads one file per ingest (the
    * [[Search.compactIndex]] small-files problem in partition-dir form).
    * Rewrites the cell-partitioned lists once (same layout, so DPP-pruned
    * probes and future deltas are unchanged), rebuilds one guard bloom.
    * The centroids — the frozen quantizer — are NOT touched: compaction
    * is a layout operation, never a retrain (drift stays measurable via
    * `sim_ann_ivf_drift`). Queries before/after are row-identical. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    recoverIvfSwap(spark, table) // roll forward/clean any interrupted swap
    // the rewrite folds tombstoned vectors away physically (the delete
    // lifecycle's deferred rewrite); the sidecar is dropped LAST, so a
    // crash at any intermediate state leaves its anti-join a no-op
    compactPartitioned(spark, s"${table}_ivf", "cell",
      df => graft.ops.Tombstones.filter(spark, table, df, "vec_id"))
    graft.ops.IngestGuard.write(spark,
      spark.table(s"${table}_ivf").select(col("vec_id")),
      "vec_id", table, overwrite = true)
    graft.ops.Tombstones.drop(spark, table)
  }

  /** Rewrite a partitioned index table to one file per partition dir
    * through the crash-recoverable swap — the generic core shared by the
    * IVF lists (cell partitions) and the fuzzy gram postings (bucket
    * partitions). Scheme (the [[Search.compactIndex]] scheme, with one
    * partitioned-table twist): stage the compacted copy, rename the live
    * generation away, DROP it, THEN rename the staged copy in — every
    * intermediate state is one [[recoverPartitionedSwap]] away from a
    * readable index, and delta ingest refuses to bootstrap over a
    * mid-swap catalog. The retired generation MUST be dropped while the
    * live path is still empty: a rename keeps the catalog's
    * per-partition locations pointing at the ORIGINAL path, and DROP
    * TABLE follows those custom locations — dropping the retired table
    * after the staged copy lands at the original path would delete the
    * new live data out from under it (observed, not hypothetical). */
  private[ops] def compactPartitioned(
      spark: org.apache.spark.sql.SparkSession, live: String,
      partCol: String,
      xform: DataFrame => DataFrame = identity): Unit = {
    val staged = s"${live}_compacting"
    xform(spark.table(live))
      .repartition(col(partCol)) // one writer task per value -> one file per dir
      .write.mode("overwrite").partitionBy(partCol).format("parquet")
      .saveAsTable(staged)
    spark.sql(s"ALTER TABLE $live RENAME TO ${live}_retired")
    spark.sql(s"DROP TABLE ${live}_retired")
    spark.sql(s"ALTER TABLE $staged RENAME TO $live")
    // rename moves the data dir but the catalog's partition entries still
    // point at the staging location — re-discover them from the new path
    // (without this the renamed table reads as EMPTY)
    spark.sql(s"MSCK REPAIR TABLE $live")
  }

  /** Repair an interrupted [[compactIvfIndex]] swap — the
    * [[Search.recoverIndexSwap]] scheme for the cell-partitioned lists,
    * plus two partitioned-table twists: a roll-forward rename needs the
    * MSCK partition re-discovery, and the retired generation is only ever
    * dropped while the live path is absent (its stale per-partition
    * locations point THERE — see [[compactIvfIndex]]). A live table whose
    * partition entries point outside its own location (crash between the
    * rename-in and the MSCK) is re-repaired in place. Idempotent cheap
    * DDL + one dir listing; returns true iff a roll-forward restored a
    * missing live table. */
  def recoverIvfSwap(spark: org.apache.spark.sql.SparkSession,
      table: String): Boolean =
    recoverPartitionedSwap(spark, s"${table}_ivf")

  /** The generic swap-repair core — see [[recoverIvfSwap]]'s contract;
    * `live` is the full partitioned table name (`…_ivf` or `…_grams`). */
  private[ops] def recoverPartitionedSwap(
      spark: org.apache.spark.sql.SparkSession, live: String): Boolean = {
    val staged = s"${live}_compacting"
    val retired = s"${live}_retired"
    val rolledForward =
      if (!spark.catalog.tableExists(live) && spark.catalog.tableExists(staged)) {
        // retired first, while the live path is still empty — its stale
        // partition locations are no-op deletes only in this state
        if (spark.catalog.tableExists(retired))
          spark.sql(s"DROP TABLE $retired")
        spark.sql(s"ALTER TABLE $staged RENAME TO $live")
        spark.sql(s"MSCK REPAIR TABLE $live")
        true
      } else false
    if (spark.catalog.tableExists(live)) {
      if (spark.catalog.tableExists(staged))
        spark.sql(s"DROP TABLE $staged") // stale restage; live wins
      // crash between rename-in and MSCK: live's partition entries still
      // point at the staging path — detectable (locations outside the
      // table location) and repairable in place
      val cat = spark.sessionState.catalog
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(
        live.split('.').last,
        live.split('.').dropRight(1).lastOption)
      val loc = cat.getTableMetadata(ident).location.toString
      if (cat.listPartitions(ident).exists(
          !_.location.toString.startsWith(loc)))
        spark.sql(s"MSCK REPAIR TABLE $live")
      // live ∧ retired without a staged copy is not a state this scheme
      // produces (retired is dropped before the rename-in); a foreign
      // retired table is left untouched — dropping it would follow its
      // stale partition locations into the live data
    }
    rolledForward
  }

  /** Compaction POLICY for the IVF lists — [[Search.compactIfNeeded]]
    * applied to ANN: compact when ingest generations exceed `maxBatches`
    * or the guard sidecar's cumulative blob bytes exceed
    * `maxSidecarBytes` (each blob ships into the ingest probe plan as an
    * expression literal, so the BYTE total must stay bounded regardless
    * of batch sizes — the same rationale as the Search twin). Reads k
    * tiny sidecar rows, never the lists. Returns whether compaction ran.
    *
    * Per-cell FILE COUNT — the DPP-probed-read latency killer under a
    * high ingest cadence — is subsumed by the generation bound: every
    * delta write repartitions by cell first, so one generation appends
    * at most ONE file per touched cell, and a probed cell reads ≤
    * `maxBatches` + build files between compactions (spec-gated in
    * AnnLifecycleSpec's small-delta cadence test). */
  def compactIvfIfNeeded(spark: org.apache.spark.sql.SparkSession,
      table: String, maxBatches: Int = 16,
      maxSidecarBytes: Long = 64L << 20): Boolean = {
    val due = graft.ops.IngestGuard.compactionDue(spark, table, maxBatches,
      maxSidecarBytes)
    if (due) compactIvfIndex(spark, table)
    due
  }

  /** Query the materialized IVF index: SAME RESULT as
    * [[annIvfTrainedTopK]] (both oracled against the same SQL), but the
    * corpus is never re-trained or re-assigned — probes resolve against
    * the stored centroids, and the candidate read is the cell-partitioned
    * index pruned to the probed cells by dynamic partition pruning. Query
    * cost is proportional to the probed lists' size, not the corpus. */
  def annIvfIndexedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2): DataFrame =
    annIvfIndexedTopK(spark, table, fixtureQueries(spark, table, nQueries),
      k, nprobe)

  /** External-query-vector form of [[annIvfIndexedTopK]]: `queries` is a
    * caller-supplied broadcast-sized (qid, v) frame — the shape a 100 TB
    * deployment actually has (query vectors arrive from the caller, they
    * are not rows of the index), where the fixture form's `vec_id <
    * nQueries` filter is a full-index point-scan per query batch. The
    * standing index is read ONLY through the DPP-pruned probed cells. */
  def annIvfIndexedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val idx = lists(spark, table)
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    val q = q0.select(col("qid"), col("qv"), col("qnrm")).join(probes, "qid")
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** ATTRIBUTE-FILTERED ANN — the production retrieval shape ("nearest
    * within source = X / lang = Y"): vector top-k under a row predicate
    * over attribute columns the lists carry ([[assignedCells]] rides
    * them along; columnar storage makes them free for unfiltered
    * probes). PRE-FILTER semantics: the predicate is applied to the
    * DPP-pruned candidate read ITSELF — it reaches the list scan as a
    * pushed data filter (spec-asserted), so a 1%-selective probe reads
    * its probed cells but scores only the 1% (row-group pruning cuts
    * even the read when the attribute clusters). Within the probed
    * cells the result is EXACT under the predicate — pre-filtering a
    * plain (raw-vector) list loses nothing, unlike the fused ADC path
    * where a shortlist cut before the predicate can starve the result
    * set (the post-filter trade [[annFilteredRecall]] measures; see
    * BASELINE.md round-15 for the recorded adjudication). Recall vs a
    * FILTERED brute force is the usual IVF story: the predicate thins
    * every probed cell, so matching unfiltered recall needs nprobe
    * scaled by ~1/selectivity (measured in `AnnFilteredSpec`). */
  def annIvfFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, pred: Column, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2): DataFrame =
    annIvfFilteredTopK(spark, table,
      fixtureQueries(spark, table, nQueries), pred, k, nprobe)

  /** External-query form of [[annIvfFilteredTopK]] — same contract as
    * the unfiltered external probe: queries arrive as a broadcast-sized
    * (qid, v) frame, the standing lists are read only through the
    * DPP-pruned probed cells, now with `pred` pushed into that scan. */
  def annIvfFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, pred: Column, k: Int,
      nprobe: Int): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val idx = lists(spark, table).filter(pred)
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    val q = q0.select(col("qid"), col("qv"), col("qnrm")).join(probes, "qid")
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** The POST-FILTER alternative the industry adjudicates against:
    * probe UNFILTERED, cut a widened top-(widen·k) shortlist, THEN
    * apply the predicate and keep k. Exists to be measured, not
    * preferred: on plain (raw-vector) lists it reads and scores the
    * same probed cells WITHOUT the predicate's scan savings, and any
    * query whose true filtered neighbors rank below the widened cut
    * loses them — recall degrades as selectivity tightens
    * ([[annFilteredRecall]] prices exactly this against pre-filter).
    * Post-filter only wins where a filter cannot be pushed into the
    * candidate scan (opaque scorers, encrypted attributes) — not this
    * engine's lists. */
  def annIvfFilteredPostTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, pred: Column, k: Int,
      nprobe: Int, widen: Int = 3): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val idx = lists(spark, table)
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    val q = q0.select(col("qid"), col("qv"), col("qnrm")).join(probes, "qid")
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"), col("label"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    // widened UNFILTERED cut first (the post-filter mistake being
    // priced), predicate second, final rank over the survivors
    import org.apache.spark.sql.expressions.Window
    graft.plans.TopK.perKey(scored, Seq("qid"), "cos", "vec_id", widen * k)
      .filter(pred)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Measured pre-vs-post adjudication: recall@k of both filtered-probe
    * modes against the FILTERED brute force (the exact top-k among the
    * predicate's survivors), averaged over the fixture queries — one
    * row per mode. The deterministic ratio-of-counts shape every other
    * recall row uses, so the DuckDB oracle reproduces it exactly. */
  def annFilteredRecall(spark: org.apache.spark.sql.SparkSession,
      table: String, embeddings: DataFrame, pred: Column,
      nQueries: Int = 8, k: Int = 3, nprobe: Int = 2,
      widen: Int = 3): DataFrame = {
    val q = fixtureQueries(spark, table, nQueries)
    preVsPostRecall(filteredTruth(embeddings, pred, nQueries, k),
      nQueries, k,
      annIvfFilteredTopK(spark, table, q, pred, k, nprobe),
      annIvfFilteredPostTopK(spark, table, q, pred, k, nprobe, widen))
  }

  /** Exact filtered ground truth: brute-force cosine top-k over the
    * predicate's survivors (query anchors need not satisfy it) — the
    * shared denominator of every filtered-recall adjudication. */
  private def filteredTruth(embeddings: DataFrame, pred: Column,
      nQueries: Int, k: Int): DataFrame = {
    val e = withNorm(vecs(embeddings))
    val qv = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    rankedTopKPerQuery(
      e.filter(pred).crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")),
            6).as("cos")), k)
      .select(col("qid"), col("vec_id"))
  }

  /** Two-row (mode, recall) frame — the deterministic ratio-of-counts
    * shape every recall row uses, pre before post. The truth set is
    * nQueries×k rows but its lineage is the brute-force cross join over
    * the corpus; both mode legs consume it, so it is cached here once
    * per adjudication (r17: halves the brute-force work of every
    * pre-vs-post row — the 5-predicate selectivity sweep was paying the
    * corpus scan 10× for 5 distinct truth sets). */
  private def preVsPostRecall(truth0: DataFrame, nQueries: Int, k: Int,
      pre: DataFrame, post: DataFrame): DataFrame = {
    val truth = graft.CacheScope.track(truth0)
    def recallOf(hits: DataFrame, mode: String): DataFrame =
      hits.select(col("qid"), col("vec_id"))
        .join(truth, Seq("qid", "vec_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n"))
        .agg(round(coalesce(sum(col("n")), lit(0L)) /
          lit(nQueries.toDouble * k), 4).as("recall"))
        .select(lit(mode).as("mode"), col("recall"))
    recallOf(pre, "pre").unionAll(recallOf(post, "post"))
      .orderBy(desc("mode")) // pre before post
  }

  /** The FUSED-rung pre-vs-post adjudication ([[annFilteredRecall]] on
    * the PQ layout): pre = predicate before the ADC shortlist cut
    * ([[annIvfPqFilteredTopK]]); post = the unfiltered fused pipeline's
    * widened top-(widen·k) cut filtered after the fact
    * ([[annIvfPqFilteredPostTopK]]) — the mode whose recall collapses
    * with selectivity unless widen AND shortlist scale by
    * ~1/selectivity. Same exact filtered brute-force truth, same
    * ratio-of-counts rows, so the DuckDB oracle reproduces it. */
  def annFusedFilteredRecall(spark: org.apache.spark.sql.SparkSession,
      table: String, embeddings: DataFrame, pred: Column,
      nQueries: Int = 8, k: Int = 3, nprobe: Int = 2,
      widen: Int = 3): DataFrame = {
    val q = fixtureQueries(spark, table, nQueries)
    preVsPostRecall(filteredTruth(embeddings, pred, nQueries, k),
      nQueries, k,
      annIvfPqFilteredTopK(spark, table, q, pred, k, nprobe, -1),
      annIvfPqFilteredPostTopK(spark, table, q, pred, k, nprobe, widen))
  }

  /** PER-QUERY label-matched ANN — the multi-tenant retrieval shape
    * ("each query retrieves within ITS OWN tenant/class"), which a
    * global predicate ([[annIvfFilteredTopK]]) cannot express: the
    * query frame carries (qid, v, qlabel) and the candidate constraint
    * `label = qlabel` is a JOIN condition against the broadcast query
    * dim — evaluated right above the DPP-pruned cell scan, before the
    * cosine, so a probe scans its probed cells once and scores only
    * its own label's rows. Per-query values cannot push as a static
    * scan filter (they differ per query), but the filter is codegen'd
    * against the broadcast side — no shuffle, no per-query scan. Exact
    * within probed cells under each query's own constraint. */
  def annIvfLabelMatchedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2): DataFrame =
    annIvfLabelMatchedTopK(spark, table,
      lists(spark, table).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("v"),
          col("label").as("qlabel")), k, nprobe)

  /** External-query form of [[annIvfLabelMatchedTopK]]: `queries` is a
    * broadcast-sized (qid, v, qlabel) frame. */
  def annIvfLabelMatchedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val idx = lists(spark, table)
    val q0 = externalQ0(queries.select(col("qid"), col("v")))
    val ql = queries.select(col("qid").cast("long").as("qid"),
      col("qlabel"))
    val probes = probesFor(q0, cent, nprobe)
    val q = q0.select(col("qid"), col("qv"), col("qnrm"))
      .join(ql, "qid").join(probes, "qid")
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid") &&
        col("label") === col("qlabel"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Selectivity SWEEP of the fused pre-vs-post adjudication — the
    * measured form of the claim the post-filter scaladoc makes ("recall
    * collapses as selectivity tightens unless widen/shortlist scale by
    * ~1/selectivity"): [[annFusedFilteredRecall]]'s adjudication at each
    * labeled predicate, one (sel, mode, recall) row per (predicate,
    * mode). The nprobe-sweep methodology applied to the filtered knob:
    * tune by measurement, not folklore.
    *
    * The predicate-INDEPENDENT subtrees are computed once and cached
    * across every predicate (r17, roughly halves the row): the post
    * mode's widened unfiltered probe+rescore (identical for all legs —
    * post-filtering is by definition blind to the predicate until the
    * cut) and the truth side's scored query×corpus cross join (the
    * predicate commutes with scoring: it filters candidate attributes,
    * so filter-then-rank over the shared scored frame equals
    * [[filteredTruth]]'s filter-then-score row-for-row). Only the pre
    * legs — where the predicate lives INSIDE the probe, the mode's whole
    * point — stay per-predicate plans. */
  def annFusedFilteredSelectivitySweep(
      spark: org.apache.spark.sql.SparkSession, table: String,
      embeddings: DataFrame, preds: Seq[(String, Column)],
      nQueries: Int = 8, k: Int = 3, nprobe: Int = 2,
      widen: Int = 3): DataFrame = {
    val q = fixtureQueries(spark, table, nQueries)
    // eager localCheckpoint, NOT persist: the frame's lineage reads the
    // catalog tables `${table}_ivf`/`_centroids`, and a persist would
    // outlive this query into a caller's NEXT index rebuild (bench
    // iteration 2) — whose DROP re-resolves every live cached plan
    // against the mid-rebuild catalog and throws TABLE_OR_VIEW_NOT_FOUND
    // (the drop-side twin of the INSERT-invalidation gotcha at
    // Search.indexDeltaIdempotent). The checkpoint cuts the catalog
    // lineage to an in-memory RDD: widen·k×nQueries rows + labels.
    val wideLabeled =
      annIvfPqIndexedTopK(spark, table, q, widen * k, nprobe, -1)
        .join(lists(spark, table).select(col("vec_id"), col("label")),
          Seq("vec_id"))
        .localCheckpoint()
    val e = withNorm(vecs(embeddings))
    val qv = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val scoredAll = graft.CacheScope.track(
      e.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
          round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")),
            6).as("cos")))
    preds.map { case (tag, p) =>
      val truth = rankedTopKPerQuery(scoredAll.filter(p), k)
        .select(col("qid"), col("vec_id"))
      preVsPostRecall(truth, nQueries, k,
          annIvfPqFilteredTopK(spark, table, q, p, k, nprobe, -1),
          postFilterCut(wideLabeled, p, k))
        .select(lit(tag).as("sel"), col("mode"), col("recall"))
    }.reduce(_.unionAll(_))
      .orderBy(col("sel"), desc("mode"))
  }

  /** Build the PQ-FUSED IVF index: the [[buildIvfIndex]] layout with one
    * addition — each inverted-list row also carries the vector's PQ codes
    * ([[Centroids.pqCodes]], 8 small ints for 64 floats), and the
    * per-subspace codebook is stored as `{table}_pqbook`. Because parquet
    * is columnar, the ADC probe reads ONLY (vec_id, cell, codes) from the
    * probed cells — the 32×-compressed representation — and the raw `v`
    * column is read just twice: for the handful of query vectors and for
    * the shortlist rescore. This is the composition that makes 100 TB ANN
    * IO-feasible: candidate scan bytes scale with codes, not vectors.
    * Both quantizers (coarse cells + PQ codebook) are FROZEN at build
    * time, the production IVF-PQ contract. */
  def buildIvfPqIndex(embeddings: DataFrame, table: String): Unit = {
    dropStaleArtifacts(embeddings.sparkSession, table, keep = Set("pqbook"))
    val cent = graft.CacheScope.track(Centroids.centroidVectors(embeddings))
    cent.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_centroids")
    val book = Centroids.pqCodebook(embeddings)
    // enc records HOW codes were computed ('raw' | 'residual'): a code
    // is only comparable to an ADC table built the same way, so every
    // later consumer (delta ingest, retrain, the query entry points)
    // branches on this provenance instead of silently mis-encoding
    book.withColumn("enc", lit("raw"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_pqbook")
    // codes as a sub-ordered array: one slim row per vector joins the
    // cell assignment — the inverted lists ARE the code store
    assignedCells(embeddings, cent)
      .join(packCodes(Centroids.pqCodes(embeddings, book)), "vec_id")
      .repartition(col("cell")) // one file per cell from generation zero
      .write.mode("overwrite").partitionBy("cell").format("parquet")
      .saveAsTable(s"${table}_ivf")
    graft.ops.IngestGuard.write(embeddings.sparkSession, embeddings, "vec_id",
      table, overwrite = true)
  }

  /** Incremental ingest into the PQ-fused index — [[ivfIndexDelta]] with
    * BOTH quantizers frozen: delta vectors are assigned against the
    * stored coarse centroids AND encoded against the stored PQ codebook
    * (`{table}_pqbook`), then appended into the cell partitions; the
    * standing lists are never read (the [[IngestGuard]] sidecar enforces
    * vec_id disjointness delta-proportionally). Codebook drift joins
    * centroid drift in the retrain trade: both refresh together via
    * [[retrainIfNeeded]]-style rebuilds, never piecemeal — a code is
    * only comparable to an ADC lookup table built from the SAME
    * codebook generation. */
  def ivfPqIndexDelta(table: String, delta: DataFrame): Unit = {
    val spark = delta.sparkSession
    if (!ingestPreamble(table, delta, Seq("centroids", "pqbook"),
        "ivfPqIndexDelta")) return
    val cent = spark.table(s"${table}_centroids")
    val book = spark.table(s"${table}_pqbook")
    if (fusedEnc(spark, table) == "residual") {
      // residual provenance: the delta's exact integer residuals are
      // encoded against the STORED residual codebook — the same frozen
      // artifacts the standing codes used, so merged lists stay
      // ADC-comparable. Tracked: consumed twice (list rows + encode)
      val withR = graft.CacheScope.track(assignedCells(delta, cent)
        .withColumn("xq", transform(col("v"),
          x => round(x * 1000).cast("long") * lit(1000L)))
        .join(broadcast(cent), col("cell") === col("c_label"))
        .select(col("vec_id"), col("v"), col("nrm"), col("label"),
          col("cell"),
          zip_with(col("xq"), col("cvec"), (x, c) => x - c).as("rvec")))
      withR.select(col("vec_id"), col("v"), col("nrm"), col("label"),
          col("cell"))
        .join(packCodes(Centroids.pqCodesFromInt(
          withR.select(col("vec_id"), col("rvec").as("xq")), book)), "vec_id")
        .repartition(col("cell")) // one file per touched cell per generation
        .write.mode("append").partitionBy("cell").format("parquet")
        .saveAsTable(s"${table}_ivf")
    } else {
      assignedCells(delta, cent)
        .join(packCodes(Centroids.pqCodes(delta, book)), "vec_id")
        .repartition(col("cell")) // one file per touched cell per generation
        .write.mode("append").partitionBy("cell").format("parquet")
        .saveAsTable(s"${table}_ivf")
    }
    graft.ops.IngestGuard.write(spark, delta, "vec_id", table,
      overwrite = false)
  }

  /** (vec_id, codes) — per-subspace codes packed sub-ordered into one
    * array column, the inverted-list storage form. */
  private def packCodes(c: DataFrame): DataFrame = c
    .groupBy(col("vec_id"))
    .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
    .select(col("vec_id"), transform(col("sc"), s => s("code")).as("codes"))

  /** The stored code-encoding provenance of a fused index ('raw' |
    * 'residual') — one metadata-sized lookup against `{t}_pqbook`. A
    * PQ code is only comparable to an ADC lookup table built the same
    * way, so ingest, retrain, and the query entry points all branch on
    * (or assert) this instead of silently mixing encodings. */
  private def fusedEnc(spark: org.apache.spark.sql.SparkSession,
      table: String): String = {
    val book = spark.table(s"${table}_pqbook")
    // a codebook persisted before provenance landed carries no enc
    // column — every such index stored raw codes, so default to it
    // instead of failing the read five calls deep
    if (!book.columns.contains("enc")) "raw"
    else book.select(col("enc")).limit(1).collect().headOption
      .map(_.getString(0))
      .getOrElse(throw new IllegalStateException(
        s"${table}_pqbook exists but is EMPTY — the fused index was built " +
          "over an empty corpus (or the codebook write was lost); every " +
          "query/ingest/retrain path needs the stored encoding provenance. " +
          s"Rebuild the index (buildIvfPqIndex/buildIvfPqResidualIndex) " +
          "over a non-empty corpus"))
  }

  /** Query the PQ-fused IVF index — the full IVF-PQ ladder served from
    * the materialized index: probes resolve against the stored coarse
    * centroids (DPP-pruned cell reads, the [[annIvfIndexedTopK]]
    * contract), then candidates are scored in the COMPRESSED domain —
    * per-query ADC lookup table (query subvector × stored PQ codebook,
    * exact integer distances) + 8 LUT lookups per candidate over the
    * stored `codes` column, never touching `v` — and only the
    * `shortlist` ADC survivors are rescored on raw vectors with the
    * exact rounded cosine. Every stage is exact integer math or the
    * rounded cosine, so the whole chain (including which candidates the
    * lossy ADC shortlist keeps) is engine-reproducible and oracled.
    *
    * Shape at 100 TB: candidate IO = probed-cell code bytes (32× smaller
    * than vectors); the shortlist rescore reads `v` for
    * nQueries·shortlist rows via an id semi-join back into the probed
    * cells; both cuts are the bounded [[graft.plans.TopKPerKey]] heaps. */
  def annIvfPqIndexedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int = 8, k: Int = 3, nprobe: Int = 2,
      shortlist: Int = -1): DataFrame =
    annIvfPqIndexedTopK(spark, table, fixtureQueries(spark, table, nQueries),
      k, nprobe, shortlist)

  /** External-query-vector form of [[annIvfPqIndexedTopK]] — see
    * [[fixtureQueries]] for why this is the 100 TB shape: `queries` is a
    * caller-supplied broadcast-sized (qid, v) frame, and the standing
    * index is read ONLY through the DPP-pruned probed cells (codes-only
    * ADC scan + shortlist rescore). */
  def annIvfPqIndexedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int,
      shortlist: Int): DataFrame =
    pqAdcTopK(spark, table, queries, k, nprobe, shortlist, identity)

  /** The raw-code ADC pipeline with a pluggable CANDIDATE transform —
    * ONE derivation site for the unfiltered probe (identity) and the
    * attribute-filtered probe ([[annIvfPqFilteredTopK]] passes
    * `_.filter(pred)`, applied to the codes-only scan BEFORE the ADC
    * shortlist cut — the predicate-before-cut ordering that keeps the
    * shortlist competing among the predicate's survivors only). */
  private def pqAdcTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int,
      shortlist: Int, candFilter: DataFrame => DataFrame): DataFrame = {
    require(fusedEnc(spark, table) == "raw",
      s"$table stores RESIDUAL codes — query it with annIvfPqResidualTopK " +
        "(a raw-vector ADC table against residual codes mis-scores every " +
        "candidate)")
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val book = spark.table(s"${table}_pqbook")
    val idx = lists(spark, table)
    val subDims = Dim / Centroids.SubSpaces
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    // per-query ADC lookup table: (qid, sub, code) -> exact integer
    // distance — nQueries × SubSpaces × |codebook| rows, a broadcast
    val qsubs = q0.select(col("qid"), posexplode(
        transform(sequence(lit(0), lit(Centroids.SubSpaces - 1)),
          s => slice(col("xq"), s * subDims + 1, lit(subDims))))
        .as(Seq("sub", "qs")))
    val lutDist = aggregate(
      zip_with(col("qs"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, d) => acc + d)
    val lut = qsubs.join(broadcast(book), "sub")
      .select(col("qid"), col("sub"), col("c_label").as("code"),
        lutDist.as("sd2"))
    // ADC scan: candidates read (vec_id, cell, codes) ONLY — column
    // pruning keeps the 64-double v out of the probed-cell scan (the
    // candidate transform's predicate, when present, pushes into this
    // scan as a data filter alongside it)
    val cand = candFilter(idx).select(col("vec_id"), col("cell"),
        col("codes"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val adc = cand.join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("vec_id"), col("cell"))
      .agg(sum(col("sd2")).as("d2"))
    shortlistRescore(idx, q0, adc, k, resolveShortlist(shortlist, nprobe))
  }

  /** ATTRIBUTE-FILTERED fused (IVF-PQ) ANN — [[annIvfFilteredTopK]]'s
    * pre-filter semantics on the 32×-compressed rung: the predicate
    * applies to the codes-only DPP-pruned candidate scan BEFORE the ADC
    * shortlist cut, so the shortlist ranks ONLY the predicate's
    * survivors and the post-filter starvation mode (an unfiltered
    * shortlist cut keeping mostly non-matching candidates, recall
    * collapsing as selectivity tightens unless the shortlist scales
    * with 1/selectivity) cannot arise — the shortlist∝nprobe rule needs
    * NO selectivity correction in this ordering. The rescore reads raw
    * vectors for the (already-filtered) shortlist survivors only.
    * [[annFusedFilteredRecall]] measures this mode against the widened
    * post-filter alternative; BASELINE.md round-16 records the
    * adjudication. */
  def annIvfPqFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, pred: Column, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2, shortlist: Int = -1): DataFrame =
    annIvfPqFilteredTopK(spark, table,
      fixtureQueries(spark, table, nQueries), pred, k, nprobe, shortlist)

  /** External-query form of [[annIvfPqFilteredTopK]]. */
  def annIvfPqFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, pred: Column, k: Int,
      nprobe: Int, shortlist: Int): DataFrame =
    pqAdcTopK(spark, table, queries, k, nprobe, shortlist, _.filter(pred))

  /** The POST-FILTER fused alternative, existing to be measured (the
    * [[annIvfFilteredPostTopK]] adjudication on the compressed rung):
    * run the UNFILTERED fused pipeline (ADC shortlist + rescore), take
    * the widened top-(widen·k), then apply the predicate and keep k.
    * Both lossy cuts (the ADC shortlist AND the widened rank cut)
    * happen before the predicate, so every slot they spend on
    * non-matching candidates is recall lost — matching the pre-filter
    * mode needs widen AND shortlist scaled by ~1/selectivity
    * ([[annFusedFilteredRecall]] prices exactly this). */
  def annIvfPqFilteredPostTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, pred: Column, k: Int,
      nprobe: Int, widen: Int = 3, shortlist: Int = -1): DataFrame =
    postFilterCut(
      annIvfPqIndexedTopK(spark, table, queries, widen * k, nprobe,
          shortlist)
        .join(lists(spark, table).select(col("vec_id"), col("label")),
          Seq("vec_id")),
      pred, k)

  /** The predicate-DEPENDENT tail of the post-filter mode, split out so
    * the selectivity sweep can share one cached widened+labeled frame
    * across every predicate (the widened unfiltered probe is predicate-
    * independent by definition — that is the post-filter mode's whole
    * mistake): filter the widened candidates, re-rank, keep k. */
  private def postFilterCut(wideLabeled: DataFrame, pred: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    wideLabeled
      .filter(pred)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), col("cos"),
        col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Default ADC shortlist width PER PROBED CELL. The round-13 sweep
    * measured fixed-shortlist DILUTION: widening nprobe under a constant
    * shortlist can DROP recall (raw PQ 0.167 → 0.125 at nprobe 2 → 8 with
    * shortlist pinned at 10), because more probed candidates compete for
    * the same lossy ADC cut. The real tuning rule is shortlist ∝ nprobe,
    * so every fused entry point derives `shortlist = ShortlistPerProbe ×
    * nprobe` unless the caller overrides — at the default nprobe = 2
    * that is the historical 10, so single-point rows are unchanged. */
  val ShortlistPerProbe = 5

  /** Resolve the shortlist sentinel: a non-positive value means "derive
    * from nprobe" (the [[ShortlistPerProbe]] rule); positive values are
    * explicit caller overrides, honored as-is. private[graft]: the
    * oracle-SQL generators resolve through the SAME function, so the
    * engine and its oracles cannot derive different shortlists. */
  private[graft] def resolveShortlist(shortlist: Int, nprobe: Int): Int =
    if (shortlist > 0) shortlist else ShortlistPerProbe * nprobe

  /** The ORACLE-PARITY fixture convention: query vectors are the lowest
    * `nQueries` vec_ids, fetched by a point lookup from the lists. This
    * is the one read of the standing index outside the DPP-pruned probed
    * cells — at 100 TB a full-index (column-pruned, not cell-pruned)
    * scan per query batch for data the caller should supply, which is
    * why every indexed entry point also takes an external `queries`
    * DataFrame and this form is just its wrapper. */
  private def fixtureQueries(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int): DataFrame =
    lists(spark, table).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v"))

  /** The standing inverted lists as every PROBE sees them: the raw
    * cell-partitioned table anti-joined against the broadcast tombstone
    * sidecar when one exists ([[ivfIndexDelete]]) — a deleted vector can
    * never surface as a candidate (or fixture query anchor) between the
    * delete and the compaction that folds it away physically. Identity
    * when nothing was deleted; the anti-join is a broadcast hash join
    * above the scan, so the DPP cell pruning below it is untouched
    * (spec-asserted in `IndexDeleteSpec`). Ingest-side readers
    * (replay-skip, guard checks) deliberately read the RAW table — a
    * tombstoned id is still physically present and re-inserting it
    * before a compact must be refused, not shadowed. */
  private def lists(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    graft.ops.Tombstones.filter(spark, table,
      spark.table(s"${table}_ivf"), "vec_id")

  /** DELETE vectors from the standing IVF-family index — the
    * [[graft.ops.Tombstones]] lifecycle for ANN (works identically on
    * the plain, PQ, residual, and SQ8 layouts: all share the `_ivf`
    * lists): append the victim vec_ids to the broadcast-sized
    * `{table}_tombstones` sidecar; every probe anti-joins it;
    * [[compactIvfIndex]] folds the victims away physically, rebuilds
    * the guard bloom without them (re-ingest becomes a plain insert
    * again), and drops the sidecar. Unlike the BM25 family there is no
    * additive stats table to correct — per-cell/df statistics are
    * computed from the lists at read time. Unknown and already-deleted
    * ids are ignored; delete cost is one column-pruned vec_id pass to
    * confirm presence plus a tiny sidecar append — never a list
    * rewrite. */
  def ivfIndexDelete(table: String, ids: DataFrame): Unit = {
    val spark = ids.sparkSession
    require(spark.catalog.tableExists(s"${table}_ivf"),
      s"ivfIndexDelete: no standing lists at $table — build first")
    // only ids actually standing get tombstoned (the sidecar ships into
    // every probe plan as a broadcast — don't let misses accumulate),
    // and only ids not ALREADY tombstoned (idempotent re-delete).
    // Lineage-cut before the append: presence derives from the sidecar
    // via freshOnly, and the append below would invalidate that plan
    val victims = spark.table(s"${table}_ivf").select(col("vec_id"))
      .join(broadcast(graft.ops.Tombstones.freshOnly(spark, table,
        ids.select(col("vec_id").cast("long").as("vec_id")).distinct(),
        "vec_id")), Seq("vec_id"), "left_semi")
      .distinct().localCheckpoint()
    if (!victims.isEmpty)
      graft.ops.Tombstones.append(spark, table, victims, "vec_id")
  }

  /** Normalize a caller-supplied (qid, v) query frame into the q0 form
    * every indexed entry point consumes (qid, qv, qnrm, xq). qnrm and xq
    * derive from v through the SAME expressions the index build stored
    * ([[withNorm]] / the scale-10^6 quantization), so external and
    * fixture forms return identical rows for identical vectors. */
  private def externalQ0(queries: DataFrame): DataFrame =
    queries.select(col("qid").cast("long").as("qid"),
        col("v").cast("array<double>").as("qv"))
      .withColumn("qnrm", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("xq", transform(col("qv"),
        x => round(x * 1000).cast("long") * lit(1000L)))

  /** The nprobe nearest stored cells per query by exact integer distance
    * — ONE site for probe semantics, so a tie-break change cannot
    * diverge between the plain, PQ, residual, and SQ paths. */
  private def probesFor(q0: DataFrame, cent: DataFrame,
      nprobe: Int): DataFrame = {
    val dist = aggregate(
      zip_with(col("xq"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    graft.plans.TopK.perKeyMin(
        q0.join(broadcast(cent))
          .select(col("qid"), col("c_label").as("cell"), dist.as("d2")),
        Seq("qid"), "d2", "cell", nprobe)
      .select(col("qid"), col("cell"))
  }

  /** The ADC→exact tail shared by every fused probe: the (d2, vec_id)
    * shortlist cut over ADC scores, then the raw-vector rescore — v is
    * read for the nQueries·shortlist survivors only, pruned to the
    * probed cells. */
  private def shortlistRescore(idx: DataFrame, q0: DataFrame,
      adc: DataFrame, k: Int, shortlist: Int): DataFrame = {
    val sl = graft.plans.TopK.perKeyMin(adc, Seq("qid"), "d2", "vec_id",
        shortlist)
      .select(col("qid"), col("vec_id"), col("cell"))
    val q = q0.select(col("qid"), col("qv"), col("qnrm"))
    val scored = idx.select(col("vec_id"), col("cell"), col("v"), col("nrm"))
      .join(broadcast(sl), Seq("cell", "vec_id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"), col("cell"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Build the RESIDUAL-encoded fused index — [[buildIvfPqIndex]] with
    * the IVFADC refinement (Jégou et al., TPAMI 2011, §III): PQ encodes
    * the coarse-cell RESIDUAL r = x − centroid(cell(x)) instead of x
    * itself. The coarse quantizer already explains the centroid
    * component of every vector, so raw-vector PQ wastes its codes
    * re-describing cell geometry; residuals concentrate into a tighter
    * distribution around zero and the same 8 codes buy strictly more
    * precision — the standard production IVF-PQ layout. Costs one extra
    * broadcast join at build (residual = xq − cvec, exact integer
    * subtraction at scale 10^6) and makes the query LUT per-(query,
    * probed-cell) instead of per-query (nprobe× larger, still a few
    * thousand broadcast rows). Table layout is identical to the raw
    * variant — `{t}_centroids`, `{t}_pqbook` (residual codebook),
    * cell-partitioned `{t}_ivf` carrying (v, nrm, cell, codes) — so
    * compaction/guard machinery applies unchanged. */
  def buildIvfPqResidualIndex(embeddings: DataFrame, table: String): Unit =
    buildIvfPqResidualIndex(embeddings, table, Centroids.ResidualLloydRounds)

  private[ops] def buildIvfPqResidualIndex(embeddings: DataFrame,
      table: String, lloydRounds: Int): Unit = {
    dropStaleArtifacts(embeddings.sparkSession, table, keep = Set("pqbook"))
    val cent = graft.CacheScope.track(Centroids.centroidVectors(embeddings))
    cent.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_centroids")
    // exact integer residual per vector against its assigned cell:
    // consumed twice (codebook training + encode) — tracked
    val res = graft.CacheScope.track(
      assignedCells(embeddings, cent)
        .withColumn("xq", transform(col("v"),
          x => round(x * 1000).cast("long") * lit(1000L)))
        .join(broadcast(cent), col("cell") === col("c_label"))
        .select(col("vec_id"), col("v"), col("nrm"), col("label"),
          col("cell"),
          zip_with(col("xq"), col("cvec"), (x, c) => x - c).as("rvec")))
    val book = Centroids.residualCodebook(res.select(col("vec_id"), col("rvec")),
      lloydRounds)
    book.withColumn("enc", lit("residual"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_pqbook")
    val spark = embeddings.sparkSession
    // label rides along (the assignedCells attribute discipline) so the
    // residual layout stays filterable like the other rungs
    res.select(col("vec_id"), col("v"), col("nrm"), col("label"),
        col("cell"))
      .join(packCodes(Centroids.pqCodesFromInt(
        res.select(col("vec_id"), col("rvec").as("xq")),
        spark.table(s"${table}_pqbook"))), "vec_id")
      .repartition(col("cell")) // one file per cell from generation zero
      .write.mode("overwrite").partitionBy("cell").format("parquet")
      .saveAsTable(s"${table}_ivf")
    graft.ops.IngestGuard.write(spark, embeddings, "vec_id", table,
      overwrite = true)
  }

  /** Query the residual-encoded fused index — [[annIvfPqIndexedTopK]]
    * with the LUT rebased per probed cell: an ADC distance against a
    * residual code is only meaningful relative to that candidate's cell
    * centroid, so the lookup table keys on (qid, cell, sub, code) with
    * the QUERY residual qr = xq − cvec(cell) on the query side of each
    * subspace distance. Everything else is the fused contract unchanged:
    * DPP-pruned codes-only candidate scan (never v), exact integer LUT
    * sums, (d2, vec_id) shortlist, raw-vector rescore for the survivors
    * only. */
  def annIvfPqResidualTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int = 8, k: Int = 3, nprobe: Int = 2,
      shortlist: Int = -1): DataFrame =
    annIvfPqResidualTopK(spark, table, fixtureQueries(spark, table, nQueries),
      k, nprobe, shortlist)

  /** External-query-vector form of [[annIvfPqResidualTopK]] — the
    * caller-supplied (qid, v) shape; see [[fixtureQueries]]. */
  def annIvfPqResidualTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int,
      shortlist: Int): DataFrame =
    residualAdcTopK(spark, table, queries, k, nprobe, shortlist, identity)

  /** ATTRIBUTE-FILTERED residual (IVFADC) ANN — completes the filtered
    * contract across the whole compression ladder (raw / SQ8 / PQ /
    * residual-PQ): the predicate applies to the codes-only scan BEFORE
    * the per-cell-rebased ADC shortlist cut, same
    * [[annIvfPqFilteredTopK]] ordering and guarantees. */
  def annIvfPqResidualFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, pred: Column, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2, shortlist: Int = -1): DataFrame =
    annIvfPqResidualFilteredTopK(spark, table,
      fixtureQueries(spark, table, nQueries), pred, k, nprobe, shortlist)

  /** External-query form of [[annIvfPqResidualFilteredTopK]]. */
  def annIvfPqResidualFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, pred: Column, k: Int,
      nprobe: Int, shortlist: Int): DataFrame =
    residualAdcTopK(spark, table, queries, k, nprobe, shortlist,
      _.filter(pred))

  /** The residual ADC pipeline with a pluggable candidate transform —
    * the [[pqAdcTopK]] single-derivation-site discipline, LUT rebased
    * per probed cell. */
  private def residualAdcTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int,
      shortlist: Int, candFilter: DataFrame => DataFrame): DataFrame = {
    require(fusedEnc(spark, table) == "residual",
      s"$table stores RAW codes — query it with annIvfPqIndexedTopK " +
        "(a per-cell residual ADC table against raw codes mis-scores " +
        "every candidate)")
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val book = spark.table(s"${table}_pqbook")
    val idx = lists(spark, table)
    val subDims = Dim / Centroids.SubSpaces
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    // per-(query, probed-cell) residual LUT: nQueries × nprobe ×
    // SubSpaces × |codebook| exact integer distances — a broadcast
    val qres = probes.join(q0.select(col("qid"), col("xq")), "qid")
      .join(broadcast(cent), col("cell") === col("c_label"))
      .select(col("qid"), col("cell"),
        zip_with(col("xq"), col("cvec"), (x, c) => x - c).as("qr"))
    val qsubs = qres.select(col("qid"), col("cell"), posexplode(
        transform(sequence(lit(0), lit(Centroids.SubSpaces - 1)),
          s => slice(col("qr"), s * subDims + 1, lit(subDims))))
        .as(Seq("sub", "qs")))
    val lutDist = aggregate(
      zip_with(col("qs"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, d) => acc + d)
    val lut = qsubs.join(broadcast(book), "sub")
      .select(col("qid"), col("cell"), col("sub"),
        col("c_label").as("code"), lutDist.as("sd2"))
    val cand = candFilter(idx).select(col("vec_id"), col("cell"),
        col("codes"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val adc = cand.join(broadcast(lut), Seq("qid", "cell", "sub", "code"))
      .groupBy(col("qid"), col("vec_id"), col("cell"))
      .agg(sum(col("sd2")).as("d2"))
    shortlistRescore(idx, q0, adc, k, resolveShortlist(shortlist, nprobe))
  }

  /** Build the SCALAR-quantized (SQ8) IVF index — the middle rung of the
    * production ANN compression ladder (raw 1× / SQ8 8× / PQ 32×, the
    * FAISS `IndexIVFScalarQuantizer` point): each of the 64 dims
    * compresses to one byte-range code against a per-dim [min, max]
    * trained over the corpus — code = round((q − min)·255 / (max − min))
    * on the exact scale-10³ integer q, so codes are engine-reproducible.
    * 8× smaller candidate IO than raw vectors at near-exact recall
    * (quantization error ≤ range/510 per dim), vs PQ's 32× at lossy
    * recall — the recall/IO trade a 100 TB deployment picks per
    * workload. Artifacts: `{t}_centroids` (coarse quantizer),
    * `{t}_sqrange` (64 rows: dim, minq, maxq — the frozen SQ trainer),
    * cell-partitioned `{t}_ivf` carrying (v, nrm, cell, sq). The code
    * computation is one broadcast of the 64-entry range arrays +
    * zip_with — no explode, no extra shuffle over the corpus. */
  def buildIvfSqIndex(embeddings: DataFrame, table: String): Unit = {
    val spark = embeddings.sparkSession
    dropStaleArtifacts(spark, table, keep = Set("sqrange"))
    val cent = graft.CacheScope.track(Centroids.centroidVectors(embeddings))
    cent.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_centroids")
    // per-dim min/max of the scale-1e3 integer q: map-side combine
    // collapses the 64× explode before the 64-group exchange
    vecs(embeddings)
      .select(posexplode(transform(col("v"),
        x => round(x * 1000).cast("long"))).as(Seq("dim", "q")))
      .groupBy(col("dim"))
      .agg(min(col("q")).as("minq"), max(col("q")).as("maxq"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_sqrange")
    assignedCells(embeddings, cent)
      .crossJoin(broadcast(sqRangeArrays(spark, table)))
      .select(col("vec_id"), col("v"), col("nrm"), col("label"),
        col("cell"),
        sqCodes(transform(col("v"), x => round(x * 1000).cast("long")))
          .as("sq"))
      .repartition(col("cell")) // one file per cell from generation zero
      .write.mode("overwrite").partitionBy("cell").format("parquet")
      .saveAsTable(s"${table}_ivf")
    graft.ops.IngestGuard.write(spark, embeddings, "vec_id", table,
      overwrite = true)
  }

  /** Incremental ingest into the SQ8 index — the frozen-artifact
    * contract for scalar quantization: delta vectors are assigned
    * against the stored coarse centroids AND coded against the stored
    * per-dim [min, max] (`{t}_sqrange` — codes are only comparable to
    * dequantizations from the same trainer; a delta value outside the
    * trained range saturates to the 0/255 boundary codes, exactly as
    * production SQ does — see [[sqCodes]]). Standing lists never
    * read; the [[IngestGuard]] sidecar enforces vec_id disjointness
    * delta-proportionally. */
  def ivfSqIndexDelta(table: String, delta: DataFrame): Unit = {
    val spark = delta.sparkSession
    if (!ingestPreamble(table, delta, Seq("centroids", "sqrange"),
        "ivfSqIndexDelta")) return
    assignedCells(delta, spark.table(s"${table}_centroids"))
      .crossJoin(broadcast(sqRangeArrays(spark, table)))
      .select(col("vec_id"), col("v"), col("nrm"), col("label"),
        col("cell"),
        sqCodes(transform(col("v"), x => round(x * 1000).cast("long")))
          .as("sq"))
      .repartition(col("cell")) // one file per touched cell per generation
      .write.mode("append").partitionBy("cell").format("parquet")
      .saveAsTable(s"${table}_ivf")
    graft.ops.IngestGuard.write(spark, delta, "vec_id", table,
      overwrite = false)
  }

  /** At-least-once-safe SQ ingest — [[ivfSqIndexDelta]]'s idempotent
    * twin (the [[ivfIndexDeltaIdempotent]] contract for the SQ8 lists):
    * a replayed streaming micro-batch is a no-op via the shared
    * [[novelAgainstLists]] replay filter; novel survivors are assigned
    * and byte-coded against the stored frozen artifacts exactly as a
    * batch delta would be. Completes streaming symmetry across the
    * compression ladder. */
  def ivfSqIndexDeltaIdempotent(table: String, delta: DataFrame): Unit = {
    val spark = delta.sparkSession
    if (!spark.catalog.tableExists(s"${table}_ivf")) {
      ivfSqIndexDelta(table, delta); return
    }
    val novel = novelAgainstLists(spark, table, delta)
    if (!novel.isEmpty) ivfSqIndexDelta(table, novel)
  }

  /** The 64-entry SQ trainer as one broadcastable row (minv, rng arrays
    * in dim order) — the form [[sqCodes]]/[[sqDecode255]] zip against. */
  private def sqRangeArrays(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    spark.table(s"${table}_sqrange")
      .agg(array_sort(collect_list(struct(col("dim"), col("minq"),
        (col("maxq") - col("minq")).as("rng")))).as("md"))
      .select(transform(col("md"), s => s("minq")).as("minv"),
        transform(col("md"), s => s("rng")).as("rng"))

  /** code_d = round((q_d − min_d)·255 / range_d) clamped to [0, 255]
    * (a DELTA value outside the frozen trained range must still fit the
    * byte code — the standard SQ saturation), 0 on a degenerate
    * (zero-range) dim — exact-integer numerator, one IEEE divide, the
    * same HALF_UP round both engines implement. */
  private def sqCodes(q: Column): Column =
    zip_with(q, arrays_zip(col("minv"), col("rng")), (qd, s) =>
      when(s("rng") === 0L, 0L).otherwise(
        greatest(lit(0L), least(lit(255L),
          round((qd - s("minv")).cast("double") * 255.0
            / s("rng").cast("double")).cast("long")))))

  /** Dequantized candidate at scale q·255: min_d·255 + code_d·range_d —
    * exact integer, so ADC distances against qs = q·255 are exact. */
  private def sqDecode255(sq: Column): Column =
    zip_with(sq, arrays_zip(col("minv"), col("rng")),
      (c, s) => s("minv") * 255L + c * s("rng"))

  /** Query the SQ8 IVF index: DPP-pruned probes (the fused contract),
    * then candidates are scored on DEQUANTIZED codes — d2 =
    * Σ(q·255 − decode255(code))², exact integer math per dim, the sq
    * column read instead of v (8× less candidate IO) — with the usual
    * (d2, vec_id) shortlist cut and raw-vector rescore. Unlike PQ there
    * is no lookup table: SQ's ADC is 64 integer mult-adds per candidate
    * against two broadcast 64-entry arrays. */
  def annIvfSqIndexedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int = 8, k: Int = 3, nprobe: Int = 2,
      shortlist: Int = -1): DataFrame =
    annIvfSqIndexedTopK(spark, table, fixtureQueries(spark, table, nQueries),
      k, nprobe, shortlist)

  /** External-query-vector form of [[annIvfSqIndexedTopK]] — the
    * caller-supplied (qid, v) shape; see [[fixtureQueries]]. */
  def annIvfSqIndexedTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int,
      shortlist: Int): DataFrame =
    sqAdcTopK(spark, table, queries, k, nprobe, shortlist, identity)

  /** ATTRIBUTE-FILTERED SQ8 ANN — the [[annIvfPqFilteredTopK]] contract
    * on the 8× rung: predicate into the codes-only scan BEFORE the
    * shortlist cut, exact-under-predicate up to the (now
    * survivor-only) lossy cut, no selectivity correction needed. */
  def annIvfSqFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, pred: Column, nQueries: Int = 8, k: Int = 3,
      nprobe: Int = 2, shortlist: Int = -1): DataFrame =
    annIvfSqFilteredTopK(spark, table,
      fixtureQueries(spark, table, nQueries), pred, k, nprobe, shortlist)

  /** External-query form of [[annIvfSqFilteredTopK]]. */
  def annIvfSqFilteredTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, pred: Column, k: Int,
      nprobe: Int, shortlist: Int): DataFrame =
    sqAdcTopK(spark, table, queries, k, nprobe, shortlist, _.filter(pred))

  /** The SQ8 ADC pipeline with a pluggable candidate transform — the
    * [[pqAdcTopK]] single-derivation-site discipline for the 8× rung. */
  private def sqAdcTopK(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, k: Int, nprobe: Int,
      shortlist: Int, candFilter: DataFrame => DataFrame): DataFrame = {
    // layout contract, symmetric with the fused entry points' enc check
    // (ONE site — all overloads flow through here): a non-SQ table
    // would otherwise fail five calls deep on a missing _sqrange/sq
    // column instead of naming the right entry point
    require(spark.catalog.tableExists(s"${table}_sqrange"),
      s"$table is not an SQ8 index (no ${table}_sqrange trainer) — query " +
        "the entry point matching the stored layout: annIvfPqIndexedTopK/" +
        "annIvfPqResidualTopK for a fused index, annIvfIndexedTopK for " +
        "plain IVF")
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val idx = lists(spark, table)
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    // the query side at scale q·255, matching sqDecode255's output scale
    val qs = q0.select(col("qid"), transform(col("qv"),
      x => round(x * 1000).cast("long") * lit(255L)).as("qs"))
    // dequantize BEFORE the probes fan-out: a candidate probed by m
    // queries decodes once, not m times
    val adc = candFilter(idx).select(col("vec_id"), col("cell"), col("sq"))
      .crossJoin(broadcast(sqRangeArrays(spark, table)))
      .withColumn("dec", sqDecode255(col("sq")))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(qs), Seq("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        aggregate(zip_with(col("qs"), col("dec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, d) => acc + d).as("d2"))
    shortlistRescore(idx, q0, adc, k, resolveShortlist(shortlist, nprobe))
  }

  /** (vec_id, cell) only — the assignment exchange without the index
    * payload, for audits that never store the vectors. */
  private def cellsOnly(df: DataFrame, cent: DataFrame): DataFrame = {
    val e = vecs(df).withColumn("xq", transform(col("v"),
      x => round(x * 1000).cast("long") * lit(1000L)))
    val dist = aggregate(
      zip_with(col("xq"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    e.join(broadcast(cent))
      .select(col("vec_id"), col("c_label"), dist.as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("best.c_label").as("cell"))
  }

  /** Quantizer-drift audit: how many vectors sit in a different cell
    * under the base-trained (frozen) quantizer than full retraining
    * would put them — THE number that schedules re-training in the
    * ingest-vs-retrain trade [[ivfIndexDelta]] documents (drift near 0:
    * keep ingesting; rising drift: probed lists no longer match the data
    * distribution and recall decays). One row (n_vectors, n_moved,
    * drift); both assignments are exact integer-space argmins, so the
    * audit is engine-reproducible like everything else in the chain. */
  def annIvfDrift(embeddings: DataFrame, baseMod: Int = 5): DataFrame = {
    val baseCent = Centroids.centroidVectors(
      embeddings.filter(col("vec_id") % baseMod =!= 0))
    val fullCent = Centroids.centroidVectors(embeddings)
    val a = cellsOnly(embeddings, baseCent)
      .select(col("vec_id"), col("cell").as("base_cell"))
    val b = cellsOnly(embeddings, fullCent)
      .select(col("vec_id"), col("cell").as("full_cell"))
    a.join(b, "vec_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("base_cell") =!= col("full_cell"), 1L).otherwise(0L))
          .as("n_moved"))
      .select(col("n_vectors"), col("n_moved"),
        round(col("n_moved").cast("double") / col("n_vectors").cast("double"), 4)
          .as("drift"))
  }

  /** Drift-triggered RETRAIN policy — the [[compactIvfIfNeeded]] analog
    * for QUANTIZER decay, closing the ingest-vs-retrain trade
    * [[ivfIndexDelta]] documents: measure drift (fraction of corpus
    * vectors whose exact integer-space argmin cell under the STORED
    * frozen quantizer differs from one trained on the CURRENT corpus —
    * the [[annIvfDrift]] audit against the live index), and when it
    * reaches `minDrift`, retrain the quantizer and rebuild the lists
    * ([[buildIvfIndex]] over the current corpus). Unlike compaction this
    * IS a retrain — cells move by design; recall is restored at the
    * price of one corpus re-read + rebuild, which is why it runs behind
    * a threshold instead of every ingest. Provenance is recorded in
    * `{table}_quantizer_log` (one row per decision: corpus size, drift,
    * threshold, fired) so index lineage stays auditable. Returns the
    * decision row (n_vectors, n_moved, drift, threshold, retrained) —
    * drift measured BEFORE any rebuild, so the row is reproducible from
    * the pre-decision state. `corpus` is the source-of-truth embedding
    * table (retraining reads the corpus by definition; the standing
    * lists don't carry the label column the seeding needs). */
  def retrainIfNeeded(spark: org.apache.spark.sql.SparkSession,
      table: String, corpus: DataFrame, minDrift: Double): DataFrame = {
    val stored = spark.table(s"${table}_centroids")
    val fresh = graft.CacheScope.track(Centroids.centroidVectors(corpus))
    // both assignment frames are cached BY LOGICAL PLAN: a second decision
    // in the same scope (the fires/no-op pair the oracle row runs) reuses
    // them instead of re-aggregating the corpus twice; a rebuild refreshes
    // the {table}_centroids relation, so a post-retrain decision
    // recomputes against the new quantizer (spec-gated: third decision
    // measures drift 0)
    val a = graft.CacheScope.track(cellsOnly(corpus, stored)
      .select(col("vec_id"), col("cell").as("stored_cell")))
    val b = graft.CacheScope.track(cellsOnly(corpus, fresh)
      .select(col("vec_id"), col("cell").as("fresh_cell")))
    val decision = a.join(b, "vec_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("stored_cell") =!= col("fresh_cell"), 1L).otherwise(0L))
          .as("n_moved"))
      .select(col("n_vectors"), col("n_moved"),
        round(col("n_moved").cast("double") / col("n_vectors").cast("double"), 4)
          .as("drift"))
      .withColumn("threshold", lit(minDrift))
      .withColumn("retrained", col("drift") >= col("threshold"))
      .localCheckpoint() // pin the decision before any rebuild mutates state
    val fired = decision.select(col("retrained")).collect()(0).getBoolean(0)
    // a retrain rebuilds THE LAYOUT THAT STANDS: a fused index must come
    // back fused (same code-encoding provenance — rebuilding plain would
    // drop the codes column and break every ADC query), a plain index
    // comes back plain
    // layout dispatch below assumes at most ONE rung's artifacts stand; a
    // catalog written before dropStaleArtifacts landed can carry both, in
    // which case the PQ branch would silently win and an SQ index would be
    // rebuilt fused
    require(!(spark.catalog.tableExists(s"${table}_pqbook") &&
        spark.catalog.tableExists(s"${table}_sqrange")),
      s"$table carries BOTH ${table}_pqbook and ${table}_sqrange — a stale " +
        "artifact from a pre-provenance build; re-run the intended rung's " +
        "build (builds now drop the other layout's artifacts) before " +
        "retraining")
    if (fired) {
      if (spark.catalog.tableExists(s"${table}_pqbook")) {
        if (fusedEnc(spark, table) == "residual")
          buildIvfPqResidualIndex(corpus, table)
        else buildIvfPqIndex(corpus, table)
      } else if (spark.catalog.tableExists(s"${table}_sqrange"))
        buildIvfSqIndex(corpus, table)
      else buildIvfIndex(corpus, table)
    }
    decision.write.mode("append").format("parquet")
      .saveAsTable(s"${table}_quantizer_log")
    decision
  }

  /** Probe-bounded cosine RANGE search from a standing IVF-family index
    * — the indexed counterpart of [[nearDupPairs]] and the query shape
    * dedup/link-discovery actually runs at scale ("everything within
    * cosine t of these vectors", not top-k): candidates are the
    * DPP-pruned probed cells, scored with the exact rounded cosine, and
    * every row at or above `threshold` survives — no heap cut, so the
    * output is bounded by the true match count in the probed cells.
    * Recall is probe-bounded exactly like the top-k entry points
    * (nprobe is the knob); within the probed cells the result is EXACT
    * (no ADC prefilter — a lossy filter could silently drop true
    * matches, which a range query, unlike top-k, cannot tolerate).
    * Works on every layout (plain/fused/SQ lists all carry v). */
  def annIvfRangeSearch(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, threshold: Double,
      nprobe: Int): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val cent = spark.table(s"${table}_centroids")
    val idx = lists(spark, table)
    val q0 = externalQ0(queries)
    val probes = probesFor(q0, cent, nprobe)
    val q = q0.select(col("qid"), col("qv"), col("qnrm")).join(probes, "qid")
    idx.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6))
      .filter(col("cos") >= threshold)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cos"),
        col("cell"))
      .orderBy(col("qid"), col("vec_id"))
  }

  def annIvfRangeSearch(spark: org.apache.spark.sql.SparkSession,
      table: String, nQueries: Int = 8, threshold: Double = 0.25,
      nprobe: Int = 2): DataFrame =
    annIvfRangeSearch(spark, table, fixtureQueries(spark, table, nQueries),
      threshold, nprobe)

  /** Standing-index maintenance stats — the 1-row introspection a
    * scheduled maintenance job reads before anything else: inverted-list
    * size distribution and the imbalance factor max/avg, the number that
    * predicts probe skew (a probe landing on the hottest cell reads
    * imbalance× the average list) and motivates re-training or cell
    * splitting long before recall decays. One slim scan of the cell
    * column (never v), one tiny aggregate.
    *
    * PHYSICAL stats by design: between an [[ivfIndexDelete]] and its
    * compaction the list sizes include tombstoned vectors — a probe's
    * scan cost IS the physical list until compaction rewrites it, and
    * maintenance decisions (compact, split, retrain) price the physical
    * layout, not the logical corpus. */
  def annIvfIndexStats(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = {
    val sizes = spark.table(s"${table}_ivf")
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    sizes.agg(
        count(lit(1)).as("n_cells"),
        sum(col("n")).as("n_vectors"),
        min(col("n")).as("min_list"),
        max(col("n")).as("max_list"),
        round(avg(col("n")), 4).as("avg_list"))
      .withColumn("imbalance",
        round(col("max_list").cast("double") / col("avg_list"), 4))
  }

  /** nprobe/recall sensitivity sweep across the compression ladder —
    * the `dedup_threshold_sweep` pattern applied to ANN tuning: one row
    * per (rung, nprobe) with recall@k against the brute-force truth,
    * pricing the recall/IO trade the single-point ladder numbers can't.
    * The round-13 sweep ran a FIXED shortlist and measured the dilution
    * effect (raw PQ recall DROPPING 0.167 → 0.125 at nprobe 8 — more
    * probed candidates under the same lossy ADC cut); since round 14 the
    * sweep runs the entry points' own derived default,
    * `shortlist = ShortlistPerProbe × nprobe` (override via
    * `shortlistPerProbe`), so the row now prices the tuning rule a
    * deployment actually uses — and recall is monotone in nprobe at
    * defaults (spec-asserted for all three rungs). All three rungs
    * serve from standing indexes over the same corpus; the truth side is
    * the already-oracled brute-force chain, so every recall value is
    * engine-reproducible. */
  def annNprobeSweep(spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame, tPq: String, tRes: String, tSq: String,
      nQueries: Int = 8, k: Int = 3,
      shortlistPerProbe: Int = ShortlistPerProbe,
      nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val truth = graft.CacheScope.track(
      bruteForceTopK(embeddings, nQueries, k)
        .select(col("qid"), col("vec_id")))
    val rows = for (np <- nprobes; (rung, res) <- Seq(
        "pq" -> (() => annIvfPqIndexedTopK(spark, tPq, nQueries, k, np,
          shortlistPerProbe * np)),
        "residual" -> (() => annIvfPqResidualTopK(spark, tRes, nQueries, k,
          np, shortlistPerProbe * np)),
        "sq8" -> (() => annIvfSqIndexedTopK(spark, tSq, nQueries, k, np,
          shortlistPerProbe * np)))) yield {
      val ann = res().select(col("qid").as("aqid"), col("vec_id").as("avid"))
      truth.join(ann,
          col("qid") === col("aqid") && col("vec_id") === col("avid"),
          "left_outer")
        .agg(round(count(col("avid")).cast("double")
          / count(lit(1)).cast("double"), 4).as("recall"))
        .select(lit(rung).as("rung"), lit(np).as("nprobe"), col("recall"))
    }
    rows.reduce(_.unionAll(_)).orderBy(col("rung"), col("nprobe"))
  }

  /** The sweep turned into a DECISION: per rung, the smallest swept
    * nprobe whose measured recall meets `target` — or the widest swept
    * one with `met = false` when none does (the honest answer: this
    * rung cannot reach the target at this shortlist scaling; move up
    * the compression ladder or widen the shortlist, both measured
    * trades recorded in BASELINE). Pure view-sized fold over the sweep
    * rows, factored out so the picking rule is testable without
    * standing indexes. */
  def nprobePick(sweep: DataFrame, target: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("rung"))
    sweep
      .withColumn("_pick", coalesce(
        min(when(col("recall") >= target, col("nprobe"))).over(w),
        max(col("nprobe")).over(w)))
      .filter(col("nprobe") === col("_pick"))
      .select(col("rung"), col("nprobe"), col("recall"),
        (col("recall") >= target).as("met"))
      .orderBy(col("rung"))
  }

  /** Two-knob tuning grid: the base nprobe sweep at the default
    * shortlist rule (shortlist = [[ShortlistPerProbe]] × nprobe), PLUS
    * shortlist-escalation legs — each escalation multiplier re-measured
    * at the WIDEST swept nprobe only. Rationale: probe width drives
    * candidate IO (each probe reads a whole inverted list), so nprobe is
    * exhausted first; the shortlist only widens the raw-vector rescore
    * join over already-read candidates, so it is the cheap second knob —
    * escalated exactly when the widest probe still misses the target
    * (measured here: raw PQ, whose ADC distortion under-ranks true
    * neighbors below the default cut — recall 0.58 → 0.75 from slpp 5 →
    * 10 at nprobe 8 while residual/SQ8 never need the second knob).
    * Output: (rung, nprobe, shortlist_per_probe, recall). */
  def annParamSweep(spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame, tPq: String, tRes: String, tSq: String,
      nQueries: Int = 8, k: Int = 3,
      nprobes: Seq[Int] = Seq(1, 2, 4, 8),
      escalateMults: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    val base = annNprobeSweep(spark, embeddings, tPq, tRes, tSq,
        nQueries, k, ShortlistPerProbe, nprobes)
      .withColumn("shortlist_per_probe", lit(ShortlistPerProbe))
    val esc = escalateMults.map { m =>
      annNprobeSweep(spark, embeddings, tPq, tRes, tSq, nQueries, k,
          ShortlistPerProbe * m, Seq(nprobes.max))
        .withColumn("shortlist_per_probe", lit(ShortlistPerProbe * m))
    }
    (base +: esc).reduce(_.unionByName(_))
      .select(col("rung"), col("nprobe"), col("shortlist_per_probe"),
        col("recall"))
  }

  /** The grid pick: per rung the CHEAPEST (shortlist_per_probe, nprobe)
    * meeting `target` — lexicographic, shortlist first, because a wider
    * shortlist leg only exists at the widest nprobe and a base-rule pick
    * at ANY nprobe is cheaper than escalating the rescore width; the
    * widest grid point with met=false when nothing meets. Same
    * view-sized testable fold shape as [[nprobePick]]. */
  def paramPick(sweep: DataFrame, target: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("rung"))
    val key = col("shortlist_per_probe") * lit(100000) + col("nprobe")
    sweep
      .withColumn("_key", key)
      .withColumn("_pick", coalesce(
        min(when(col("recall") >= target, col("_key"))).over(w),
        max(col("_key")).over(w)))
      .filter(col("_key") === col("_pick"))
      .select(col("rung"), col("nprobe"), col("shortlist_per_probe"),
        col("recall"), (col("recall") >= target).as("met"))
      .orderBy(col("rung"))
  }

  /** AUTO-TUNED probe width AND shortlist width across the compression
    * ladder: run the measured two-knob grid ([[annParamSweep]]) on the
    * warm indexes and pick per rung with [[paramPick]]. Since round 17
    * the tuner escalates the shortlist when the widest probe misses the
    * target, so every rung that CAN meet it reports its cheapest
    * meeting config (raw PQ: nprobe 8 × slpp 10) instead of a dead-end
    * met=false at the fixed rule. At 100 TB the grid runs on a sampled
    * validation slice once per index generation; the chosen config then
    * serves every query — tuning cost amortized, recall target explicit
    * instead of folklore. */
  def annNprobeAutoTune(spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame, tPq: String, tRes: String, tSq: String,
      target: Double = 0.7): DataFrame =
    paramPick(annParamSweep(spark, embeddings, tPq, tRes, tSq), target)

  /** Recall@k of the trained-IVF path against the brute-force truth —
    * the companion of [[annRecall]]: that row prices sign-sketch bucket
    * pruning, this one prices nprobe-bounded probing of TRAINED cells.
    * Both sides are oracled chains; the join is nQueries·k rows. */
  def annIvfTrainedRecall(embeddings: DataFrame, nQueries: Int = 8,
      k: Int = 3, nprobe: Int = 2): DataFrame = {
    val bf = bruteForceTopK(embeddings, nQueries, k)
      .select(col("qid"), col("vec_id"))
    val ann = annIvfTrainedTopK(embeddings, nQueries, k, nprobe)
      .select(col("qid").as("aqid"), col("vec_id").as("avid"))
    bf.join(ann, col("qid") === col("aqid") && col("vec_id") === col("avid"),
        "left_outer")
      .groupBy(col("qid"))
      .agg(round(count(col("avid")).cast("double") / count(lit(1)).cast("double"), 4)
        .as("recall"))
      .orderBy(col("qid"))
  }

  /** Recall@k of the multi-probe ANN against the brute-force ground truth —
    * the number that prices the ANN's candidate pruning: "the structure
    * scales" is only half the story; this measures what the pruning costs
    * in quality (per query id, the fraction of the true top-k the ANN
    * recovered). Both sides are the already-oracled queries, so the join is
    * tiny (nQueries·k rows each); recall ∈ [0, 1] with 1 = lossless. */
  def annRecall(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val bf = bruteForceTopK(embeddings, nQueries, k)
      .select(col("qid"), col("vec_id"))
    val ann = annMultiProbeTopK(embeddings, nQueries, k)
      .select(col("qid").as("aqid"), col("vec_id").as("avid"))
    bf.join(ann, col("qid") === col("aqid") && col("vec_id") === col("avid"),
        "left_outer")
      .groupBy(col("qid"))
      .agg(round(count(col("avid")).cast("double") / count(lit(1)).cast("double"), 4)
        .as("recall"))
      .orderBy(col("qid"))
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-similar in-bucket vectors BELOW the positive threshold — near
    * misses, not duplicates; the negatives that actually teach an
    * embedding model. Same bucket equi-join + broadcast probe shape as
    * [[annTopK]]; the positive cut (the [[nearDupPairs]] threshold)
    * drops would-be positives before ranking, so the window ranks only
    * the negative sliver. */
  def hardNegatives(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3,
      posThreshold: Double = 0.25): DataFrame = {
    val e = withNorm(vecs(embeddings)).withColumn("bucket", bucketCol(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      // the positive cut drops would-be positives BEFORE the heap cut, so
      // the bounded heaps (and the rank window over their output) see only
      // the negative sliver, slimmed to scalar columns
      .select(col("qid"), col("vec_id"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("cos"))
      .filter(col("cos") < posThreshold)
    rankedTopKPerQuery(scored, k)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Blocked near-duplicate pairs: sampled anchors joined only against
    * vectors in the same `label` block (the IVF/LSH-bucket join shape),
    * keeping pairs above a cosine threshold. */
  def nearDupPairs(embeddings: DataFrame, anchorMod: Int = 100,
      threshold: Double = 0.25): DataFrame = {
    val e = withNorm(vecs(embeddings))
    val anchors = e.filter(col("vec_id") % anchorMod === 0)
      .select(col("vec_id").as("src"), col("label"),
        col("v").as("av"), col("nrm").as("anrm"))
    anchors.join(
        e.withColumnRenamed("vec_id", "dst"), Seq("label"))
      .filter(col("src") =!= col("dst"))
      .withColumn("cos",
        round(cosFromNorms(col("av"), col("v"), col("anrm"), col("nrm")), 4))
      .filter(col("cos") >= threshold)
      .select(col("src"), col("dst"), col("cos"))
      .orderBy(col("src"), col("dst"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the trained
    * coarse quantizer (the [[Centroids.kmeansAssign]] argmin cells — the
    * paper's k-means step), then inside each cell drop every vector that
    * has a MORE-CANONICAL semantic duplicate at cosine >= `threshold`.
    * Canonical follows the paper's keep rule — LOWER cosine to the own
    * cell centroid survives ("we keep the one with the lowest similarity
    * to the centroid") — made a strict total order by a vec_id tiebreak,
    * so the keep set is deterministic and within a duplicate clique
    * exactly the minimal (ccos, vec_id) element survives.
    *
    * Unlike [[nearDupPairs]] (a pair LISTING over sampled anchors), this
    * produces the per-vector keep/drop DECISION over the whole corpus —
    * the thing a curation pipeline actually consumes.
    *
    * Shape at 100 TB: centroids are a broadcast; assignment is one slim
    * row per vector; the only quadratic piece is the within-cell pair
    * join, and the paper's own scale knob applies directly — cluster
    * count grows with the corpus (SemDeDup uses 50k clusters on LAION),
    * holding cell population and the per-cell candidate set flat. The
    * cell equi-join is the shape that survives; k = |labels| here only
    * because the quantizer is label-seeded (one deterministic k-means
    * round, the [[annIvfTrainedTopK]] contract). */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.35): DataFrame = {
    val cent = graft.CacheScope.track(Centroids.centroidVectors(embeddings))
    // ccos = cosine to the OWN cell's centroid (the canonical order), on
    // the integer-trained centroids decoded to doubles — both engines
    // decode c6/1e6 the same way, and the 6-decimal rounding absorbs
    // last-ulp divergence before ccos is COMPARED (not just displayed)
    val cv = transform(col("cvec"), c => c.cast("double") / lit(1000000.0))
    val celled = graft.CacheScope.track(
      assignedCells(embeddings, cent)
        .join(broadcast(cent), col("cell") === col("c_label"))
        .withColumn("ccos",
          round(cosFromNorms(col("v"), cv, col("nrm"), sqrt(dot(cv, cv))), 6))
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"), col("ccos")))
    val lhs = celled.select(col("vec_id").as("src"), col("cell"),
      col("v").as("av"), col("nrm").as("anrm"), col("ccos").as("accos"))
    // dropped ⇔ ∃ same-cell neighbor strictly more canonical at cos >= t;
    // equi-join on cell (never all-pairs), DISTINCT collapses witnesses
    // to one slim row per dropped vector before the flag join
    val dropped = celled.join(lhs, Seq("cell"))
      .filter(col("accos") < col("ccos") ||
        (col("accos") === col("ccos") && col("src") < col("vec_id")))
      .filter(round(cosFromNorms(col("av"), col("v"), col("anrm"), col("nrm")), 6)
        >= threshold)
      .select(col("vec_id")).distinct()
      .withColumn("kept", lit(false))
    celled.select(col("vec_id"), col("cell"), round(col("ccos"), 4).as("ccos"))
      .join(dropped, Seq("vec_id"), "left_outer")
      .withColumn("kept", coalesce(col("kept"), lit(true)))
      .orderBy(col("vec_id"))
  }

  /** Round-half-up at 6 decimals — mirrors Spark SQL `round(x, 6)` and
    * DuckDB `round(x, 6)` (both ties-away-from-zero on decimal digits),
    * so the driver-side greedy compares the same numbers the oracle
    * does. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein SIGIR'98)
    * diversified top-k — the diversity-selection shape a training-data
    * pipeline uses to avoid filling a retrieval budget with near-copies:
    * greedily pick argmax of `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`.
    *
    * Scale shape: the corpus-sized work is ONE shortlist ranking (here
    * the brute-force broadcast pass every `sim_*` baseline uses; the
    * warm IVF index serves the same shortlist at scale) cut to
    * `shortlist` rows, plus the shortlist's own pair-sim self-join
    * (shortlist² = 900 rows — candidate-capped, corpus-independent).
    * The greedy itself is O(k·shortlist) on that bounded frame and runs
    * driver-side over collected METADATA (ids + rounded sims — never
    * embeddings, never corpus-sized; the same bounded-decision class as
    * the autotune pick). Determinism: every comparison happens on
    * 6-decimal-rounded cosines with vec_id tiebreaks, the cross-engine
    * contract all ANN rows share, so the DuckDB oracle's unrolled greedy
    * reproduces the selection bit-for-bit. */
  def mmrRerank(embeddings: DataFrame, anchorId: Long = 0L,
      shortlist: Int = 30, k: Int = 8, lambda: Double = 0.7): DataFrame = {
    val e = withNorm(vecs(embeddings))
    val q = e.filter(col("vec_id") === anchorId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val cands = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= anchorId)
      .withColumn("rel", round(cosFromNorms(col("v"), col("qv"),
        col("nrm"), col("qnrm")), 6))
      .orderBy(desc("rel"), col("vec_id")).limit(shortlist)
      .select(col("vec_id"), col("v"), col("nrm"), col("rel"))
    mmrGreedy(cands, k, lambda)
  }

  /** [[mmrRerank]] served from the STANDING IVF index — the form a
    * 100 TB deployment runs: the shortlist comes from the DPP-pruned
    * probed cells (never a corpus-wide ranking), candidate vectors come
    * back from the lists via one broadcast-semi probe, and the greedy is
    * byte-identical to the scan form's. The oracle mirrors the probe
    * (same trained-IVF chain as every `sim_ann_ivf_*` row) and the same
    * unrolled greedy. */
  def mmrRerankIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, anchorId: Long = 0L, shortlist: Int = 30, k: Int = 8,
      lambda: Double = 0.7, nprobe: Int = 2): DataFrame = {
    val ids = annIvfIndexedTopK(spark, table, 1, shortlist, nprobe)
      .filter(col("qid") === anchorId).select(col("vec_id"))
    val lst = lists(spark, table)
    val anchor = lst.filter(col("vec_id") === anchorId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val cands = lst.join(broadcast(ids), "vec_id")
      .crossJoin(broadcast(anchor))
      .select(col("vec_id"), col("v"), col("nrm"),
        round(cosFromNorms(col("v"), col("qv"), col("nrm"), col("qnrm")), 6)
          .as("rel"))
    mmrGreedy(cands, k, lambda)
  }

  /** The greedy core shared by the scan and index-served MMR forms —
    * runs over an already-built candidate frame (vec_id, v, nrm, rel);
    * collects only ids + rounded sims (bounded by the shortlist cap). */
  private def mmrGreedy(cands0: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    val spark = cands0.sparkSession
    val cands = graft.CacheScope.track(cands0)
    val rels = cands.select(col("vec_id"), col("rel"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
      .sortBy(_._1)
    val sims = cands.select(col("vec_id").as("a"), col("v").as("av"),
        col("nrm").as("an"))
      .join(cands.select(col("vec_id").as("b"), col("v").as("bv"),
        col("nrm").as("bn")), col("a") < col("b"))
      .select(col("a"), col("b"),
        round(cosFromNorms(col("av"), col("bv"), col("an"), col("bn")), 6)
          .as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    def sim(x: Long, y: Long): Double =
      if (x < y) sims((x, y)) else sims((y, x))
    val relOf = rels.toMap
    // (1 − λ) in binary is NOT the double the oracle's decimal literal
    // parses to (1−0.7 = 0.30000000000000004 ≠ nearest(0.3)) — snap it
    val mu = round6(1 - lambda)
    var selected = Vector.empty[Long]
    var remaining = rels.map(_._1).toVector
    for (_ <- 1 to math.min(k, rels.length)) {
      val pick =
        if (selected.isEmpty) remaining.maxBy(c => (relOf(c), -c))
        else remaining.maxBy { c =>
          val ms = selected.map(s => sim(c, s)).max
          (round6(lambda * relOf(c) - mu * ms), -c)
        }
      selected = selected :+ pick
      remaining = remaining.filterNot(_ == pick)
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case (id, i) => (i + 1, id, relOf(id)) }
      .toDF("rank", "vec_id", "rel")
      .orderBy(col("rank"))
  }
}
