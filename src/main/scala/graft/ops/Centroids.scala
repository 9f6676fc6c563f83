package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecSumAggregator

/** Per-label embedding centroids — the aggregation half of IVF/k-means
  * training over an embedding corpus (the assignment half is
  * [[Similarity]]'s cell joins).
  *
  * Determinism contract: embeddings are QUANTIZED per element
  * (round(x·1000) as long, one IEEE double multiply from the exact
  * float→double widening — bit-identical in any engine) before summing.
  * Integer sums are exact and associative, so the centroid cannot depend
  * on partition layout or merge order — the property float summation
  * loses and the reason this op can carry a hash-matching oracle at all.
  * The quantization loss (≤0.5e-3 per element) is the price, and real
  * pipelines pay it happily (PQ/IVF quantize far more aggressively).
  *
  * Shape at 100 TB: one pass; the typed [[VecSumAggregator]] keeps a
  * single (count, sums[64]) buffer per label per partition, so the
  * exchange carries fixed-size buffers — never 64× exploded rows. The
  * long-form output (label, dim, value) exists for the driver gate
  * (array cells crash it) and is |labels|·dims rows — tiny. */
object Centroids {

  val Scale = 1000L

  /** (label, dim, centroid, n) — centroid rounded to 6dp. */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val quantized = embeddings.select(
      col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * Scale).cast("long")).as("q"))
      .as[(Int, Array[Long])]
    val summed = quantized
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VecSumAggregator.toColumn.name("acc"))
      .toDF("label", "acc")
      .select(col("label"), col("acc._1").as("n"), col("acc._2").as("sums"))
    summed
      .select(col("label"), col("n"), posexplode(col("sums")).as(Seq("dim", "s")))
      .select(col("label"), col("dim"),
        round(col("s").cast("double") / (lit(Scale.toDouble) * col("n")), 6)
          .as("centroid"),
        col("n"))
      .orderBy(col("label"), col("dim"))
  }

  /** One k-means/IVF ASSIGNMENT step against [[labelCentroids]]: each
    * vector moves to its nearest centroid. Output (vec_id, label,
    * assigned, moved).
    *
    * Exactness trick: distances are compared in INTEGER space — the
    * vector at scale 10^3·10^3 (quantized element × 10^3) and the 6dp
    * centroid at scale 10^6, so Σ(x·10^6-ish − c·10^6)² is an exact
    * bigint (≤ ~10^15·dims, no overflow), order-free, and argmin with a
    * label tie-break is fully deterministic in any engine. Float-space
    * distance sums would make the assignment depend on addition order —
    * un-oracle-able.
    *
    * Shape at 100 TB: centroids are k·dims values — a broadcast literal;
    * assignment is one scan with a fold per (vector, centroid), k·dims
    * multiplies per row, no shuffle until the (optional) recompute. */
  /** (c_label, cvec) — the label-seeded centroids as 6dp-scaled integer
    * vectors (c6 longs): the broadcastable trained-quantizer form shared
    * by [[kmeansAssign]] and [[Similarity.annIvfTrainedTopK]]. */
  private[ops] def centroidVectors(embeddings: DataFrame): DataFrame =
    labelCentroids(embeddings)
      .withColumn("c6", round(col("centroid") * lit(1000000.0)).cast("long"))
      .groupBy(col("label").as("c_label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c6")))).as("cd"))
      .select(col("c_label"), transform(col("cd"), s => s("c6")).as("cvec"))

  def kmeansAssign(embeddings: DataFrame): DataFrame = {
    val cent = centroidVectors(embeddings)
    val quantized = embeddings.select(
      col("vec_id"), col("label"),
      transform(col("embedding"),
        x => (round(x.cast("double") * Scale).cast("long") * lit(1000L))).as("xq"))
    val dist = aggregate(
      zip_with(col("xq"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    quantized.join(broadcast(cent))
      .select(col("vec_id"), col("label"), col("c_label"), dist.as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("label"),
        col("best.c_label").as("assigned"),
        (col("best.c_label") =!= col("label")).as("moved"))
      .orderBy(col("vec_id"))
  }

  /** Subvectors per embedding (64 dims → 8 × 8-dim subspaces). */
  val SubSpaces = 8

  /** Product-quantization ENCODE: each vector compresses to one code per
    * subspace — the code of the nearest subspace-codebook centroid. The
    * codebook is the label centroids restricted to each subspace (a
    * deterministic, data-derived codebook: what one k-means round from
    * the label seeding would give, matching [[kmeansAssign]]'s framing).
    * 64 floats become 8 small ints — the 32× compression that lets a
    * 100 TB embedding corpus fit scan-speed ANN re-ranking.
    *
    * Same exactness contract as [[kmeansAssign]]: distances compare in
    * integer space per subspace, so codes are layout-independent and
    * oracle-able. Codebook = SubSpaces · k · dims/SubSpaces values — a
    * broadcast literal; the only shuffle is the argmin groupBy over
    * vec×subspace rows (bounded 8× fan-out, not dims×). */
  /** The per-subspace codebook (sub, c_label, cvec) — SubSpaces·labels
    * rows. Production trains this offline once; [[pqRecall]] materializes
    * it once per query via CacheScope so the LUT build and the code
    * assignment don't each re-aggregate the corpus. */
  private[ops] def pqCodebook(embeddings: DataFrame): DataFrame = {
    val subDims = 64 / SubSpaces
    labelCentroids(embeddings)
      .withColumn("c6", round(col("centroid") * lit(1000000.0)).cast("long"))
      .withColumn("sub", (col("dim") / subDims).cast("int"))
      .groupBy(col("sub"), col("label").as("c_label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c6")))).as("cd"))
      .select(col("sub"), col("c_label"), transform(col("cd"), s => s("c6")).as("cvec"))
  }

  def pqCodes(embeddings: DataFrame): DataFrame =
    pqCodes(embeddings, pqCodebook(embeddings))

  /** Residual PQ codebook size — matches the 10-label raw codebook so
    * the raw-vs-residual recall comparison is size-for-size honest. */
  val PqK = 10

  /** Lloyd iterations the residual codebook trains for (assign →
    * group-mean, repeated). Each extra round re-assigns every training
    * residual against the previous round's codebook and re-means — the
    * standard k-means refinement; the exact-integer assignment and the
    * c6 mean rounding keep every round engine-reproducible, so the
    * oracle unrolls the same number of rounds.
    *
    * Pinned at 1 by MEASUREMENT (round 13): rounds ∈ {1, 2, 3} give
    * bit-identical recall@3 on both sf0.001 (0.25) and sf0.01 (0.2917)
    * — on this near-uniform corpus the sample-seeded codebook converges
    * after one round, so extra rounds buy nothing and triple the
    * training cost. The recall levers that DO move the number are
    * nprobe (0.25 → 0.46 at sf0.001 going 2 → 8) and shortlist (which
    * must scale WITH nprobe: at sf0.01, nprobe=8 at shortlist=10 scores
    * BELOW nprobe=4 — more probed candidates dilute a fixed lossy ADC
    * cut) — the trade `sim_ann_nprobe_sweep` prices. */
  private[ops] val ResidualLloydRounds = 1

  /** RESIDUAL PQ codebook — the per-subspace codebook for coarse-cell
    * residuals (the IVFADC composition of Jégou et al., TPAMI 2011:
    * encode r = x − centroid(cell(x)), which strips the part of x the
    * coarse quantizer already explains, so PQ spends its codes on the
    * much tighter residual distribution). Training is SAMPLE-SEEDED +
    * [[ResidualLloydRounds]] Lloyd round(s): seeds are the [[PqK]] lowest-vec_id training
    * residual vectors (codes 0..PqK−1 in id order — the deterministic
    * analog of k-means random init; label-MEAN seeding is structurally
    * degenerate here, because residuals within a cell average ≈ 0 and
    * every code collapses to the origin), each training residual
    * subvector is assigned to its nearest seed by exact integer
    * distance, and the codebook entry is the per-group mean via the
    * identical [[labelCentroids]]→c6 rounding pipeline (6dp unit mean ×
    * 10^6 as a long) — layout-independent and oracle-able like every
    * other quantizer here. A (sub, code) group that attracts no members
    * simply has no entry (its seed always attracts itself, so this only
    * happens to codes shadowed by an identical lower-coded seed slice —
    * both engines drop them identically). Input rows are (vec_id, rvec:
    * array<long> at scale 10^6 — exact integer residuals); output
    * schema matches [[pqCodebook]]: (sub, c_label, cvec). */
  private[ops] def residualCodebook(residuals: DataFrame): DataFrame =
    residualCodebook(residuals, ResidualLloydRounds)

  private[ops] def residualCodebook(residuals: DataFrame,
      rounds: Int): DataFrame = {
    val subDims = 64 / SubSpaces
    val w = Window.orderBy(col("vec_id"))
    // PqK lowest-id residuals as seeds (a TakeOrdered of PqK rows; the
    // single-partition window runs over those PqK rows only)
    val seedBook = residuals.select(col("vec_id"), col("rvec"))
      .orderBy(col("vec_id")).limit(PqK)
      .withColumn("c_label", (row_number().over(w) - 1).cast("int"))
      .select(col("c_label"), posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          s => slice(col("rvec"), s * subDims + 1, lit(subDims))))
        .as(Seq("sub", "cvec")))
      .select(col("sub"), col("c_label"), col("cvec"))
    // one Lloyd round: assign every training residual subvector to its
    // nearest codebook entry (exact integer argmin), codebook entry :=
    // per-group mean via the identical labelCentroids→c6 rounding
    def lloyd(book: DataFrame): DataFrame = {
      val assigned = pqCodesFromInt(
          residuals.select(col("vec_id"), col("rvec").as("xq")), book)
        .withColumnRenamed("code", "c_label")
      residuals
        .select(col("vec_id"), posexplode(col("rvec")).as(Seq("dim", "r")))
        .withColumn("sub", (col("dim") / subDims).cast("int"))
        .join(assigned, Seq("vec_id", "sub"))
        .groupBy(col("c_label"), col("dim"))
        .agg(sum(col("r")).as("s"), count(lit(1)).as("n"))
        .select(col("c_label"), col("dim"),
          round(round(col("s").cast("double") / (lit(1000000.0) * col("n")), 6)
            * 1000000.0).cast("long").as("c6"))
        .withColumn("sub", (col("dim") / subDims).cast("int"))
        .groupBy(col("sub"), col("c_label"))
        .agg(array_sort(collect_list(struct(col("dim"), col("c6")))).as("cd"))
        .select(col("sub"), col("c_label"),
          transform(col("cd"), s => s("c6")).as("cvec"))
    }
    // intermediate codebooks are SubSpaces·PqK rows — pin each so round
    // i+1's broadcast assignment doesn't re-derive round i's aggregation
    (1 to rounds).foldLeft(seedBook) { (book, i) =>
      val next = lloyd(book)
      if (i == rounds) next else next.localCheckpoint()
    }
  }

  /** PQ ENCODE over already-quantized integer vectors (vec_id, xq:
    * array<long>) — the [[pqCodes]] argmin without the float→integer
    * quantization step, for encoding residuals (which are exact integers
    * by construction) against a [[residualCodebook]]. */
  private[ops] def pqCodesFromInt(ints: DataFrame, cent: DataFrame): DataFrame = {
    val subDims = 64 / SubSpaces
    val subs = ints.select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          s => slice(col("xq"), s * subDims + 1, lit(subDims)))).as(Seq("sub", "xs")))
    val dist = aggregate(
      zip_with(col("xs"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    subs.join(broadcast(cent), "sub")
      .select(col("vec_id"), col("sub"), col("c_label"), dist.as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.c_label").as("code"))
  }

  private[ops] def pqCodes(embeddings: DataFrame, cent: DataFrame): DataFrame = {
    val subDims = 64 / SubSpaces
    val subs = embeddings.select(
      col("vec_id"),
      transform(col("embedding"),
        x => (round(x.cast("double") * Scale).cast("long") * lit(1000L))).as("xq"))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          s => slice(col("xq"), s * subDims + 1, lit(subDims)))).as(Seq("sub", "xs")))
    val dist = aggregate(
      zip_with(col("xs"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    subs.join(broadcast(cent), "sub")
      .select(col("vec_id"), col("sub"), col("c_label"), dist.as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("c_label"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.c_label").as("code"))
      .orderBy(col("vec_id"), col("sub"))
  }

  /** Shortlist recall of PQ asymmetric-distance search: the fraction of
    * the exact L2 top-k that survives in the ADC top-`shortlist` — the
    * operative metric for how PQ is deployed (compressed-domain
    * shortlist, exact re-rank on the survivors), and the number that
    * prices the 32× compression (companion to `sim_ann_recall`, which
    * prices candidate pruning). The synthetic near-uniform embeddings
    * are PQ's WORST case (no cluster structure for 10 codes per
    * subspace to exploit), which is exactly why the gate measures
    * rather than assumes.
    *
    * This runs the REAL ADC structure: a per-query lookup table
    * (queries × subspaces × codes = a few hundred exact integer
    * distances, the table every PQ scan precomputes), then scoring a
    * candidate = 8 LUT lookups summed — here a broadcast equi-join on
    * (sub, code) + a sum, never a float op. Both sides rank by
    * (distance, vec_id), so the gate is deterministic and oracle-able
    * end to end.
    *
    * With `bucketPrune = true` this becomes the full IVF-PQ ladder: ADC
    * scoring runs only inside the query's sign-sketch bucket
    * ([[Similarity.bucketCol]] — the coarse quantizer), i.e. candidates
    * ≈ N/2^planes AND each candidate costs 8 lookups instead of 64
    * multiplies. The recall number then prices pruning + compression
    * TOGETHER, completing the ladder `sim_ann_recall` (pruning only)
    * and plain pqRecall (compression only) bracket. */
  def pqRecall(embeddings: DataFrame, nQueries: Int = 8, k: Int = 3,
      shortlist: Int = 10, bucketPrune: Boolean = false): DataFrame = {
    val subDims = 64 / SubSpaces
    val quantized = embeddings.select(
      col("vec_id"),
      transform(col("embedding"),
        x => (round(x.cast("double") * Scale).cast("long") * lit(1000L))).as("xq"))
    val queries = quantized.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("xq").as("qv"))
    val dist = aggregate(
      zip_with(col("qv"), col("xq"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, d) => acc + d)
    val byQ = Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))

    val exactTopK = quantized.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), dist.as("d2"))
      .withColumn("rk", row_number().over(byQ)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"))

    // ADC lookup table: per (query, subspace, code) exact distance — the
    // codebook is materialized ONCE and shared with the code assignment
    // below (two consumers; freed at the driver's query boundary)
    val codebook = graft.CacheScope.track(pqCodebook(embeddings))
    val cent = codebook.withColumnRenamed("c_label", "code")
    val qSubs = queries.select(col("qid"), posexplode(
        transform(sequence(lit(0), lit(SubSpaces - 1)),
          s => slice(col("qv"), s * subDims + 1, lit(subDims))))
        .as(Seq("sub", "qs")))
    val lutDist = aggregate(
      zip_with(col("qs"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, d) => acc + d)
    val lut = qSubs.join(broadcast(cent), "sub")
      .select(col("qid"), col("sub"), col("code"), lutDist.as("sd2"))

    // bucket pruning (IVF coarse quantizer): keep only (query, candidate)
    // pairs sharing a sign-sketch bucket before ADC scoring
    val prune: DataFrame => DataFrame =
      if (!bucketPrune) identity
      else {
        graft.functions.DotProduct.register(embeddings.sparkSession)
        val buckets = embeddings.select(col("vec_id"),
          Similarity.bucketCol(col("embedding").cast("array<double>")).as("bucket"))
        val qb = buckets.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("qid"), col("bucket"))
        df => df.join(buckets, "vec_id").join(broadcast(qb), Seq("qid", "bucket"))
          .drop("bucket")
      }

    val adcTopK = prune(pqCodes(embeddings, codebook)
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("qid")))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("sd2")).as("d2"))
      .withColumn("rk", row_number().over(byQ)).filter(col("rk") <= shortlist)
      .select(col("qid").as("aqid"), col("vec_id").as("avid"))

    exactTopK.join(adcTopK,
        col("qid") === col("aqid") && col("vec_id") === col("avid"), "left_outer")
      .groupBy(col("qid"))
      .agg(round(count(col("avid")).cast("double") / count(lit(1)), 4).as("recall"))
      .orderBy(col("qid"))
  }

  /** Embedding-quality audit: per label, how many vectors sit
    * anomalously far from their OWN label centroid — the
    * mislabeled/corrupted-embedding detector an embedding pipeline runs
    * before the vectors feed retrieval or dedup (a bad encoder batch or
    * a label error shows up as own-cluster distance outliers long
    * before recall metrics move).
    *
    * Exactness: distances are the same exact-bigint (x·10³·10³ − c·10⁶)²
    * sums as [[kmeansAssign]]; they down-scale by an integer floor-div
    * (10⁸) so the per-label moment sums (Σd, Σd²) stay inside longs,
    * then mean/σ/flag use one identically-spelled IEEE expression per
    * engine — the [[Histograms.outliers]] discipline (2σ, the audit's
    * recall-leaning threshold). At 100 TB the Σd² long bound caps a
    * label around 10⁶ vectors at this scale — beyond that, the same
    * shape with DECIMAL(38) sums.
    *
    * Shape: centroids broadcast (k·dims literal), ONE scan computes every
    * vector's own-centroid distance (no argmin fan-out — the join is on
    * the label), cached across the two moment passes; stats side is a
    * |labels|-row broadcast. */
  def embeddingOutliers(embeddings: DataFrame): DataFrame = {
    val cent = centroidVectors(embeddings)
    val quantized = embeddings.select(
      col("vec_id"), col("label"),
      transform(col("embedding"),
        x => (round(x.cast("double") * Scale).cast("long") * lit(1000L))).as("xq"))
    val dist = aggregate(
      zip_with(col("xq"), col("cvec"), (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, d) => acc + d)
    val dq = graft.CacheScope.track(
      quantized.join(broadcast(cent), col("label") === col("c_label"))
        .select(col("vec_id"), col("label"), dist.as("d2"))
        // TRUE integer div (a double round-trip loses ulps near 2^53)
        .select(col("vec_id"), col("label"),
          expr("d2 div 100000000").as("d")))
    val stats = dq.groupBy("label").agg(
        count(lit(1)).as("n"), sum(col("d")).as("s1"),
        sum(col("d") * col("d")).as("s2"))
      .select(col("label"), col("n"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean_d"),
        when(col("n") <= 1, lit(0.0)).otherwise(
          sqrt((col("n").cast("double") * col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
            (col("n").cast("double") * (col("n") - 1).cast("double"))))
          .as("std_d"))
    dq.join(broadcast(stats), "label")
      .groupBy(col("label"), col("n"), col("mean_d"), col("std_d"))
      .agg(sum(when(abs(col("d").cast("double") - col("mean_d")) >
          lit(2.0) * col("std_d"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("label"), col("n"),
        round(col("mean_d"), 4).as("mean_dist"),
        round(col("std_d"), 4).as("std_dist"),
        col("n_outliers"))
      .orderBy(col("label"))
  }
}
