package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over the `documents`
  * table: exact (hash groupBy), MinHash+LSH (shingle → minhash → band →
  * bucket join), n-gram Jaccard verification, and SimHash fingerprints.
  *
  * Hash portability: every hash is `md5` over an explicit string, and
  * "minimum hash" = lexicographic min of the hex string — identical in any
  * engine, so the DuckDB oracle reproduces signatures bit-for-bit (no
  * engine-specific murmur seeds anywhere).
  *
  * Scale shape: everything is explode → hash-partitioned groupBy/join on
  * high-cardinality keys (shingle, band key, doc pair) — no all-pairs
  * product ever materializes; LSH bounds the candidate set, and the exact
  * Jaccard verify runs only on candidates.
  */
object Dedup {

  /** Whitespace-normalized lowercase text (the dedup canonical form).
    * Explicit class, not \s: Java's \s includes \x0B while DuckDB's RE2 \s
    * does not — the explicit class keeps engine and oracle bit-identical
    * on any input. */
  val WsClass = "[ \\t\\n\\f\\r]"

  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), s"$WsClass+", " ")

  def words(c: Column): Column = split(normText(c), " ")

  /** 3-word shingles (0-based `w[i]` in Spark SQL); docs shorter than 3
    * words contribute their whole text as one shingle. */
  private val shinglesExpr: String =
    "CASE WHEN size(w) >= 3 THEN " +
    "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])) " +
    "ELSE array(array_join(w, ' ')) END"

  /** (doc_id, sh) — distinct 3-shingles per document. */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(array_distinct(expr(shinglesExpr))).as("sh"))

  /** Exact dedup: group by content hash; keeper = min doc id per group
    * (standard keep-first policy). One shuffle on the hash. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(normText(col("text")).cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .orderBy(col("h"))

  val NumHashes = 8
  val NumBands = 4 // rows-per-band r = 2

  /** MinHash signature: h_i = min over shingles of md5("i|" ++ shingle)
    * (lexicographic min over hex = a valid uniform min-hash, and portable).
    *
    * Computed by the single-pass native [[graft.functions.MinHashSigs]]
    * expression INSIDE the scan stage — zero shuffle, zero shingle
    * row blow-up (the dataflow form below is kept as the proven-equal
    * reference; MinHashSpec pins the equality). */
  def minhashSignature(docs: DataFrame): DataFrame = {
    graft.functions.MinHashSigs.register(docs.sparkSession)
    docs.select(col("doc_id"),
        call_function("minhash_sigs", words(col("text"))).as("hs"))
      .select(col("doc_id") +:
        (0 until NumHashes).map(i => col("hs").getItem(i).as(s"h$i")): _*)
  }

  /** Dataflow form of the signature from an exploded (doc_id, sh) set:
    * explode → groupBy doc_id with partial min aggregation map-side (one
    * small shuffle). Kept as the reference implementation the expression
    * path is proven equal to. */
  def minhashSignatureOf(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(
        min(md5(concat(lit("0|"), col("sh")).cast("binary"))).as("h0"),
        (1 until NumHashes).map(i =>
          min(md5(concat(lit(s"$i|"), col("sh")).cast("binary"))).as(s"h$i")): _*)

  /** LSH banding: band key j = md5(h_{2j} ++ h_{2j+1}); docs sharing any
    * band key are candidate near-duplicates. The band join key has high
    * cardinality (hash values), so the self-join partitions evenly — this is
    * the structure that replaces the O(n²) all-pairs compare at 100 TB. */
  def lshBands(docs: DataFrame): DataFrame = {
    val sig = minhashSignature(docs)
    val bandStructs = (0 until NumBands).map { j =>
      struct(lit(j).as("b"),
        md5(concat(col(s"h${2 * j}"), col(s"h${2 * j + 1}")).cast("binary")).as("k"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.b").as("b"), col("e.k").as("k"))
  }

  /** Sketch-level corpus health from the band table alone — no pair list
    * materialized: per band, the bucket count, the largest bucket (the
    * hot key a band join must survive), and the collision pair mass
    * Σ n·(n−1)/2 (how many candidate pairs that band would emit). Rising
    * collision mass = duplicate-heavy corpus; the numbers that size the
    * [[lshCandidatePairs]] job BEFORE running it. One groupBy cascade, integer
    * outputs, |bands| rows. */
  def bandStats(docs: DataFrame): DataFrame =
    lshBands(docs).groupBy(col("b"), col("k")).agg(count(lit(1)).as("n"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_bucket"),
        sum(expr("n * (n - 1) div 2")).as("collision_pairs"))
      .orderBy(col("b"))

  /** Candidate near-duplicate pairs from LSH bucket collisions.
    *
    * Self-join via aliases with the src/dst rename AFTER the join: both
    * sides then canonicalize to the identical (scan → minhash_sigs → band)
    * subtree under the same (b, k) exchange, so Spark's ReusedExchange
    * computes the whole signature pass ONCE and reads the shuffle twice.
    * Renaming before the join (the obvious spelling) defeats the reuse and
    * doubles the most expensive stage — measured 2.6s → 1.7s at sf0.1, and
    * at 100 TB it's a full corpus re-shingle saved. */
  def lshCandidatePairs(docs: DataFrame): DataFrame = {
    val bands = lshBands(docs)
    bands.as("a")
      .join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .distinct()
      .orderBy("src", "dst")
  }

  /** (src, dst, ncommon, na, nb) for the LSH candidate pairs — the
    * verify-side intersection chain shared by [[ngramJaccard]] and
    * [[containment]]. Three consumers of the exploded shingle set
    * (per-doc sizes, both verify join sides) on THREE different exchange
    * keys — exchange reuse can't merge them, so cache the one shingle
    * pass (same persisted-view rationale as q15). The LSH candidate side
    * no longer reads it at all: signatures come from the map-side
    * MinHashSigs expression. Tracked in CacheScope: batch drivers
    * unpersist at their query boundary.
    *
    * `spark.graft.verifySliver` (default false) picks which side of the
    * scale trade the verify pass runs on, read at PLAN TIME:
    *  - false: the verify joins read the full persisted shingle view.
    *    Measured faster at test SF (1.94s vs 2.9s at sf0.1 originally):
    *    no extra barrier, the verify and LSH stages overlap.
    *  - true: the candidate pairs are materialized (CacheScope) and the
    *    verify shingle view is first SEMI-JOINED to the candidate doc ids
    *    — the [[incrementalNearDup]] restriction lifted into the batch
    *    path. At 100 TB this is the only viable side: the collided sliver
    *    is orders of magnitude smaller than the corpus, and the full-view
    *    form would shuffle every document's shingles into the verify join.
    * Both paths are oracle-gated (`ngram_jaccard` / `dedup_jaccard_sliver`)
    * and proven row-identical in `MinHashSpec`; measured numbers for both
    * sit in SCALING.md. */
  private def pairIntersections(docs: DataFrame): DataFrame = {
    val sliver = docs.sparkSession.conf
      .get("spark.graft.verifySliver", "false").toBoolean
    val sh = graft.CacheScope.track(shingles(docs))
    val pairs =
      if (sliver) graft.CacheScope.track(lshCandidatePairs(docs))
      else lshCandidatePairs(docs)
    // sliver mode: restrict the verify view to docs that actually collided
    // (their FULL shingle sets survive the semi-join, so sizes and
    // intersections are unchanged — only non-candidate docs drop out)
    val vsh = if (sliver) {
      val candIds = pairs.select(col("src").as("doc_id"))
        .union(pairs.select(col("dst").as("doc_id"))).distinct()
      sh.join(candIds, Seq("doc_id"), "left_semi")
    } else sh
    val sizes = vsh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val aSh = vsh.select(col("doc_id").as("src"), col("sh"))
    val bSh = vsh.select(col("doc_id").as("dst"), col("sh"))
    pairs.join(aSh, "src").join(bSh, Seq("dst", "sh"))
      .groupBy("src", "dst").agg(count(lit(1)).as("ncommon"))
      .join(sizes.withColumnRenamed("doc_id", "src").withColumnRenamed("nsh", "na"), "src")
      .join(sizes.withColumnRenamed("doc_id", "dst").withColumnRenamed("nsh", "nb"), "dst")
  }

  def ngramJaccard(docs: DataFrame): DataFrame =
    pairIntersections(docs)
      .select(col("src"), col("dst"),
        round(col("ncommon").cast("double") /
          (col("na") + col("nb") - col("ncommon")).cast("double"), 4).as("jaccard"))
      .orderBy("src", "dst")

  /** Threshold sweep for [[ngramJaccard]]'s candidate thresholds. */
  val SweepThresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** Dedup-threshold sensitivity audit: for each candidate Jaccard
    * threshold, how many verified pairs survive and how many distinct
    * documents they touch — the tuning artifact that prices a threshold
    * choice BEFORE committing a corpus-sized dedup run (pick t where the
    * affected-docs curve bends, not by folklore). One pass over the
    * verified candidate pairs (already LSH-bounded, never all-pairs)
    * crossed with the broadcast 5-row threshold dim. */
  def thresholdSweep(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val j = graft.CacheScope.track(ngramJaccard(docs))
    val t = broadcast(SweepThresholds.toDF("t"))
    val surviving = j.crossJoin(t).filter(col("jaccard") >= col("t"))
    val pairsPerT = surviving.groupBy(col("t"))
      .agg(count(lit(1)).as("n_pairs"))
    // distinct docs on EITHER side of a surviving pair
    val docsPerT = surviving
      .select(col("t"), explode(array(col("src"), col("dst"))).as("doc_id"))
      .groupBy(col("t")).agg(countDistinct(col("doc_id")).as("n_docs"))
    pairsPerT.join(docsPerT, Seq("t"))
      .select(col("t"), col("n_pairs"), col("n_docs"))
      .orderBy(col("t"))
  }

  /** Asymmetric containment for the LSH candidate pairs — the
    * quote/boilerplate detector symmetric Jaccard misses: a short doc
    * fully embedded in a long one has containment |A∩B|/|A| ≈ 1 with
    * low Jaccard. Alongside the exact value, the sketch-only estimate
    * (est Jaccard = matching-signature fraction, converted with the
    * exact sizes) — the recall audit for running containment off
    * signatures alone at scale, same measure-don't-assume policy as
    * `sim_ann_recall`/`sketch_cms_topterms`. */
  def containment(docs: DataFrame): DataFrame = {
    val sig = minhashSignature(docs)
    val matches = (0 until NumHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    val sigPairs = lshCandidatePairs(docs)
      .join(sig.as("a"), col("src") === col("a.doc_id"))
      .join(sig.as("b"), col("dst") === col("b.doc_id"))
      .select(col("src"), col("dst"),
        (matches.cast("double") / lit(NumHashes.toDouble)).as("j_est"))
    pairIntersections(docs)
      .join(sigPairs, Seq("src", "dst"))
      .select(col("src"), col("dst"),
        round(col("ncommon").cast("double") / col("na").cast("double"), 4)
          .as("containment_exact"),
        // est |A∩B| = J·|A∪B| with |A∪B| = (|A|+|B|)/(1+J); over |A|
        round(col("j_est") * (col("na") + col("nb")).cast("double") /
          ((lit(1.0) + col("j_est")) * col("na").cast("double")), 4)
          .as("containment_est"))
      .orderBy("src", "dst")
  }

  /** The composed training-data keep-set — the full pipeline shape: cheap
    * quality filter first (prunes before expensive ops), exact-dedup keepers,
    * then greedy near-dup removal (drop the higher doc_id of every LSH
    * candidate pair whose exact 3-gram Jaccard ≥ threshold). */
  def keepSet(docs: DataFrame, jaccardThreshold: Double = 0.5): DataFrame = {
    val qualityKeep = TextAnalysis.quality(docs)
      .filter(col("quality") === "keep").select(col("doc_id"))
    val exactKeepers = exact(docs).select(col("keeper").as("doc_id"))
    val nearDupDrops = ngramJaccard(docs)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("dst").as("doc_id"))
    qualityKeep
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(nearDupDrops, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** EXACT similarity join via prefix filtering (Chaudhuri/Xiao
    * PPJoin-family): every pair with Jaccard ≥ `t` over 3-shingles —
    * with NO false negatives, unlike the MinHash/LSH path, whose bands
    * can miss a qualifying pair. The price is exactness's candidate set;
    * the prefix filter keeps it tractable:
    *
    * Order shingles globally by (document frequency asc, shingle); a
    * doc's PREFIX is its first |A| − ⌈t·|A|⌉ + 1 shingles in that order.
    * Theorem: J(A,B) ≥ t ⟹ the prefixes intersect — so candidates come
    * from an equi-join on prefix shingles only. Ordering rare-first is
    * what makes the join balanced: prefix tokens are the LOWEST-df
    * shingles, so bucket sizes stay small where an arbitrary order would
    * funnel every doc through the corpus's boilerplate shingles.
    *
    * Shape at 100 TB: df table = one count-agg (vocabulary-sized);
    * per-doc sort of its own shingle list (array_sort, per-row); prefix
    * explode is a ≤(1−t/(1+t))·|A| fan-out; the candidate join is
    * hash-equi on rare keys; the exact-overlap verify joins the shingle
    * view on the candidate sliver. Never all-pairs. */
  def prefixFilterPairs(docs: DataFrame,
      t: Double = 0.5): DataFrame = {
    val sh = graft.CacheScope.track(shingles(docs))
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // rare-first global order as a SORTABLE STRING key (zero-padded df +
    // shingle tie-break) — sorting strings is bit-identical across
    // engines where struct sorts would not be
    val ordered = sh.join(df, "sh")
      .select(col("doc_id"),
        concat(format_string("%010d", col("df")), lit("|"), col("sh")).as("okey"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("okey"))).as("sorted"),
        count(lit(1)).as("sz"))
    val prefix = ordered.select(col("doc_id"), col("sz"),
        posexplode(slice(col("sorted"), lit(1),
          (col("sz") - ceil(col("sz") * t) + 1).cast("int")))
          .as(Seq("pos", "okey")))
      .select(col("doc_id"), col("sz"), col("pos"),
        expr("substr(okey, 12)").as("sh"))
    // Two prunes ride the join, both before the distinct and verify:
    //  - length filter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs whose
    //    sizes differ by more than t can never qualify;
    //  - PPJoin positional filter: for the FIRST shared token, at 0-based
    //    prefix positions (i, j), every common token sits at-or-after it in
    //    both sorted lists, so overlap ≤ 1 + min(|A|-1-i, |B|-1-j); J ≥ t
    //    needs overlap ≥ ⌈t(|A|+|B|)/(1+t)⌉. Keeping a pair when ANY
    //    shared occurrence passes is a superset of first-occurrence PPJoin
    //    (later occurrences only loosen the kept set), so no false
    //    negatives — the filter only shrinks the candidate sliver.
    val alpha = ceil((col("a.sz") + col("b.sz")) * lit(t) / lit(1.0 + t))
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            greatest(col("a.sz"), col("b.sz")) * t &&
          (lit(1) + least(col("a.sz") - 1 - col("a.pos"),
            col("b.sz") - 1 - col("b.pos"))).cast("double") >= alpha)
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .distinct()
    // exact verify on the candidate sliver: |A∩B| via the shingle view
    val inter = cands
      .join(sh.select(col("doc_id").as("src"), col("sh")), "src")
      .join(sh.select(col("doc_id").as("dst"), col("sh")), Seq("dst", "sh"))
      .groupBy(col("src"), col("dst"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= t)
      .select(col("src"), col("dst"), col("jaccard"))
      .orderBy(col("src"), col("dst"))
  }

  /** Source-priority canonical selection: for every EXACT-dup cluster
    * (same content fingerprint), keep the copy from the highest-priority
    * source (curated mirrors beat raw crawls in a real recipe; here the
    * deterministic [[Sampling.sourceWeights]] dim stands in), tie-broken
    * by min doc_id. Refines [[exact]]'s min-id keeper with the policy a
    * production pipeline actually wants.
    *
    * Shape at 100 TB: one shuffle on the fingerprint (same exchange a
    * groupBy would need); the window's per-key row count is the dup
    * multiplicity (tiny), so no skew funnel. Weights are a broadcast
    * dim. Output is |dup clusters|-sized — singletons drop out. */
  def canonicalKeepers(docs: DataFrame): DataFrame = {
    val fps = docs.select(col("doc_id"), col("source"),
      md5(normText(col("text")).cast("binary")).as("fp"))
    val weighted = fps.join(
      broadcast(Sampling.sourceWeights(docs)), "source")
    val byFp = Window.partitionBy(col("fp"))
    val ranked = weighted
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .withColumn("rk", row_number().over(
        byFp.orderBy(desc("keep_below"), col("doc_id"))))
    ranked.filter(col("n_dups") >= 2 && col("rk") === 1)
      .select(col("fp"), col("doc_id").as("keeper"),
        col("source").as("keeper_source"),
        col("keep_below").as("priority"), col("n_dups"))
      .orderBy(col("keeper"))
  }

  /** Near-duplicate CLUSTERS: connected components over the verified
    * Jaccard pairs (GraphX), keeper = min doc_id per component. The
    * principled completion of [[keepSet]]'s greedy pair drop: transitive
    * chains a—b—c collapse to ONE keeper even when (a, c) itself never
    * collided in any LSH band. Every doc is a vertex (singletons form
    * their own component), edges are only the verified pairs — the graph
    * is linear in docs + near-dup pairs, never quadratic. */
  def nearDupComponents(docs: DataFrame,
      jaccardThreshold: Double = 0.5): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    val spark = docs.sparkSession
    val pairs = ngramJaccard(docs).filter(col("jaccard") >= jaccardThreshold)
    val vertices = docs.select(col("doc_id")).rdd
      .map(r => (r.getLong(0): VertexId, r.getLong(0)))
    val edges = pairs.select(col("src"), col("dst")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val cc = Graph(vertices, edges).connectedComponents().vertices
    spark.createDataFrame(cc.map { case (id, comp) => (id, comp) })
      .toDF("doc_id", "component")
      .withColumn("is_keeper", (col("doc_id") === col("component")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** INCREMENTAL maintenance of the near-dup COMPONENT assignment — the
    * continuous-ingest shape of [[nearDupComponents]] (the one derived
    * dedup artifact that still required a full-corpus recompute per crawl
    * batch). New edges can only merge EXISTING components THROUGH delta
    * docs (index-index pairs are unchanged by ingest), so the affected
    * graph CONTRACTS each touched index component to its label vertex:
    * vertices = delta ids ∪ touched component labels, edges =
    * delta↔component(index) pairs (banded probe + sliver verify,
    * [[incrementalNearDup]]) ∪ delta↔delta pairs — delta-sized, never
    * corpus-sized. Exactness: a component's label IS its min member id,
    * so min over a contracted CC's vertex ids = min over the union of its
    * old members and delta ids = the from-scratch label; the relabel map
    * (old label → new) touches only components whose label actually
    * changed, and the corpus-side rewrite is affected-components-only.
    * Returns the full post-delta assignment; the oracle recomputes it
    * FROM SCRATCH over index ∪ delta (the `dedup_components` literal,
    * shared verbatim), so the hash match re-proves the maintenance
    * identity every run — the [[graft.graph.GraphOps.adjacencyDelta]]
    * discipline for the dedup family. */
  def componentsDelta(index: DataFrame, delta: DataFrame,
      jaccardThreshold: Double = 0.5): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    val spark = index.sparkSession
    // the standing state (in production: a maintained table; derived here
    // so the DuckDB oracle can reproduce the whole chain). Two consumers:
    // the contraction join and the corpus-side relabel.
    val standing = graft.CacheScope.track(
      nearDupComponents(index, jaccardThreshold)
        .select(col("doc_id"), col("component")))
    val di = incrementalNearDup(index, delta, jaccardThreshold)
      .select(col("delta_id"), col("index_id"))
    val dd = ngramJaccard(delta).filter(col("jaccard") >= jaccardThreshold)
      .select(col("src"), col("dst"))
    val contracted = di.join(standing, di("index_id") === standing("doc_id"))
      .select(col("delta_id").as("src"), col("component").as("dst"))
      .unionByName(dd)
    val vtx = delta.select(col("doc_id"))
      .unionByName(contracted.select(col("src").as("doc_id")))
      .unionByName(contracted.select(col("dst").as("doc_id")))
      .distinct()
    val cc = Graph(
      vtx.rdd.map(r => (r.getLong(0): VertexId, r.getLong(0))),
      contracted.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1)))
      .connectedComponents().vertices
    val newLabels = graft.CacheScope.track(
      spark.createDataFrame(cc.map { case (id, comp) => (id, comp) })
        .toDF("node", "newcomp"))
    // relabel only the old components whose label CHANGED (merged with a
    // sibling, or a smaller delta id took the min) — broadcast-sized: the
    // map is bounded by the touched-component count
    val relabel = broadcast(newLabels
      .join(standing.select(col("component")).distinct(),
        newLabels("node") === col("component"))
      .filter(col("newcomp") =!= col("node"))
      .select(col("node").as("component"), col("newcomp")))
    val updatedIndex = standing
      .join(relabel, Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("newcomp"), col("component")).as("component"))
    val deltaLabels = delta.select(col("doc_id"))
      .join(newLabels, col("doc_id") === newLabels("node"), "left")
      .select(col("doc_id"),
        coalesce(col("newcomp"), col("doc_id")).as("component"))
    updatedIndex.unionByName(deltaLabels)
      .withColumn("is_keeper", (col("doc_id") === col("component")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Incremental near-dup check: a DELTA batch of new documents against an
    * already-INDEXED corpus — the continuous-ingest shape of the pipeline.
    * Candidates come from a band equi-join of the delta's (map-side)
    * signatures against the index's; the exact Jaccard verify then runs on
    * the collided SLIVER only (index shingles semi-joined to candidates —
    * the materialize-between-phases economics ngramJaccard's doc describes,
    * here structural because the delta is small by construction). In
    * production the index side's bands/shingles are precomputed once and
    * stored; here both derive from the same table split so the DuckDB
    * oracle can reproduce the whole thing. Output: every (delta, index)
    * pair with Jaccard ≥ threshold. */
  def incrementalNearDup(index: DataFrame, delta: DataFrame,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val ib = lshBands(index).select(col("doc_id").as("index_id"), col("b"), col("k"))
    val db = lshBands(delta).select(col("doc_id").as("delta_id"), col("b"), col("k"))
    val cand = db.join(ib, Seq("b", "k"))
      .select(col("delta_id"), col("index_id")).distinct()
    val dSh = shingles(delta).select(col("doc_id").as("delta_id"), col("sh"))
    val iSh = shingles(index).select(col("doc_id").as("index_id"), col("sh"))
      .join(cand.select(col("index_id")).distinct(), Seq("index_id"), "left_semi")
    val dSizes = dSh.groupBy("delta_id").agg(count(lit(1)).as("na"))
    val iSizes = iSh.groupBy("index_id").agg(count(lit(1)).as("nb"))
    cand.join(dSh, "delta_id").join(iSh, Seq("index_id", "sh"))
      .groupBy("delta_id", "index_id").agg(count(lit(1)).as("ncommon"))
      .join(dSizes, "delta_id").join(iSizes, "index_id")
      .select(col("delta_id"), col("index_id"),
        round(col("ncommon").cast("double") /
          (col("na") + col("nb") - col("ncommon")).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .orderBy(col("delta_id"), col("index_id"))
  }

  /** Per-document triangle counts in the verified near-dup graph (GraphX
    * TriangleCount over the same vertices/edges as [[nearDupComponents]]).
    * Triangles measure cluster DENSITY: a component that is a clique
    * (mutual near-dups — safe to keep one doc) is triangle-rich, while a
    * chained component (a—b—c with no a—c edge, the transitive-drift case)
    * has none. Same linear-in-pairs graph; TriangleCount's message load is
    * Σ deg² over the near-dup graph, which is tiny by construction. */
  def nearDupTriangles(docs: DataFrame,
      jaccardThreshold: Double = 0.5): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
    val spark = docs.sparkSession
    val pairs = ngramJaccard(docs).filter(col("jaccard") >= jaccardThreshold)
    val vertices = docs.select(col("doc_id")).rdd
      .map(r => (r.getLong(0): VertexId, r.getLong(0)))
    val edges = pairs.select(col("src"), col("dst")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val tc = Graph(vertices, edges)
      .partitionBy(PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices
    spark.createDataFrame(tc.map { case (id, n) => (id, n) })
      .toDF("doc_id", "triangles")
      .orderBy(col("doc_id"))
  }

  /** SimHash near-duplicate candidate pairs, Manku-style (the WWW'07
    * "Detecting Near-Duplicates for Web Crawling" structure): split the
    * 32-bit fingerprint into 4 byte-bands — any pair within Hamming
    * distance 3 shares at least one intact band (pigeonhole) — equi-join on
    * (band, byte) to get candidates ≪ n², then verify exact Hamming
    * distance with bit_count(xor). The same two-phase
    * bucket-then-verify shape as MinHash LSH, on a 10× cheaper signature. */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.SimHash32.register(spark)
    val sig = docs.select(col("doc_id"),
      call_function("simhash32", words(col("text"))).as("sh"))
    val bands = sig.select(col("doc_id"), col("sh"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("byte", expr("(sh >> (band * 8)) & 255"))
    // alias self-join, rename after: identical subtrees under the
    // (band, byte) exchange → ReusedExchange computes the simhash pass once
    // (same structure-for-reuse rationale as lshCandidatePairs)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct() // a pair can collide in several bands
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("src"), col("dst"))
  }

  /** 32-bit SimHash over word unigrams. Bit b of a word's contribution comes
    * from hex digit b/4 of md5(word) (4 bits per hex char); the fingerprint
    * bit is the sign of the per-bit contribution sum. Pure integer math →
    * engine-portable. Two cascaded aggregations, both hash-partitioned. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("wd"))
      .select(col("doc_id"), md5(col("wd").cast("binary")).as("m"))
      .select(col("doc_id"), expr("explode(sequence(0, 31))").as("b"), col("m"))
      .select(col("doc_id"), col("b"),
        expr("2 * pmod(shiftright(instr('0123456789abcdef', substring(m, CAST(b DIV 4 AS INT) + 1, 1)) - 1, " +
          "CAST(pmod(b, 4) AS INT)), 2) - 1").as("contrib"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("CAST(power(2, b) AS BIGINT)")).otherwise(0L)).as("simhash"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------- substring-level dedup

  /** Passage window width (words) for substring-level duplication — the
    * word-anchored stand-in for Lee et al.'s exact-substring dedup
    * (suffix arrays don't distribute; word-aligned K-gram windows do). */
  val SubstrK = 8

  /** Every K-word window per document, WITH multiplicity (a passage
    * repeated inside one doc is duplication too — unlike [[shingles]],
    * no array_distinct). Docs shorter than K words carry no window.
    * Row count = corpus word count; the gram string is K words wide, so
    * downstream grouping keys are hashed where the string itself never
    * surfaces ([[docDupSpans]]). */
  def substringWindows(docs: DataFrame): DataFrame = {
    val cols = (0 until SubstrK).map(j => s"w[i+$j]").mkString(", ")
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= SubstrK)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(w)-$SubstrK), i -> concat_ws(' ', $cols))")).as("gram"))
  }

  /** The duplicated-passage table: top-`topK` K-word windows occurring
    * more than once corpus-wide — (gram, n_occ, n_docs, min_doc), ordered
    * (n_occ DESC, gram). One shuffle on the gram, then a bounded
    * TakeOrderedAndProject; never materializes the full sorted table. */
  def substringDups(docs: DataFrame, topK: Int = 100): DataFrame =
    substringWindows(docs)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_occ") >= 2)
      .orderBy(col("n_occ").desc, col("gram"))
      .limit(topK)

  /** Per-document duplicated-span accounting — the filter signal of
    * substring dedup: how much of each doc is corpus-duplicated passage.
    * 100 TB shape: the window table is grouped and semi-joined on the
    * 8-byte xxhash64 of the gram (the string never surfaces, so the
    * K-word key rides the shuffles as a fixed-width integer); the cached
    * window pass is shared by the total count and the duplicate join. */
  def docDupSpans(docs: DataFrame): DataFrame = {
    val w = graft.CacheScope.track(
      substringWindows(docs).select(col("doc_id"), xxhash64(col("gram")).as("gh")))
    val dup = w.groupBy(col("gh")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2).select(col("gh"))
    val tot = w.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
    val dupPerDoc = w.join(dup, Seq("gh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    tot.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_windows"), 4))
      .orderBy(col("doc_id"))
  }
}
