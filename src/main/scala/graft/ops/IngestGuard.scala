package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-proportional id-disjointness enforcement for the standing indexes
  * ([[Search.indexDelta]], [[Similarity.ivfIndexDelta]]).
  *
  * The precondition both ingests must enforce — "delta ids are NEW" — used
  * to be checked by semi-joining the standing index's id column against the
  * delta, an O(index) scan on every ingest that broke the modules' own
  * contract ("ingest cost is independent of index size"). This sidecar
  * restores the contract with the stats-row pattern: `{table}_guard` holds
  * ONE serialized bloom filter row per ingested batch (build writes the
  * first, each delta appends its own), so the ingest-time probe reads
  *   k tiny fixed-size blobs (k = number of batches so far) + the delta,
  * never the standing postings/inverted lists.
  *
  * Exactness: a bloom can false-positive but never false-negative, so a
  * MISS on every blob proves disjointness outright (the common case — one
  * delta-sized probe job and done). Only a HIT falls back to the exact
  * standing-column semi-probe, i.e. the expensive path runs precisely when
  * there is a real clash to report or an fpp-rare false suspect (per-id
  * fpp is sized so a clean BATCH false-suspects with probability ≤ ~5%
  * regardless of batch size — see [[fppFor]]).
  * Either way the thrown/silent outcome is identical to the old exact
  * check — PipelineOps-style result equality is unaffected.
  */
object IngestGuard {

  /** Ceiling false-suspect rate per id: a false positive costs one extra
    * (exact) sliver probe of the standing index, never a wrong outcome. */
  private val MaxFpp = 0.001

  /** Target probability that a CLEAN batch trips ANY false suspect.
    * Whole-batch suspicion is ≈ n·fpp, so a fixed per-id fpp degrades
    * with batch size (0.001 × a million-row batch = certain suspicion =
    * one standing-column probe per batch, silently re-breaking the
    * delta-proportional contract). The per-id fpp is therefore sized
    * per batch: fpp = min(MaxFpp, FalseSuspectBudget / n), floored at
    * 1e-9 (~6.5 bytes/id — a 1M-id blob is ~4.5 MB, still sidecar-
    * scale). */
  private val FalseSuspectBudget = 0.05

  private def fppFor(n: Long): Double =
    math.max(1e-9, math.min(MaxFpp, FalseSuspectBudget / n))

  private def guardTable(table: String) = s"${table}_guard"

  /** Executed-plan strings of the fast-path probes, recorded for the plan
    * guard spec: the contract "ingest never scans the standing index" is
    * asserted against these (see SearchIndexDenseSpec). */
  @volatile private[graft] var lastProbePlan: String = ""

  /** Write the guard row for a batch — a serialized bloom over the
    * batch's distinct ids (cast to string: build and probe hash the same
    * UTF8 keys). `overwrite = true` at index build (fresh sidecar),
    * `false` at delta ingest (append — additive, like the stats row).
    * Cost is one pass over the BATCH alone. An EMPTY batch writes
    * nothing: `stat.bloomFilter` has no bitmap for zero rows, and a
    * no-op blob would add probe cost for no coverage. */
  def write(spark: SparkSession, batch: DataFrame, idCol: String,
      table: String, overwrite: Boolean): Unit = {
    val keyed = batch.select(col(idCol).cast("string").as("k")).distinct()
    val n = keyed.count()
    if (n == 0) return
    val bloom = keyed.stat.bloomFilter("k", n, fppFor(n))
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    import spark.implicits._
    Seq(Tuple1(bos.toByteArray)).toDF("bloom").write
      .mode(if (overwrite) "overwrite" else "append")
      .format("parquet").saveAsTable(guardTable(table))
  }

  /** (generation count, cumulative blob bytes) of the guard sidecar —
    * the two sizes the compaction policy bounds. Every blob in the
    * sidecar is serialized into [[suspectPredicate]]'s probe plan as an
    * expression LITERAL and shipped to every task, so the BYTE total (not
    * just the row count) must stay bounded: sixteen 1M-id batches at the
    * 1e-9 fpp floor is ~72 MB of plan literals — fine rows-wise, hostile
    * bytes-wise. Reads k tiny (1-long) rows via a length-only projection;
    * never deserializes a bloom. (0, 0) when no sidecar exists. */
  def sidecarSize(spark: SparkSession, table: String): (Long, Long) = {
    if (!spark.catalog.tableExists(guardTable(table))) (0L, 0L)
    else {
      val r = spark.table(guardTable(table))
        .agg(count(lit(1)), coalesce(sum(length(col("bloom"))), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
  }

  /** The shared compaction-trigger policy every guarded index family
    * runs (bm25 postings, IVF lists, fuzzy grams): due when ingest
    * generations exceed `maxBatches` OR the sidecar's cumulative blob
    * bytes exceed `maxSidecarBytes` (each blob ships into the ingest
    * probe plan as an expression literal, so the BYTE total must stay
    * bounded regardless of batch sizes). ONE site, so a future trigger
    * dimension cannot silently diverge between families. Reads k tiny
    * sidecar rows, never the index. */
  def compactionDue(spark: SparkSession, table: String, maxBatches: Int,
      maxSidecarBytes: Long): Boolean = {
    val (generations, sidecarBytes) = sidecarSize(spark, table)
    generations > maxBatches || sidecarBytes > maxSidecarBytes
  }

  /** The OR-of-blobs suspicion predicate over `idCol` (each blob becomes
    * one codegen'd `bloom_might_contain` term), or None when the sidecar
    * doesn't exist (an index built before the guard landed) — the caller
    * must then treat EVERY id as suspect. A row where the predicate is
    * false is PROVEN absent from the standing index (blooms have no false
    * negatives); a true is a suspicion to confirm exactly — on the
    * suspect SLIVER only, which is true replays + fpp-rare misses, never
    * the whole delta. */
  def suspectPredicate(spark: SparkSession, table: String,
      idCol: String): Option[org.apache.spark.sql.Column] = {
    graft.functions.BloomMightContain.register(spark)
    if (!spark.catalog.tableExists(guardTable(table))) None
    else {
      val blobs = spark.table(guardTable(table)).collect()
        .map(_.getAs[Array[Byte]]("bloom"))
      Some(blobs
        .map(b => call_function("bloom_might_contain",
          col(idCol).cast("string"), lit(b)))
        .reduce(_ || _))
    }
  }

  /** Fast-path membership suspicion: does ANY `idCol` value in `delta`
    * hit a guard bloom? Reads the sidecar + the delta only, never the
    * standing index. `false` PROVES disjointness; `true` is a suspicion
    * the caller confirms exactly. Returns `true` outright if the sidecar
    * doesn't exist, degrading to the caller's exact path — never to a
    * wrong answer. */
  def mightClash(spark: SparkSession, table: String, delta: DataFrame,
      idCol: String): Boolean =
    suspectPredicate(spark, table, idCol) match {
      case None => true
      case Some(hit) =>
        val probe = delta.select(col(idCol)).distinct().filter(hit)
        lastProbePlan = probe.queryExecution.executedPlan.toString
        probe.take(1).nonEmpty
    }

  /** Throw if any `idCol` value in `delta` already exists in the standing
    * index. Fast path: [[mightClash]]. Exact fallback (`standing`, built
    * lazily) runs only on a bloom hit. */
  def assertDisjoint(spark: SparkSession, table: String, delta: DataFrame,
      idCol: String, standing: => DataFrame, what: String): Unit = {
    if (mightClash(spark, table, delta, idCol)) {
      val clash = standing.select(col(idCol))
        .join(broadcast(delta.select(col(idCol)).distinct()),
          Seq(idCol), "left_semi")
        .take(1)
      require(clash.isEmpty,
        s"$what precondition violated: delta contains $idCol value(s) " +
          s"already in the standing index (e.g. ${clash.headOption.map(_.get(0))}); " +
          "re-ingest would silently corrupt the additive index state")
    }
  }
}
