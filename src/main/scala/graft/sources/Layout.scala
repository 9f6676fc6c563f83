package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side data layout for the 100 TB sink path.
  *
  * Two levers, composable:
  *
  *   - '''Compaction / file sizing''': `repartitionByRange(n, sortKey)` +
  *     `sortWithinPartitions` + `maxRecordsPerFile` yields exactly-n sorted,
  *     size-bounded, non-overlapping files — no small-files problem, and
  *     range-disjoint files make parquet min/max footer stats prune range
  *     scans to the files that can match.
  *
  *   - '''Z-ordering''': sort by the interleaved
  *     [[graft.functions.ZValue]] key instead of a single column, so EVERY
  *     file holds a bounded rectangle of the 2-D key space — selective
  *     filters on EITHER dimension skip most files via footer stats, where
  *     a single-column sort clusters only its own column (the other
  *     dimension spans the full domain in every file). This is the
  *     standard lakehouse OPTIMIZE ZORDER structure, expressed with plain
  *     Spark writer primitives.
  */
object Layout {

  /** df with a `__z` column appended (registers the native expression). */
  def withZKey(df: DataFrame, x: Column, y: Column): DataFrame = {
    graft.functions.ZValue.register(df.sparkSession)
    df.withColumn("__z", call_function("z_value", x.cast("long"), y.cast("long")))
  }

  /** Range-compacted write: `numFiles` sorted, non-overlapping files of
    * bounded row count. Returns the file count written. */
  def writeRangeCompacted(df: DataFrame, sortKey: Column, dir: String,
      numFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    df.repartitionByRange(numFiles, sortKey)
      .sortWithinPartitions(sortKey)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)
  }

  /** Z-ordered write: files tile the (x, y) key space in Z-curve order.
    *
    * Dimensions are EQUI-DEPTH BUCKETIZED before interleaving — raw
    * values are useless z inputs whenever the dimensions' varying bit
    * widths differ (day-of-epoch ~19,7xx with 6 varying bits vs a 4-bit
    * user id: the wider dimension owns every high z bit and the narrower
    * one never clusters; measured exactly so on the events table). Rank
    * normalization is what production z-ordering does too (Delta's
    * OPTIMIZE ZORDER interleaves range-partition ids). The bucket
    * boundaries come from `approxQuantile` (distributed Greenwald-Khanna;
    * the driver receives only `buckets-1` doubles), and the bucket lookup
    * is a codegen'd comparison chain — no shuffle beyond the final range
    * partition. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, dir: String,
      numFiles: Int, buckets: Int = 16): Unit = {
    val tagged = df
      .withColumn("__zx", x.cast("long"))
      .withColumn("__zy", y.cast("long"))
    val zd = withZKey(tagged,
      bucketOf(tagged, "__zx", buckets), bucketOf(tagged, "__zy", buckets))
    zd.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__zx", "__zy")
      .write.mode("overwrite").parquet(dir)
  }

  /** Hive-style date-partitioned write — the third layout lever:
    * DIRECTORY-level partition pruning. Footer min/max stats (the two
    * levers above) prune after a file is opened; directory partitioning
    * prunes before any file is touched — a date-range filter lists only
    * the matching `event_date=…/` directories, which at 100 TB is the
    * difference between a metadata operation and a full listing. The
    * partition column must stay bounded-cardinality (days — not user
    * ids), or the small-files problem this module exists to prevent
    * comes back through the directory tree. */
  /** CO-LOCATED fact-fact join via write-side bucketing — the third
    * layout lever, and at 100 TB the biggest one: a fact×fact equi-join
    * (orders×lineitem on orderkey) normally shuffles BOTH inputs; with
    * both tables written `bucketBy(n, key).sortBy(key)` on the SAME key
    * with the SAME bucket count, Spark's SortMergeJoin consumes the
    * bucketed scans directly — ZERO exchange on either side
    * (`BucketedJoinSpec` plan-asserts it): the network cost, which is
    * the 100 TB cost, moves to WRITE time, paid once, amortized over
    * every subsequent join — the standard warehouse discipline (Hive
    * bucketed tables, lakehouse clustered tables) expressed with plain
    * writer primitives. A LOCAL per-partition sort remains in the join
    * plan: Spark deliberately does not propagate sortBy file order from
    * bucketed scans (a bucket spread over several files would
    * interleave), so the nearly-sorted runs re-sort in memory — cheap,
    * no IO, no network; `sortBy` still pays for itself via run-merge
    * locality and parquet footer stats. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def writeDatePartitioned(events: DataFrame, dir: String): Unit =
    events.withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

  /** The catalog-table twin of [[writeDatePartitioned]] — partitions
    * tracked in the catalog so retention ([[enforceRetention]]) and
    * day-replacement ([[backfillDay]]) are DDL/metadata operations. */
  def writeDatePartitionedTable(events: DataFrame, table: String): Unit =
    events.withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date")
      .format("parquet").saveAsTable(table)

  /** RETENTION enforcement on a date-partitioned table: drop every
    * partition strictly before `keepFrom` via catalog DDL — METADATA
    * ONLY. At 100 TB a retention pass that reads, filters, or rewrites
    * data is a failure mode: row-level retention on a date-partitioned
    * fact is a lie (the partition IS the retention unit — that is what
    * the layout lever bought), and the drop must cost |expired
    * partitions| catalog calls, zero scans, zero shuffles (spec-gated:
    * zero Spark jobs run). Returns the dropped partition values; the
    * boundary partition and everything above stay byte-identical. */
  def enforceRetention(spark: SparkSession, table: String,
      dateCol: String, keepFrom: String): Seq[String] = {
    val victims = spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0).split("=")(1)).filter(_ < keepFrom).sorted
    victims.foreach { v =>
      spark.sql(
        s"ALTER TABLE $table DROP IF EXISTS PARTITION ($dateCol = '$v')")
    }
    victims.toSeq
  }

  /** Idempotent DAILY BACKFILL: replace exactly one day's partition
    * with a corrected load — `INSERT OVERWRITE` under DYNAMIC partition
    * overwrite, so only the partitions present in `corrected` rewrite
    * and every other day's files are untouched (the daily-batch
    * idempotence contract: re-running a day's job converges instead of
    * duplicating, without the read-modify-write a MERGE would cost).
    * The caller guarantees `corrected` carries the full replacement
    * content for its day(s) — partition replacement, not row upsert. */
  def backfillDay(spark: SparkSession, table: String,
      corrected: DataFrame): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // v1 insertInto is POSITION-based: `corrected` must carry the
    // table's data columns in order; event_date lands last (the
    // partition column's slot in a partitionBy saveAsTable layout)
    try corrected.withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** The date dimension for the partitioned fact — distinct event dates
    * with calendar attributes. |dates| rows: a true dimension, always
    * broadcastable. A dim-side filter (e.g. `is_weekend`) reaches the
    * fact scan via DYNAMIC partition pruning: Spark injects the dim's
    * surviving keys into the fact's partition filters at runtime — the
    * star-schema join never lists non-matching `event_date=…`
    * directories even though the fact itself carries no date predicate. */
  def dateDim(events: DataFrame): DataFrame =
    events.select(to_date(col("ts")).as("event_date")).distinct()
      .withColumn("is_weekend", dayofweek(col("event_date")).isin(1, 7))

  /** Equi-depth bucket id (0..buckets-1) of `name` as a when-chain on the
    * approx quantile boundaries. */
  private def bucketOf(df: DataFrame, name: String, buckets: Int): Column = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val qs = df.stat.approxQuantile(name, probs, 0.001)
    var e = when(col(name) <= qs(0), 0L)
    var i = 1
    while (i < qs.length) { e = e.when(col(name) <= qs(i), i.toLong); i += 1 }
    e.otherwise((buckets - 1).toLong)
  }
}
