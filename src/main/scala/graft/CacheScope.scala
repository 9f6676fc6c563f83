package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for the persisted intermediate views some operators
  * need (multi-consumer subtrees on different exchange keys, where
  * ReusedExchange cannot merge the branches: q15's revenue view, the dedup
  * shingle views, lmScore's bigram view).
  *
  * The contract: `persist()` inside an operator caches for the SESSION —
  * Spark only frees the blocks at unpersist or session stop, so a
  * long-lived session issuing many DIFFERENT queries (Verify's 136, a
  * notebook) accumulates cached views indefinitely. Operators therefore
  * route persists through [[track]], and batch drivers call
  * [[unpersistAll]] at their query boundary (Verify after each dump, Bench
  * after each query's timed iterations — AFTER, not between, iterations:
  * Spark's CacheManager dedupes by logical plan, so a query's second
  * iteration reuses the first's warm cache, which BASELINE.md's best-of-2
  * numbers assume).
  *
  * Re-tracking an already-cached plan is safe: CacheManager dedupes the
  * storage; unpersisting both handles just drops the one entry.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val confUndo =
    new java.util.concurrent.ConcurrentLinkedDeque[() => Unit]()

  /** Persist (memory-and-disk) and register for the next [[unpersistAll]]. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    p
  }

  /** Set session confs for the CURRENT query's lifetime — restored (LIFO,
    * so re-entrant calls from Bench's second iteration unwind correctly)
    * at the driver's [[unpersistAll]] boundary. Exists for EXECUTION-time
    * confs (AQE knobs, join thresholds): a set/restore inside the query
    * builder would be undone before the driver ever executes the returned
    * plan, and a leaked set would bleed into every later query. */
  def scopedConf(spark: org.apache.spark.sql.SparkSession,
      kv: (String, String)*): Unit =
    kv.foreach { case (k, v) =>
      val prior = spark.conf.getOption(k)
      confUndo.addLast(() =>
        prior.fold(spark.conf.unset(k))(p => spark.conf.set(k, p)))
      spark.conf.set(k, v)
    }

  /** How many tracked views are currently live — read by Bench BEFORE its
    * query-boundary [[unpersistAll]]: a row that left tracked persists is
    * a warm-cache row (its committed band is the warm best-of-2 min), so
    * the slow-row iteration-2 skip must not fire for it. */
  def liveCount: Int = live.size

  /** Unpersist every tracked view (non-blocking) and restore every scoped
    * conf; returns how many views were freed. */
  def unpersistAll(): Int = {
    var n = 0
    var d = live.poll()
    while (d != null) { d.unpersist(false); n += 1; d = live.poll() }
    var u = confUndo.pollLast()
    while (u != null) { u(); u = confUndo.pollLast() }
    n
  }
}
