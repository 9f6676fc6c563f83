package graft

/** CacheScope's conf scoping: values pinned for a query must restore at the
  * driver's unpersistAll boundary, and re-entrant sets (Bench runs a query's
  * builder once per iteration before ONE boundary call) must unwind LIFO to
  * the ORIGINAL value, not an intermediate. */
class CacheScopeSpec extends SparkSpec {

  test("scopedConf restores originals at the boundary, LIFO under re-entry") {
    val k1 = "spark.graft.test.scoped1"
    val k2 = "spark.graft.test.scoped2"
    spark.conf.set(k1, "orig")
    try {
      // first "iteration" of a query builder
      CacheScope.scopedConf(spark, k1 -> "exp", k2 -> "exp")
      assert(spark.conf.get(k1) === "exp")
      assert(spark.conf.get(k2) === "exp")
      // second iteration re-enters before any boundary (Bench's shape):
      // the prior it captures is the experiment value
      CacheScope.scopedConf(spark, k1 -> "exp", k2 -> "exp")
      CacheScope.unpersistAll()
      // LIFO drain: the inner undo (to "exp") runs first, the outer undo
      // (to the true originals) runs last and wins
      assert(spark.conf.get(k1) === "orig")
      assert(spark.conf.getOption(k2) === None, "unset key must be unset again")
    } finally {
      spark.conf.unset(k1)
      spark.conf.unset(k2)
    }
  }

  test("unpersistAll frees tracked views and reports the count") {
    import spark.implicits._
    val before = CacheScope.unpersistAll() // drain anything left over
    val ds = CacheScope.track(Seq(1, 2, 3).toDF("x"))
    assert(ds.count() === 3)
    assert(ds.storageLevel.useMemory || ds.storageLevel.useDisk)
    assert(CacheScope.unpersistAll() === 1)
    assert(before >= 0)
  }
}
