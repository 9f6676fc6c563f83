package graft

/** Smoke: the driver's entry contract — flagship query returns rows. */
class EntrySmokeSpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }
  test("every bench query exists") {
    val missing = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty)
  }
  test("every registered query returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      // drivers free views + restore scoped execution confs per query;
      // mirror that here so one query's AQE knobs can't bleed into the next
      CacheScope.unpersistAll()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
