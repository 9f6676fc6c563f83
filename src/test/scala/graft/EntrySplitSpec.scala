package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the round-17 SparkEntry split: every row lives in exactly ONE
  * entry file (a duplicate key across files would silently shadow one
  * implementation through the `++` composition — the exact class of bug
  * the split exists to prevent), and the composed contract invariants the
  * driver relies on hold (oracle row per query, bench ⊆ queries). */
class EntrySplitSpec extends AnyFunSuite {

  test("entry-file query key sets are pairwise disjoint") {
    val byPart = SparkEntry.parts.map { case (n, q, _) => n -> q.keySet }
    for {
      (na, ka) <- byPart; (nb, kb) <- byPart if na < nb
    } assert((ka & kb).isEmpty, s"$na and $nb both register: ${(ka & kb).toSeq.sorted}")
  }

  test("entry-file oracle key sets are pairwise disjoint") {
    val byPart = SparkEntry.parts.map { case (n, _, o) => n -> o.keySet }
    for {
      (na, ka) <- byPart; (nb, kb) <- byPart if na < nb
    } assert((ka & kb).isEmpty, s"$na and $nb both register: ${(ka & kb).toSeq.sorted}")
  }

  test("every query has an oracle row and bench is a subset of queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle without query: ${(o -- q).toSeq.sorted}")
    val b = SparkEntry.benchQueries
    assert(b.distinct == b, "benchQueries has duplicates")
    assert((b.toSet -- q).isEmpty, s"bench rows not in queries: ${(b.toSet -- q).toSeq.sorted}")
  }

  test("row count matches the driver-observed round-16 contract floor") {
    // 265 rows at the r16 close; additions only ever grow this. A DROP
    // below the floor means a split/merge lost rows.
    assert(SparkEntry.queries.size >= 265, s"queries shrank: ${SparkEntry.queries.size}")
  }
}
