package graft

/** Reconciliation diagnostic: prints the query/bench/oracle set sizes and
  * differences straight from the code, so BASELINE.md's gate notes can be
  * checked against reality in one command (`runMain graft.ListSets`).
  * Invariants it makes visible: every `queries` row must have an
  * `oracleSql` row, and `benchQueries` must be a subset of `queries`. */
object ListSets {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val b = SparkEntry.benchQueries.toSet
    val o = SparkEntry.oracleSql.keySet
    println("N_QUERIES=" + q.size + " N_BENCH=" + b.size + " N_ORACLE=" + o.size)
    println("EXCLUDED=" + (q -- b).toSeq.sorted.mkString(","))
    println("BENCH_NOT_Q=" + (b -- q).toSeq.sorted.mkString(","))
    println("Q_NOT_ORACLE=" + (q -- o).toSeq.sorted.mkString(","))
  }
}
