package graft

/** Pins the bench PRICING REGIME for the warm standing layouts: after
  * `WarmIndex.prebuildAll`, constructing and running every benched
  * warm-served row must trigger ZERO additional builds — if a failed or
  * skipped prebuild ever let a query row rebuild a layout inline, its
  * recorded time would silently absorb build cost and the committed
  * bands would be meaningless (VERDICT r19 "what's wrong" item 3). The
  * spec drives the SAME SparkEntry closures the bench times, so a new
  * row that sneaks an inline build in goes red here. */
class WarmIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("benched warm-served rows find every standing layout pre-existing " +
      "(no inline build after prebuildAll)") {
    graft.ops.WarmIndex.prebuildAll(spark, sfDir)
    val before = graft.ops.WarmIndex.buildCount.get()
    // every benched row that serves from a WarmIndex layout (the *_query
    // twins plus the graph family, which shares the standing adjacency)
    val warmServed = Seq(
      "graph_ppr_query", "graph_ppr_batch", "graph_ppr_recommend_query",
      "graph_ppr_converged", "graph_ppr_converged_batch",
      "graph_label_prop_students", "graph_kcore_students",
      "graph_feature_agg", "graph_adamic_adar_query",
      "graph_clustering_query", "graph_adj_delta", "graph_adj_delete",
      "sim_ann_ivf_query", "sim_ann_ivfpq_query", "sim_ann_ivfsq_query",
      "sim_ann_ivfpqr_query", "bm25_query", "bm25_phrase_query",
      "fuzzy_search_query", "fuzzy_batch_query", "fuzzy_skip_query",
      "sim_mmr_query", "u2_token_correct_indexed")
    warmServed.foreach { name =>
      assert(SparkEntry.benchQueries.contains(name),
        s"$name dropped from benchQueries — update this spec's list")
      val n0 = graft.ops.WarmIndex.buildCount.get()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      assert(graft.ops.WarmIndex.buildCount.get() === n0,
        s"$name triggered an inline warm build — its bench number would " +
          "price the build, not the query")
      CacheScope.unpersistAll()
    }
    assert(graft.ops.WarmIndex.buildCount.get() === before)
  }
}
