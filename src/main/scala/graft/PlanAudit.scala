package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans of key queries for scale review. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(args.lift(1).getOrElse("/tmp/plans.txt"))
    for (name <- Seq("s2_point_lookup", "q1_agg", "q3_top_revenue",
        "q5_region_revenue", "q7_volume", "q9_profit",
        "j8_asof_join", "j9_range_join", "sim_topk_custom",
        "j3_recommend", "fuzzy_search_lev", "edges_backfill", "sim_topk_bruteforce",
        "j4_pair_relationship", "j2_rare_token_pairs", "sim_ann_ivf", "q10_returned_items",
        "q12_priority_class", "q13_order_distribution", "q15_top_supplier",
        "q16_supplier_cnt", "q21_sole_returner", "q22_idle_customers", "sim_ann_recall",
        "w6_gapfill", "a9_percentiles", "text_clean", "sample_split", "f14_json_extract",
        "text_repetition", "decontam_overlap", "text_pii", "sample_stratified",
        // round-7 additions
        "a12_equidepth", "a11_histogram", "u2_token_correct",
        "dedup_prefix_pairs", "decontam_bloom", "search_hybrid_rrf",
        // round-8 additions
        "search_hybrid_dense", "search_hybrid_dense_ann", "bm25_indexed",
        "corpus_report", "bpe_merges", "bpe_encode", "dedup_substring",
        "dedup_doc_spans", "sketch_cms_topterms", "sample_token_budget",
        "layout_datepart",
        // round-11: the restored events family + the lifecycle capstones
        "w1_event_windows", "w2_sessionize", "w5_sliding_counts",
        "w8_funnel", "w9_retention", "a13_outliers",
        "bm25_index_compact", "sim_ann_ivf_index_compact",
        // round-12: the PQ-fused index + the retrain policy + the
        // residual (IVFADC) variant
        "sim_ann_ivfpq_indexed", "sim_ann_ivf_retrain",
        "sim_ann_ivfpq_residual", "sim_ann_ivfsq_indexed",
        // round-13: query-only twins + the external-query form + the
        // fuzzy index family + range search
        "sim_ann_ivfpq_query", "bm25_query", "sim_ann_ivfpq_external",
        "fuzzy_search_indexed", "fuzzy_index_compact",
        "sim_ann_range_search", "sim_ann_index_stats")) {
      out.println(s"==== $name ====")
      out.println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    out.close(); spark.stop()
  }
}
