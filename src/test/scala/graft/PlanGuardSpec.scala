package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Locks in the pair-join scale shapes the round-4 audit proved: a
  * pair-producing query must never fall back to an all-pairs physical join
  * (CartesianProduct / BroadcastNestedLoopJoin) — a regression here is
  * invisible at test SF and fatal at 100 TB. j3_recommend's BNLJ is
  * intentional (a 1-row broadcast anchor) and deliberately NOT guarded. */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val guarded =
    Seq("edges_backfill", "dedup_lsh_pairs", "dedup_simhash_pairs",
      "j2_rare_token_pairs",
      // round-5 hygiene joins: the shingle-overlap join and the custom
      // TopKPerKey quota path must stay equi-join / bounded-heap shaped
      "decontam_overlap", "sample_stratified",
      // delta-vs-index band join + sliver verify: both phases equi-joins
      "dedup_incremental",
      // round-5 continuation: fingerprint/weights/threshold joins must
      // stay hash-equi (the broadcast crosses in bm25/kmeans/j3 are
      // intentional 1-row or k-row literals and stay unguarded)
      "dedup_canonical", "text_quality_gate", "snapshot_apply",
      // round-8 continuation: the gram-keyed substring-dedup joins and
      // the CMS probe join must stay hash-equi (bpe_* stays unguarded —
      // its per-step winner is an intentional 1-row broadcast cross,
      // same family as j3's anchor)
      "dedup_substring", "dedup_doc_spans", "sketch_cms_topterms",
      // the capstone v2 chain, the containment verify, and the outlier
      // two-pass must all stay hash-equi end to end
      "corpus_curate", "dedup_containment", "a13_outliers",
      // round-11: the restored events family — the as-of join must stay a
      // union/window merge (never a θ-join), retention hash-equi.
      // w8_funnel is NOT here: its conversion-fraction denominator is an
      // intentional 1-row broadcast cross (the j3 anchor family); its
      // window shape is guarded below instead
      "j8_asof_join", "w9_retention",
      // round-18c: the positional-gram decontam join, the capped wedge
      // joins, the release chain, the OOV broadcast probe, and the
      // banded phash pair join must all stay hash-equi / bounded-heap
      // shaped (sample_dsir and text_pmi_pairs stay UNGUARDED — their
      // 1-row totals frames are intentional broadcast crosses, the
      // j3-anchor family)
      "decontam_spans", "graph_adamic_adar",
      "graph_clustering_coeff", "corpus_release", "text_oov_rate",
      "text_lexical_diversity", "mm_phash_pairs", "graph_kcore",
      "sketch_hll_distinct")
      // dedup_semantic stays unguarded here — its centroid assignment is
      // an intentional k-row broadcast cross (the kmeans/bpe family);
      // SemanticDedupSpec asserts the pair join's shape directly

  /** All-pairs join nodes anywhere in the executed plan, descending into
    * materialized AQE query stages (LeafExecNodes in Spark 4.1), cached
    * relations, and subqueries — the same traversal lesson as the q15 scan
    * assertion in ScalePathSpec. */
  private def allPairsJoins(p: SparkPlan): Seq[String] = {
    val bad = p match {
      case _: CartesianProductExec         => Seq(p.nodeName)
      case _: BroadcastNestedLoopJoinExec  => Seq(p.nodeName)
      case _                               => Nil
    }
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec  => Seq(a.executedPlan)
      case q: QueryStageExec         => Seq(q.plan)
      case m: InMemoryTableScanExec  => Seq(m.relation.cachedPlan)
      case other                     => other.children
    }
    bad ++ kids.flatMap(allPairsJoins) ++
      p.subqueries.flatMap(allPairsJoins)
  }

  guarded.foreach { name =>
    test(s"$name plans no CartesianProduct / BroadcastNestedLoopJoin") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize the adaptive plan before auditing it
      val offending = allPairsJoins(df.queryExecution.executedPlan)
      assert(offending.isEmpty,
        s"$name fell back to an all-pairs join: ${offending.mkString(", ")}\n" +
          df.queryExecution.executedPlan)
    }
  }

  /** The four ANN variants must cut per-query candidates with the bounded
    * heaps (TopKPerKeyFinalExec), and any rank window must sit ABOVE that
    * cut — a WindowExec whose subtree has no heap cut is the
    * one-task-per-query funnel that dies at corpus scale. */
  private val annGuarded =
    Seq("sim_ann_lsh", "sim_ann_multiprobe", "sim_ann_ivf",
      "sim_ann_ivf_trained", "sim_hard_negatives")

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec  => Seq(a.executedPlan)
      case q: QueryStageExec         => Seq(q.plan)
      case m: InMemoryTableScanExec  => Seq(m.relation.cachedPlan)
      case other                     => other.children
    }
    p +: (kids.flatMap(collectNodes) ++ p.subqueries.flatMap(collectNodes))
  }

  /** The events analytics family computes with windows — every WindowExec
    * must be PARTITIONED (by user/key), never a global single-partition
    * window over the whole event table: an empty partitionSpec funnels
    * 100 TB of events through one task. */
  private val windowGuarded =
    Seq("w1_event_windows", "w2_sessionize", "w5_sliding_counts",
      "w8_funnel", "w9_retention", "j8_asof_join")

  windowGuarded.foreach { name =>
    test(s"$name plans no unpartitioned window over the event table") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val global = collectNodes(df.queryExecution.executedPlan)
        .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        .filter(_.partitionSpec.isEmpty)
      assert(global.isEmpty,
        s"$name plans a GLOBAL window (empty partitionSpec — one task at " +
          s"scale):\n${global.mkString("\n")}")
    }
  }

  annGuarded.foreach { name =>
    test(s"$name cuts per-query candidates with TopKPerKey, not a raw window") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val nodes = collectNodes(df.queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[graft.plans.TopKPerKeyFinalExec]),
        s"$name has no TopKPerKeyFinalExec — the per-query cut fell back " +
          s"to something else\n${df.queryExecution.executedPlan}")
      val uncutWindows = nodes
        .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
        .filterNot(w => collectNodes(w.child)
          .exists(_.isInstanceOf[graft.plans.TopKPerKeyFinalExec]))
      assert(uncutWindows.isEmpty,
        s"$name plans a WindowExec over an UNCUT candidate set (per-query " +
          s"funnel):\n${uncutWindows.mkString("\n")}")
    }
  }
}
