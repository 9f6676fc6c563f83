package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Dedup, DedupIndex}

/** The materialized LSH band index: candidate checks against the bucketed
  * table must (a) equal the recompute-everything path and (b) never
  * re-shuffle the index side — the property that makes delta ingest cost
  * independent of corpus size. */
class DedupIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed index: same candidates, zero exchange over the index scan") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val index = docs.filter(col("doc_id") % 5 =!= 0)

    val wh = Files.createTempDirectory("graft-lsh-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_lsh LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS graft_lsh.bands")
    DedupIndex.build(index, "graft_lsh.bands")

    // force the shuffle path: a broadcast of the tiny delta would hide
    // whether the bucket layout is what spares the index side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = DedupIndex.candidates(spark, "graft_lsh.bands", delta)
      val rows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // (a) result parity with the recompute path's candidate join
      val ib = Dedup.lshBands(index)
        .select(col("doc_id").as("index_id"), col("b"), col("k"))
      val db = Dedup.lshBands(delta)
        .select(col("doc_id").as("delta_id"), col("b"), col("k"))
      val expected = db.join(ib, Seq("b", "k"))
        .select("delta_id", "index_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === expected)
      assert(rows.nonEmpty)

      // (b) the index scan reads buckets and sits under NO exchange: the
      // only hash exchanges are the delta side of the join and the
      // distinct — never a third for the index side (node traversal, not
      // toString: AQE's toString repeats the initial plan)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      def hashExchanges(p: SparkPlan): Int = {
        val self = p match {
          case s: ShuffleExchangeExec if s.outputPartitioning.isInstanceOf[HashPartitioning] => 1
          case _ => 0
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        self + kids.map(hashExchanges).sum
      }
      val exec = got.queryExecution.executedPlan
      assert(exec.toString.contains("Bucketed: true"), s"index scan not bucketed:\n$exec")
      val n = hashExchanges(exec)
      assert(n <= 2, s"index side re-shuffled ($n hash exchanges):\n$exec")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("indexDelete: erased docs stop matching; compact folds physically " +
      "and keeps the bucketed layout") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val index = docs.filter(col("doc_id") % 5 =!= 0)

    val wh = Files.createTempDirectory("graft-lshdel-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_lshdel LOCATION '$wh'")
    val t = "graft_lshdel.bands"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupIndex.build(index, t)

    // maximal teeth: victims drawn FROM the pre-delete partner set
    // (every other partner), so the delete provably changes the result
    val before = DedupIndex.candidates(spark, t, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val victimSet = before.map(_._2).toSeq.sorted.zipWithIndex
      .collect { case (id, i) if i % 2 == 0 => id }.toSet
    assert(victimSet.nonEmpty,
      "fixture rot: no pre-delete partners to delete")

    import spark.implicits._
    DedupIndex.indexDelete(spark, t,
      victimSet.toSeq.toDF("doc_id"))
    val got = DedupIndex.candidates(spark, t, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === before.filterNot(p => victimSet(p._2)),
      "post-delete candidates differ from the erased-partner filter")
    // probe plan: broadcast anti-join, bucketed scan intact
    val plan = DedupIndex.candidates(spark, t, delta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"tombstone filter is not an anti-join:\n$plan")

    // re-delete is a no-op on the sidecar
    val sidecarRows = spark.table(s"${t}_tombstones").count()
    DedupIndex.indexDelete(spark, t, victimSet.toSeq.toDF("doc_id"))
    assert(spark.table(s"${t}_tombstones").count() === sidecarRows,
      "re-delete appended duplicate tombstones")

    // compact: victims physically gone, sidecar dropped, candidates
    // unchanged, and the rewritten table still answers with a bucketed
    // scan (the co-located probe contract survives the fold)
    DedupIndex.compact(spark, t)
    assert(!spark.catalog.tableExists(s"${t}_tombstones"),
      "compaction left the tombstone sidecar standing")
    assert(spark.table(t)
        .filter(col("doc_id").isin(victimSet.toSeq: _*)).count() === 0,
      "compaction left tombstoned band rows physically present")
    val after = DedupIndex.candidates(spark, t, delta)
    assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === got, "compaction moved the candidate set")
    assert(after.queryExecution.executedPlan.toString
        .contains("Bucketed: true"),
      "compaction lost the bucketed layout")
  }

  test("delta append: merged index == build-at-once; re-ingest refused; " +
      "post-compact re-ingest of a deleted id is a plain insert") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val index = docs.filter(col("doc_id") % 5 =!= 0)

    val wh = Files.createTempDirectory("graft-lshd-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_lshd LOCATION '$wh'")
    val t = "graft_lshd.bands"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupIndex.build(index.filter(col("doc_id") % 2 === 1), t)
    DedupIndex.delta(spark, t, index.filter(col("doc_id") % 2 === 0))

    val tw = "graft_lshd.whole"
    spark.sql(s"DROP TABLE IF EXISTS $tw")
    DedupIndex.build(index, tw)
    assert(DedupIndex.candidates(spark, t, delta).collect().toSeq
        === DedupIndex.candidates(spark, tw, delta).collect().toSeq,
      "delta-grown index diverged from the build-at-once candidates")

    // re-ingest is refused loudly (silent physical duplication is how an
    // index doubles between compactions)
    intercept[IllegalArgumentException] {
      DedupIndex.delta(spark, t, index.limit(1))
    }

    // the idempotent twin SKIPS a replayed batch instead: physical band
    // row count must not move (candidates() would mask duplication via
    // its distinct — the row count is the real claim)
    val bandRows = spark.table(t).count()
    DedupIndex.deltaIdempotent(spark, t,
      index.filter(col("doc_id") % 2 === 0))
    assert(spark.table(t).count() === bandRows,
      "deltaIdempotent re-appended a fully-replayed batch")
    // and a mixed novel+replay batch ingests exactly the novel rows —
    // feed one standing doc + one brand-new synthetic doc
    val novelDoc = index.limit(1)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val novelBands = graft.ops.Dedup.lshBands(novelDoc).count()
    DedupIndex.deltaIdempotent(spark, t, index.limit(1).unionByName(novelDoc))
    assert(spark.table(t).count() === bandRows + novelBands,
      "mixed novel+replay batch did not ingest exactly the novel rows")

    // delete + compact: the deleted id becomes re-ingestable (guard
    // rebuilt from survivors)
    val victim = index.select(col("doc_id")).limit(1)
    DedupIndex.indexDelete(spark, t, victim)
    DedupIndex.compact(spark, t)
    DedupIndex.delta(spark, t, index.join(victim, Seq("doc_id"), "left_semi"))
  }
}
