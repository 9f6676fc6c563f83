package graft

import org.apache.spark.sql.functions._
import graft.ops.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("diff classifies the three derivation residues and nothing else") {
    val d = Snapshot.diff(Snapshot.oldSnapshot(docs), Snapshot.newSnapshot(docs))
      .select("doc_id", "change").as[(Long, String)].collect()
    d.foreach { case (id, change) =>
      change match {
        case "added"   => assert(id % 11 == 0 && id % 17 != 0)
        case "removed" => assert(id % 17 == 0 && id % 11 != 0)
        case "changed" => assert(id % 13 == 0 && id % 11 != 0 && id % 17 != 0)
        case other     => fail(s"unexpected change type $other")
      }
    }
    assert(d.map(_._2).toSet === Set("added", "removed", "changed"))
  }

  test("applyChangelog(old, diff(old, new)) == new, row for row") {
    val old = Snapshot.oldSnapshot(docs)
    val neu = Snapshot.newSnapshot(docs)
    val rolled = Snapshot.applyChangelog(old, Snapshot.diff(old, neu))
    assert(rolled.count() === neu.count())
    assert(rolled.except(neu).isEmpty && neu.except(rolled).isEmpty)
  }

  test("diff of identical snapshots is empty") {
    val snap = Snapshot.newSnapshot(docs)
    assert(Snapshot.diff(snap, snap).isEmpty)
  }

  test("diff joins sort-merge on doc_id — no nested-loop fallback") {
    val plan = Snapshot.diff(Snapshot.oldSnapshot(docs), Snapshot.newSnapshot(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
