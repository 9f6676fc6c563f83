package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.MatView

/** The incrementally-maintained materialized aggregate ([[graft.ops
  * .MatView]]): after ANY build/delta/delete sequence the folded read
  * must be bit-identical to a from-scratch GROUP BY over the surviving
  * base rows (exact additive DECIMAL fold), replays must be refused
  * loudly (an admitted replay silently doubles a group), compaction must
  * fold to one row per key without moving the result, and a
  * fully-deleted group must vanish exactly as a recompute would. */
class MatViewSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("o_custkey")).collect().map(_.toSeq).toSeq

  private def recompute(base: org.apache.spark.sql.DataFrame) =
    base.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("price")).as("sum_price"))

  test("read == recompute after build, delta, delete; replay refused; " +
      "compact folds to one row per key; emptied groups vanish") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mv-wh")
      .toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_mv_test LOCATION '$wh'")
    val t = "graft_mv_test.mvo"
    val o = Tables.orders(spark, sfDir)
      .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
    val keys = Seq("o_custkey"); val sums = Seq("price")
    def read() = MatView.read(spark, t, keys, sums)
      .select(col("o_custkey"), col("cnt"), col("sum_price"))

    val base = o.filter(col("o_orderkey") % 5 =!= 0)
    MatView.build(base, t, keys, sums, "o_orderkey")
    assert(rows(read()) === rows(recompute(base)),
      "post-build read diverged from the GROUP BY recompute")

    val delta = o.filter(col("o_orderkey") % 5 === 0)
    MatView.delta(t, delta, keys, sums, "o_orderkey")
    assert(rows(read()) === rows(recompute(o)),
      "post-delta read diverged (delta partials mis-folded)")

    // replay refused loudly — an admitted replay doubles its groups
    intercept[IllegalArgumentException] {
      MatView.delta(t, delta.limit(1), keys, sums, "o_orderkey")
    }

    // delete one customer's ENTIRE order set + a spread of others: the
    // emptied group must vanish, the others must shrink exactly
    val victimCust = o.select(col("o_custkey")).limit(1)
      .collect()(0).getLong(0)
    val victims = o.filter(col("o_custkey") === victimCust ||
      col("o_orderkey") % 7 === 3)
    MatView.deleteRows(t, victims, keys, sums)
    val surviving = o.filter(col("o_custkey") =!= victimCust &&
      col("o_orderkey") % 7 =!= 3)
    assert(rows(read()) === rows(recompute(surviving)),
      "post-delete read diverged from the survivors' recompute")
    assert(read().filter(col("o_custkey") === victimCust).count() === 0,
      "a fully-deleted group survived the fold")

    // compact: one physical row per key, result unmoved
    val want = rows(read())
    MatView.compact(spark, t, keys, sums)
    assert(rows(read()) === want, "compaction moved the view")
    val perKey = spark.table(s"${t}_mv").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).collect()(0).getLong(0)
    assert(perKey === 1L, s"compaction left $perKey rows for some key")
  }

  test("foldBatch: same-bid redelivery is a no-op (batch-id ledger); " +
      "distinct bids fold; drained == one-shot") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mvs-wh")
      .toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_mvs_test LOCATION '$wh'")
    val t = "graft_mvs_test.mv"
    val o = Tables.orders(spark, sfDir)
      .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
    val keys = Seq("o_custkey"); val sums = Seq("price")
    def read() = MatView.read(spark, t, keys, sums)
      .select(col("o_custkey"), col("cnt"), col("sum_price"))

    val b0 = o.filter(col("o_orderkey") % 2 === 1)
    val b1 = o.filter(col("o_orderkey") % 2 === 0)
    MatView.foldBatch(t, 0L, b0, keys, sums, "o_orderkey")
    MatView.foldBatch(t, 1L, b1, keys, sums, "o_orderkey")
    assert(rows(read()) === rows(recompute(o)),
      "drained folds diverged from the one-shot GROUP BY")

    // the crash-redelivery case: SAME bid again, content identical —
    // must be skipped entirely (no doubled groups, no new generation)
    val gens = spark.table(s"${t}_mv").count()
    MatView.foldBatch(t, 1L, b1, keys, sums, "o_orderkey")
    assert(spark.table(s"${t}_mv").count() === gens,
      "redelivered batch id re-folded (ledger miss)")
    assert(rows(read()) === rows(recompute(o)),
      "redelivery changed the view")

    // CDC: a mixed I/D batch applies as one generation; a redelivered
    // bid is a strict no-op; read == base + inserts − deletes
    val t2 = "graft_mvs_test.cdc"
    MatView.build(b0, t2, keys, sums, "o_orderkey")
    val changes = b1.withColumn("op", lit("I")).unionByName(
      b0.filter(col("o_orderkey") % 7 === 3).withColumn("op", lit("D")))
    MatView.applyCdc(t2, 0L, changes, keys, sums)
    val surviving = o.filter(!(col("o_orderkey") % 2 === 1 &&
      col("o_orderkey") % 7 === 3))
    def read2() = MatView.read(spark, t2, keys, sums)
      .select(col("o_custkey"), col("cnt"), col("sum_price"))
    assert(rows(read2()) === rows(recompute(surviving)),
      "CDC apply diverged from base + inserts − deletes")
    MatView.applyCdc(t2, 0L, changes, keys, sums)
    assert(rows(read2()) === rows(recompute(surviving)),
      "redelivered CDC bid re-applied")
  }
}
