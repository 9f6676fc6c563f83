package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.KeyedPrefix

/** [[graft.ops.KeyedPrefix]] — the distributed per-key rank / prefix-sum
  * discipline that replaced the Sampling family's source-partitioned
  * windows (r18 verdict finding 1: a corpus-sized frame windowed on a
  * handful of sources funnels each source through ONE reducer). */
class KeyedPrefixSpec extends SparkSpec {

  // Skewed fixture: source s0 carries 70% of rows, far more than one
  // range partition's share at 4 shuffle partitions — the shape the
  // single-reducer window mishandles. Values and a unique tiebreak.
  private def fixture = {
    import spark.implicits._
    (1 to 400).map { i =>
      val src = if (i % 10 < 7) "s0" else if (i % 10 < 9) "s1" else "s2"
      (i.toLong, src, (i * 37 % 101).toLong)
    }.toDF("id", "source", "v")
      // many skewed input partitions — the ids must still come out global
      .repartition(7, col("v"))
  }

  test("rank == row_number over (key ORDER BY ord) on a skewed frame") {
    val got = KeyedPrefix.rank(fixture, "source", Seq("v", "id"), "rk")
      .select(col("id"), col("rk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = fixture.withColumn("rk",
        row_number().over(
          Window.partitionBy(col("source")).orderBy(col("v"), col("id"))))
      .select(col("id"), col("rk")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got === want)
  }

  test("prefixSum == running sum over (key ORDER BY ord), inclusive") {
    val got = KeyedPrefix.prefixSum(fixture, "source", Seq("id"), "v", "cum")
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(col("source")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = fixture.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("empty frame and single-key frame degenerate cleanly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "source", "v")
    assert(KeyedPrefix.rank(empty, "source", Seq("id"), "rk").count() === 0)
    val one = Seq((1L, "s0", 5L), (2L, "s0", 3L)).toDF("id", "source", "v")
    val rk = KeyedPrefix.rank(one, "source", Seq("v", "id"), "rk")
      .select(col("id"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rk === Map(2L -> 1L, 1L -> 2L))
    val cum = KeyedPrefix.prefixSum(one, "source", Seq("id"), "v", "cum")
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cum === Map(1L -> 5L, 2L -> 8L))
  }

  test("PROPERTY: rank and prefixSum equal a plain-Scala reference on " +
      "random skewed frames") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // random key distributions (incl. one-key-dominates skew), random
    // values, duplicate ORDER values allowed — (v, id) stays total via id
    val gen = for {
      n    <- Gen.chooseNum(1, 120)
      keys <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        1 -> Gen.const("k3"), 1 -> Gen.const("k4")))
      vs   <- Gen.listOfN(n, Gen.chooseNum(0L, 9L)) // heavy duplicates
      np   <- Gen.chooseNum(1, 9)
    } yield (keys, vs, np)
    val prop = Prop.forAll(gen) { case (keys, vs, np) =>
      val rows = keys.zip(vs).zipWithIndex.map { case ((k, v), i) =>
        (i.toLong, k, v)
      }
      val df = rows.toDF("id", "source", "v").repartition(np, col("v"))
      val gotRk = KeyedPrefix.rank(df, "source", Seq("v", "id"), "rk")
        .select(col("id"), col("rk")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantRk = rows.groupBy(_._2).flatMap { case (_, g) =>
        g.sortBy(t => (t._3, t._1)).zipWithIndex
          .map { case (t, i) => t._1 -> (i + 1).toLong }
      }
      val gotCum = KeyedPrefix
        .prefixSum(df, "source", Seq("v", "id"), "v", "cum")
        .select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantCum = rows.groupBy(_._2).flatMap { case (_, g) =>
        val sorted = g.sortBy(t => (t._3, t._1))
        sorted.zip(sorted.scanLeft(0L)(_ + _._3).tail)
          .map { case (t, c) => t._1 -> c }
      }
      gotRk == wantRk && gotCum == wantCum
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(40)
      .withInitialSeed(org.scalacheck.rng.Seed(19L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("offset side and probe side share ONE range exchange (one scan)") {
    // the correctness of pid/mid-based offsets depends on the two (three
    // for prefixSum) consumers of the range exchange reading IDENTICAL
    // partition contents — ReusedExchange is what guarantees it (the
    // equiDepth contract). If reuse ever stopped firing, each consumer
    // would re-sample its own range boundaries and ranks would silently
    // corrupt — so the source must be scanned exactly once.
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"))
    for (df <- Seq(
        KeyedPrefix.rank(docs, "source", Seq("doc_id"), "rk"),
        KeyedPrefix.prefixSum(docs, "source", Seq("doc_id"), "doc_id",
          "cum"))) {
      df.collect()
      val plan = df.queryExecution.executedPlan
      val n = scans(plan).count(_.toString.contains("documents")) +
        plan.subqueries.flatMap(scans).count(_.toString.contains("documents"))
      assert(n === 1,
        s"expected ONE documents scan shared via ReusedExchange, got $n:\n$plan")
    }
  }

  test("preconditions fail fast: empty ord, reserved work columns") {
    import spark.implicits._
    val df = Seq((1L, "s0", 2L)).toDF("id", "source", "v")
    intercept[IllegalArgumentException] {
      KeyedPrefix.rank(df, "source", Seq.empty, "rk")
    }
    intercept[IllegalArgumentException] {
      KeyedPrefix.prefixSum(df.withColumnRenamed("v", "_pid"), "source",
        Seq("id"), "id", "cum")
    }
  }

  test("sampling consumers carry no key-only WindowExec over the corpus") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec        => windows(q.plan)
      case m: InMemoryTableScanExec => windows(m.relation.cachedPlan)
      case w: WindowExec            => w +: w.children.flatMap(windows)
      case other                    => other.children.flatMap(windows)
    }
    val sfDir = "/root/testdata/sf0.001"
    for (name <- Seq("sample_recipe", "sample_token_budget",
        "sample_mix_temperature")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val bad = windows(df.queryExecution.executedPlan)
        .filter(_.partitionSpec.size < 2)
      assert(bad.isEmpty,
        s"$name: WindowExec partitioned by a bare key (single-reducer-" +
          s"per-key at scale): ${bad.map(_.partitionSpec).mkString("; ")}")
      CacheScope.unpersistAll()
    }
  }
}
