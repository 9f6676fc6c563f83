package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Unit coverage for the BFS-paths core on a NON-chain graph: the oracle
  * exercises it on chains only (graph_khop_paths), where same-round
  * collisions and cycles cannot occur. A diamond with a back-edge has both.
  *
  *   1 → 2 → 4 → 1 (cycle)
  *   1 → 3 → 4     (second equal-length route into 4)
  */
class GraphPathsSpec extends SparkSpec {

  private def diamond = {
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
  }

  private def pathOf(rows: Array[org.apache.spark.sql.Row], id: Long): Seq[(Long, Long)] =
    rows.find(_.getLong(0) == id).get.getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getLong(0), r.getLong(1)))

  test("diamond: same-round collision resolves to the lexicographically smallest path") {
    val rows = GraphOps.bfsPaths(diamond, 1L, maxHops = 5).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.map(r => r.getLong(0) -> r.getInt(1)).toMap ===
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // 4 is reached from 2 and 3 in the same round; "1-2|2-4" < "1-3|3-4".
    assert(pathOf(rows, 4L) === Seq((1L, 2L), (2L, 4L)))
    // The 4→1 back-edge must not resurrect the visited anchor (termination).
    assert(pathOf(rows, 1L) === Seq.empty)
  }

  test("hop bound cuts the frontier exactly at maxHops") {
    val rows = GraphOps.bfsPaths(diamond, 1L, maxHops = 1).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
  }

  // runs BEFORE the reliable-mode test below: the guard is only reachable
  // while no checkpoint dir has been set on the shared context
  test("reliable mode without a checkpoint dir fails fast with guidance") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set("spark.graft.pathCheckpoint", "reliable")
    try {
      val ex = intercept[IllegalArgumentException] {
        GraphOps.bfsPaths(diamond, 1L, maxHops = 2).collect()
      }
      assert(ex.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset("spark.graft.pathCheckpoint")
  }

  test("reliable-checkpoint mode returns identical paths to local mode") {
    val local = GraphOps.bfsPaths(diamond, 1L, maxHops = 5).collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    spark.conf.set("spark.graft.pathCheckpoint", "reliable")
    val reliable =
      try GraphOps.bfsPaths(diamond, 1L, maxHops = 5).collect()
      finally spark.conf.unset("spark.graft.pathCheckpoint")
    assert(reliable.map(_.toSeq).toSeq === local.map(_.toSeq).toSeq,
      "reliable checkpointing changed the BFS result")
    // checkpoint files actually landed in the reliable dir
    assert(dir.listFiles() != null && dir.listFiles().nonEmpty,
      "reliable mode wrote no checkpoint data")
  }

  test("chain wrapper is unchanged by the core extraction") {
    import spark.implicits._
    val customers = (0L to 24L).toDF("c_custkey")
    val got = GraphOps.kHopChainPaths(spark, customers, 7L)
      .select(col("id"), col("dist")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // block 0-9 around anchor 7: dist = |id - 7| inside the block, nothing
    // beyond the block boundary.
    assert(got === (0L to 9L).map(i => i -> math.abs(i - 7).toInt).toMap)
  }

  test("weighted SSSP: bounded Bellman-Ford picks the cheapest mixed routes") {
    import spark.implicits._
    val customers = (1L to 25L).toDF("c_custkey")
    val got = GraphOps.shortestPathsBounded(
        GraphOps.weightedChainEdges(customers), 1L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // block 1..9: locals w=2, skips (+3) w=5 — hand-checked shortest:
    // the skip beats three locals (5 < 6), long stretches chain skips,
    // and node 9's best route needs all 4 allowed hops (1->4->7->8->9)
    assert(got === Map(
      1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 5L, 5L -> 7L,
      6L -> 9L, 7L -> 10L, 8L -> 12L, 9L -> 14L))
    // one fewer round drops the 4-edge node entirely (its minimum EDGE
    // count is 4: 1->4->7->8->9) but everything else stays exact — the
    // bounded-k contract (exact for paths of <= k edges)
    val k3 = GraphOps.shortestPathsBounded(
        GraphOps.weightedChainEdges(customers), 1L, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k3(8L) === 12L)
    assert(!k3.contains(9L), s"node 9 needs 4 edges, k=3 must not reach it: $k3")
  }

  test("converged SSSP: reaches the unbounded fixpoint, halts at tree depth + 1") {
    import spark.implicits._
    val customers = (1L to 25L).toDF("c_custkey")
    val edges = GraphOps.weightedChainEdges(customers)
    val (df, rounds) = GraphOps.shortestPathsConvergedWithRounds(edges, 1L, 64)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the fixpoint includes node 9 (4 edges — beyond what a k=3 bound
    // reaches) and matches the hand-checked distances exactly
    assert(got === Map(
      1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 5L, 5L -> 7L,
      6L -> 9L, 7L -> 10L, 8L -> 12L, 9L -> 14L))
    // the deepest shortest-path tree edge count is 4 (1->4->7->8->9); the
    // halt costs exactly ONE extra (empty) round — the priced isEmpty check
    assert(rounds === 5, s"expected 4 improving rounds + 1 empty, got $rounds")
  }

  test("personalized PageRank: exact scaled-integer parity with a local reference") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("name", StringType, false),
      StructField("address", StringType, true),
      StructField("college", StringType, true),
      StructField("board", StringType, true),
      StructField("stream", StringType, true),
      StructField("interests", ArrayType(StringType), true)))
    val students = spark.createDataFrame(Seq(
      Row(1L, "aayush", "lalitpur", "st. xavier college", "nepal board", "science", Seq("math")),
      Row(2L, "dikshanta", "kathmandu", "st. xavier college", "nepal board", "science", Seq("music")),
      Row(3L, "rohan", "lalitpur", "trinity college", "nepal board", "management", Seq("music")),
      Row(4L, "umesh", "pokhara", "trinity college", null, "science", Seq.empty[String]),
      Row(5L, "sita", null, null, null, null, Seq("math"))
    ).asJava, schema)
    val got = GraphOps.personalizedPageRank(students, 1L, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // plain-Scala mirror of the exact integer recurrence over the same
    // collapsed undirected edge set — long division == `div` on non-negatives
    val pairs = graft.ops.EdgeRules.backfill(students)
      .select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val und = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val scale = GraphOps.PprScale
    var r = Map(1L -> scale)
    for (_ <- 1 to 3)
      r = (und.flatMap { case (u, v) =>
          r.get(u).map(ru => v -> ru / deg(u) * 85 / 100)
        } :+ (1L -> scale * 15 / 100))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        .filter(_._2 > 0)
    assert(got === r, s"engine PPR diverged from the exact-integer reference")
    // the anchor keeps the maximum rank (teleport mass dominates at α=0.15)
    assert(got.maxBy(_._2)._1 === 1L)
  }
}
