package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Sketches

/** KMV cardinality sketch: estimator accuracy on real data, the exact
  * fallback for small groups, and layout determinism (the properties the
  * hash-match oracle can't phrase). */
class SketchesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("KMV estimate lands within the k=64 error envelope on lineitem") {
    val out = Sketches.kmvDistinct(Tables.lineitem(spark, sfDir),
      "l_returnflag", "l_orderkey").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      // std err ≈ 1/sqrt(k−2) ≈ 12.7%; 4σ envelope — deterministic given
      // the fixed hash, loose enough to never flap
      assert(math.abs(est - exact) / exact < 0.51,
        s"${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("HLL estimate lands within the m=256 error envelope on lineitem") {
    val out = Sketches.hllDistinct(Tables.lineitem(spark, sfDir),
      "l_returnflag", "l_orderkey").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      // std err ≈ 1.04/sqrt(256) = 6.5%; 4σ envelope, deterministic hash
      assert(math.abs(est - exact) / exact < 0.26,
        s"${r.get(0)}: est $est vs exact $exact")
      assert(r.getAs[Long]("n_regs") <= 256L)
    }
  }

  test("HLL small-range correction: tiny sets fall to linear counting") {
    import spark.implicits._
    // 3 distinct values -> ~253 empty registers -> est = 256·ln(256/zeros)
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 1L))
      .toDF("g", "v")
    val r = Sketches.hllDistinct(df, "g", "v").collect().head
    val nRegs = r.getAs[Long]("n_regs")
    val expected = 256.0 * math.log(256.0 / (256 - nRegs))
    assert(math.abs(r.getAs[Double]("est_distinct") - expected) < 0.001)
    assert(r.getAs[Long]("exact_distinct") == 3L)
  }

  test("HLL registers max-merge: sharded partials == one-shot sketch") {
    val li = Tables.lineitem(spark, sfDir)
    val full = Sketches.hllRegisters(li, "l_returnflag", "l_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val a = Sketches.hllRegisters(
      li.filter(col("l_orderkey") % 2 === 1), "l_returnflag", "l_orderkey")
    val b = Sketches.hllRegisters(
      li.filter(col("l_orderkey") % 2 === 0), "l_returnflag", "l_orderkey")
    val merged = a.unionByName(b).groupBy(col("g"), col("b"))
      .agg(max(col("mb")).as("mb"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(merged === full)
  }

  test("groups with fewer than k distinct values report exactly") {
    import spark.implicits._
    val tiny = Seq.tabulate(40)(i => ("g1", i % 7))        // 7 distinct < k
      .appendedAll(Seq.tabulate(300)(i => ("g2", i)))      // 300 distinct > k
      .toDF("g", "v")
    val out = Sketches.kmvDistinct(tiny, "g", "v").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[Double]("est_distinct") == 7.0)
    assert(out("g1").getAs[Long]("k_actual") == 7L)
    assert(out("g2").getAs[Long]("k_actual") == Sketches.DefaultK.toLong)
    // determinism across partition layouts (heap merge order can't matter)
    val again = Sketches.kmvDistinct(tiny.repartition(13), "g", "v").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("est_distinct")).toMap
    out.foreach { case (g, r) =>
      assert(again(g) == r.getAs[Double]("est_distinct"))
    }
  }

  test("CMS: occurrence-built sketch == count-built sketch, bounded size") {
    val docs = Tables.documents(spark, sfDir)
    val sk = Sketches.cmsSketch(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sk.size <= Sketches.CmsDepth * Sketches.CmsWidth)
    // layout cannot change the sketch (merge = sum, order-free)
    val again = Sketches.cmsSketch(docs.repartition(13)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again === sk)
    // every depth row sums to the total occurrence count
    val total = docs.select(explode(graft.ops.Dedup.words(col("text"))).as("t"))
      .filter(col("t") =!= "").count()
    (0 until Sketches.CmsDepth).foreach { d =>
      assert(sk.collect { case ((`d`, _), c) => c }.sum === total)
    }
  }

  test("CMS estimate over-counts, never under-counts, for EVERY term") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sketches.cmsHeavyHitters(docs, topK = Int.MaxValue).collect()
    val vocab = docs.select(explode(graft.ops.Dedup.words(col("text"))).as("t"))
      .filter(col("t") =!= "").distinct().count()
    assert(out.length === vocab) // every term audited, not just top-k
    out.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"${r.get(0)}: CMS under-counted")
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"))
    }
    CacheScope.unpersistAll()
  }

  test("Misra-Gries: candidate superset bounded, result exact on a " +
      "skewed fixture") {
    import spark.implicits._
    // one dominant term in a 200-term vocabulary, spread over 4 partitions
    val rng = new scala.util.Random(3)
    val tokens = Seq.fill(2000)("hot") ++
      Seq.fill(6000)(s"cold${rng.nextInt(200)}")
    val terms = rng.shuffle(tokens).toDF("term").repartition(4)

    val k = 8
    val summ = Sketches.mgSummaries(terms, k)
    val cands = summ.filter(col("term").isNotNull)
      .select("term").distinct().collect().map(_.getString(0)).toSet
    assert(cands.size <= 4 * k,
      s"candidate superset ${cands.size} exceeds partitions*k")
    assert(cands.size < 100, "MG pruned nothing on a skewed stream")
    assert(cands.contains("hot"), "the true heavy hitter fell out of MG")
    // token-count marker rows sum to n
    assert(summ.agg(sum(col("np"))).collect()(0).getLong(0) === 8000L)

    // end-to-end: exact result = brute-force threshold filter
    val docs = tokens.grouped(40).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Sketches.mgHeavyHitters(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = tokens.size
    val want = tokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 > n / (k + 1))
      .sortBy { case (t, c) => (-c, t) }
    assert(got === want)
  }

  test("f2SelfJoin: exact F2 matches brute force; CMS estimate only overestimates") {
    import spark.implicits._
    // skewed stream: user u repeated u times, u = 1..40 -> F2 = Σ u²
    val events = (1L to 40L).flatMap(u => Seq.fill(u.toInt)(u))
      .toDF("user_id")
    val r = Sketches.f2SelfJoin(events).collect()(0)
    val want = (1L to 40L).map(u => u * u).sum
    assert(r.getAs[Long]("exact_f2") === want)
    assert(r.getAs[Long]("est_f2") >= want, "CMS inner product must upper-bound F2")
    assert(r.getAs[Long]("overcount") === r.getAs[Long]("est_f2") - want)
  }

  test("joinCardinality: exact join size matches brute force; estimate upper-bounds") {
    import spark.implicits._
    // user u: u views and (u % 3) purchases, u = 1..30
    val events = (1L to 30L).flatMap { u =>
      Seq.fill(u.toInt)((u, "view")) ++ Seq.fill((u % 3).toInt)((u, "purchase"))
    }.toDF("user_id", "event_type")
    val r = Sketches.joinCardinality(events).collect()(0)
    val want = (1L to 30L).map(u => u * (u % 3)).sum
    assert(r.getAs[Long]("exact_join") === want)
    assert(r.getAs[Long]("est_join") >= want,
      "CMS inner product must upper-bound the join size")
    // disjoint keys on the two sides -> exact 0 (estimate may exceed 0
    // only through collisions, and still upper-bounds)
    val disj = ((1L to 10L).map(u => (u, "view")) ++
      (11L to 20L).map(u => (u, "purchase"))).toDF("user_id", "event_type")
    val r2 = Sketches.joinCardinality(disj).collect()(0)
    assert(r2.getAs[Long]("exact_join") === 0L)
    assert(r2.getAs[Long]("est_join") >= 0L)
  }

  test("kmvIntersect: identical sets estimate ∩ == ∪; disjoint sets estimate 0") {
    import spark.implicits._
    // each doc contributes distinct 3-shingles; vocabulary per doc is
    // unique words so shingle sets are controlled exactly
    def doc(id: Long, src: String, words: Seq[String]) =
      (id, src, words.mkString(" "))
    // identical corpora in both sources -> every union hash is in both
    val same = (Seq(doc(1L, "src1", (1 to 50).map(i => s"w$i")),
        doc(2L, "src2", (1 to 50).map(i => s"w$i"))))
      .toDF("doc_id", "source", "text")
    val r1 = Sketches.kmvIntersect(same, k = 16).collect()(0)
    assert(r1.getAs[Long]("n_both") === r1.getAs[Long]("k_actual"))
    assert(r1.getAs[Double]("est_intersect") === r1.getAs[Double]("est_union"))
    // disjoint corpora -> n_both = 0 -> est_intersect = 0
    val disj = (Seq(doc(1L, "src1", (1 to 50).map(i => s"a$i")),
        doc(2L, "src2", (1 to 50).map(i => s"b$i"))))
      .toDF("doc_id", "source", "text")
    val r2 = Sketches.kmvIntersect(disj, k = 16).collect()(0)
    assert(r2.getAs[Long]("n_both") === 0L)
    assert(r2.getAs[Double]("est_intersect") === 0.0)
    assert(r2.getAs[Long]("exact_intersect") === 0L)
  }
}
