package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Sampling, TextAnalysis, Windows}

/** Round-5 pipeline operators: text cleaning, hash-keyed dataset split,
  * and time-series gap-fill. The DuckDB oracle proves engine parity; these
  * specs pin the operator-level invariants the oracle can't express
  * (determinism across repartitioning, full roundtrip, fill density). */
class PipelineOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  test("textClean strips every tag and URL and recovers the original text") {
    val out = TextAnalysis.textClean(docs).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("roundtrip_ok") == 1))
    // n_clean strictly smaller than n_raw: the markup really was there
    assert(out.forall(r => r.getAs[Int]("n_clean") < r.getAs[Int]("n_raw")))
  }

  test("clean handles multiple tags/URLs per row and preserves inner text") {
    import spark.implicits._
    val rows = Seq(
      "<p>a</p> http://x.io/1 b <br/> https://y.io/2?q=1 c",
      "plain text stays",
      "  <a href=\"z\">link</a>  ").toDF("s")
      .select(TextAnalysis.clean(col("s")).as("c")).as[String].collect()
    assert(rows === Seq("a b c", "plain text stays", "link"))
  }

  test("hashSplit is a pure function of the id: stable across repartitioning") {
    val once = Sampling.hashSplit(docs).collect().toSeq
    val again = Sampling.hashSplit(docs.repartition(13)).collect().toSeq
    assert(once === again)
    // every bucket in [0,256), split thresholds honored
    assert(once.forall { r =>
      val b = r.getAs[Long]("bucket")
      val s = r.getAs[String]("split")
      b >= 0 && b < 256 &&
        s == (if (b < Sampling.TrainUpper) "train"
              else if (b < Sampling.ValUpper) "val" else "test")
    })
  }

  test("gapfillDaily yields a dense users × days grid with zero-filled gaps") {
    val events = Tables.events(spark, sfDir)
    val filled = Windows.gapfillDaily(events)
    val nUsers = events.select("user_id").distinct().count()
    val nDays = events.select(to_date(col("ts")).as("d")).agg(
      datediff(max(col("d")), min(col("d")))).head().getInt(0) + 1
    assert(filled.count() === nUsers * nDays)
    // non-zero rows agree with a direct per-(user, day) count
    val direct = events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .count().count()
    assert(filled.filter(col("n_events") > 0).count() === direct)
    assert(filled.filter(col("n_events") === 0).count() ===
      nUsers * nDays - direct)
  }
}
