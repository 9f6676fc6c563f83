package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{EdgeRules, Recommend}

/** Golden end-to-end test on the reference-domain fixture (FIXTURES.md §A):
  * reproduces the reference's exact edge-backfill and recommendation
  * semantics, including the null-handling quirks of SURVEY.md §7.4:
  *   - backfill requires IS NOT NULL on the attribute (no NULL-NULL edges),
  *     create_relationships.py:20,36,52,68;
  *   - EP2 scoring coalesces to '' so NULL == NULL counts as a match,
  *     student_service.py:151-154;
  *   - interest intersection keeps the left argument's casing,
  *     student_service.py:155.
  */
class GoldenFixtureSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("name", StringType, false),
    StructField("address", StringType, true),
    StructField("college", StringType, true),
    StructField("board", StringType, true),
    StructField("stream", StringType, true),
    StructField("interests", ArrayType(StringType), true)))

  private def fixture: DataFrame = spark.createDataFrame(
    Seq(
      Row(1L, "aayush", "lalitpur", "st. xavier college", "nepal board", "science", Seq("math", "programming")),
      Row(2L, "dikshanta", "kathmandu", "st. xavier college", "nepal board", "science", Seq("programming", "music")),
      Row(3L, "rohan", "lalitpur", "trinity college", "nepal board", "management", Seq("music", "football")),
      Row(4L, "umesh", "pokhara", "trinity college", null, "science", Seq.empty[String]),
      Row(5L, "sita", null, null, null, null, Seq("math"))
    ).asJava, schema)

  test("equi-rule backfill matches the golden edge list") {
    val got = EdgeRules.backfill(fixture)
      .select("src", "dst", "rel_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected = Set(
      (1L, 2L, "SAME_COLLEGE"), (3L, 4L, "SAME_COLLEGE"),
      (1L, 2L, "SAME_BOARD"), (1L, 3L, "SAME_BOARD"), (2L, 3L, "SAME_BOARD"),
      (1L, 2L, "SAME_STREAM"), (1L, 4L, "SAME_STREAM"), (2L, 4L, "SAME_STREAM"),
      (1L, 3L, "NEARBY"))
    assert(got === expected)
  }

  test("interest rule matches golden SHARES_INTEREST edges with common property") {
    val got = EdgeRules.interestRule(fixture.select("id", "interests"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](3).toList)).toSet
    val expected = Set(
      (1L, 2L, List("programming")),
      (2L, 3L, List("music")),
      (1L, 5L, List("math")))
    assert(got === expected)
  }

  test("MERGE anti-join creates only missing edges") {
    val existing = EdgeRules.backfill(fixture)
    val again = EdgeRules.mergeNew(EdgeRules.backfill(fixture), existing)
    assert(again.count() === 0)
  }

  test("incremental edges for a new student match the backfill delta") {
    val newbie = fixture.filter(col("id") === 5)
    // Student 5 has only nulls except interests → no equi edges.
    assert(EdgeRules.incrementalEdges(fixture.filter(col("id") < 5), newbie).count() === 0)
    val s2 = fixture.filter(col("id") === 2)
    val got = EdgeRules.incrementalEdges(fixture.filter(col("id") =!= 2), s2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, 2L, "SAME_COLLEGE"), (1L, 2L, "SAME_BOARD"), (2L, 3L, "SAME_BOARD"),
      (1L, 2L, "SAME_STREAM"), (2L, 4L, "SAME_STREAM")))
  }

  test("recommend reproduces EP2 scoring incl. the ''='' null-match quirk") {
    // Anchor = sita (5): all-null attrs. Umesh (4) has null board → bm=1
    // via coalesce(''), and null-college vs null-college am/cm logic:
    // umesh: college='trinity college' (≠''), board=null (=''→match),
    // stream='science' (≠null''), address='pokhara' (≠'').
    val got = Recommend.recommend(fixture, 5L)
      .select("id", "bm", "sm", "cm", "am", "matching_interests", "score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getSeq[String](5).toList, r.getInt(6))).toList
    // board null==null for umesh → bm=1; aayush shares "math" interest.
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(4L) === (4L, 1, 0, 0, 0, Nil, 1))
    assert(byId(1L)._6 === List("math"))
    // Ordering: score DESC, id.
    assert(got.map(_._7) === got.map(_._7).sorted.reverse)
  }

  test("response message covers the 0/1/2/n-name grammar (student_routes.py:46-62)") {
    def msg(students: DataFrame, anchor: Long): (String, Long) = {
      val r = Recommend.responseMessage(Recommend.recommend(students, anchor))
        .collect().head
      (r.getString(0), r.getLong(1))
    }
    // Anchor sita (5): umesh matches on the ''='' board quirk, aayush on
    // the shared "math" interest — equal scores, so id orders the names.
    assert(msg(fixture, 5L) ===
      ("aayush and umesh are also in this platform.", 2L))
    // Restricting the table exercises the 1-name and 0-name branches.
    assert(msg(fixture.filter(col("id").isin(5L, 4L)), 5L) ===
      ("umesh is also in this platform.", 1L))
    assert(msg(fixture.filter(col("id").isin(5L, 3L)), 5L) ===
      ("Sorry, no matches found for this platform.", 0L))
    // Anchor umesh (4): every other student scores exactly 1 (rohan via
    // college, dikshanta/aayush via stream, sita via the null board quirk)
    // → the n>=3 Oxford-comma branch in id order.
    assert(msg(fixture, 4L) ===
      ("aayush, dikshanta, rohan, and sita are also in this platform.", 4L))
  }

  test("interest intersection keeps left-side casing (student_service.py:155)") {
    import graft.functions.Norm
    val df = spark.sql("SELECT array('Math', 'PROG') AS a, array('math ', 'music') AS b")
      .select(Norm.intersectKeepLeft(col("a"), col("b")).as("i"))
    assert(df.collect().head.getSeq[String](0).toList === List("Math"))
  }
}
