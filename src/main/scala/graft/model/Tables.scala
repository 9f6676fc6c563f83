package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables, plus the reference-domain
  * views mapped onto them (see FIXTURES.md §B for the mapping rationale).
  *
  * Reference data model: `Student` nodes with typed similarity edges
  * (reference: fastapi/models/student.py:5-42,
  * fastapi/services/create_relationships.py:16-93). The reference stores every
  * string field lowercased at ingest (fastapi/routes/student_routes.py:26-33);
  * the `students` view normalizes identically.
  *
  * Scale note: all views are lazy projections over parquet scans — column
  * pruning and predicate pushdown reach the scan, so a 100 TB `customer`
  * table only materializes the five columns the view needs.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which Spark's
    * parquet reader rejects outright, PARQUET_TYPE_ILLEGAL) and
    * TIMESTAMP(MICROS). Branch on the read schema: a nanos file needs the
    * nanos-as-long conf plus an explicit floor-to-micros conversion — the same
    * truncation DuckDB applies reading nanos, so second-granularity outputs
    * agree exactly — while a micros file passes straight through. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Session-wide knob, set here as well as in the session builders so the
    // queries-map contract works on any caller-provided session. It only
    // affects TIMESTAMP(NANOS) columns (this repo: events.ts alone), and is a
    // no-op when the file is already micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The TimestampNTZ branch's cast below is epoch-preserving ONLY under a
    // UTC session zone; pin it here (not just in the entry-point builders)
    // for the same reason as the nanos conf — a caller-provided session in
    // another zone would silently shift every event timestamp.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: double division loses ulps above 2^53 and
        // int64 nanos (~1.7e18) are far beyond that.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // a no-timezone micros file infers as TIMESTAMP_NTZ; cast to the
        // session-zoned TIMESTAMP (all entry points pin UTC, so the cast is
        // epoch-preserving and matches DuckDB's naive-as-UTC read) —
        // streaming watermarks accept only the zoned type
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already TimestampType (micros) — pass through
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** The reference's `Student` node table mapped onto `customer`:
    *   id      = c_custkey
    *   name    = lower(c_name)                      (ingest lowercasing, student_routes.py:27)
    *   college = lower(c_mktsegment)                (5 values — the "SAME_COLLEGE" key)
    *   board   = c_nationkey as string              (25 values — the "SAME_BOARD" key)
    *   stream  = c_custkey % 7 as string            (synthetic 7-way key — "SAME_STREAM")
    *   address = floor(c_acctbal/1000) band string  (11-ish values — the "NEARBY" key)
    * `interests: array<string>` has no natural customer-side analog; the
    * array-overlap operators are exercised on `part` name tokens instead
    * (see [[partInterests]]), and on the golden reference-domain fixture in
    * the test suite.
    */
  def students(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir).select(
      col("c_custkey").as("id"),
      lower(col("c_name")).as("name"),
      lower(col("c_mktsegment")).as("college"),
      col("c_nationkey").cast("string").as("board"),
      (col("c_custkey") % 7).cast("string").as("stream"),
      floor(col("c_acctbal") / 1000).cast("int").cast("string").as("address"))

  /** SQL text of the students view, for embedding in DuckDB oracle queries.
    * MUST stay expression-for-expression identical to [[students]]. */
  val studentsSql: String =
    """SELECT c_custkey AS id, lower(c_name) AS name,
      | lower(c_mktsegment) AS college,
      | CAST(c_nationkey AS VARCHAR) AS board,
      | CAST(c_custkey % 7 AS VARCHAR) AS stream,
      | CAST(CAST(floor(c_acctbal/1000) AS INT) AS VARCHAR) AS address
      | FROM customer""".stripMargin.replace("\n", "")

  /** The reference's `User` node table (its second label — `CREATE (u:User
    * {name, age})`, src/graphdb.py:32-40) mapped onto `supplier`:
    *   id   = s_suppkey
    *   name = s_name AS-IS (User ingest does NOT lowercase — the
    *          normalization in student_routes.py:26-33 is Student-only)
    *   age  = 18 + s_suppkey % 60 (deterministic synthetic age; supplier
    *          has no age-like column)
    */
  def users(spark: SparkSession, sfDir: String): DataFrame =
    supplier(spark, sfDir).select(
      col("s_suppkey").as("id"),
      col("s_name").as("name"),
      (lit(18L) + col("s_suppkey") % 60).cast("long").as("age"))

  /** SQL text of the users view — MUST stay expression-for-expression
    * identical to [[users]]. */
  val usersSql: String =
    "SELECT s_suppkey AS id, s_name AS name, " +
    "CAST(18 + s_suppkey % 60 AS BIGINT) AS age FROM supplier"

  /** Deterministic `interests` for the students view, so the J4
    * pair-relationship template can surface a SHARES_INTEREST edge's
    * `common` property (reference returns `properties(rel)`,
    * llm_cypher.py:91). Two tokens per student: a pair token shared by
    * consecutive ids (`p<id/2>`) and a unique token (`r<id>`), so the
    * SHARES_INTEREST edge set is exactly the (2k, 2k+1) pairs — LINEAR in
    * students, never a dense token explosion. */
  def studentInterests(spark: SparkSession, sfDir: String): DataFrame =
    students(spark, sfDir).select(
      col("id"),
      array(
        concat(lit("p"), floor(col("id") / 2).cast("long").cast("string")),
        concat(lit("r"), col("id").cast("string"))).as("interests"))

  /** "Interests" analog: each part's normalized name-token array — the
    * `interests: array<string>` column of the reference schema
    * (fastapi/models/student.py:11), realized on the `part` table per
    * FIXTURES.md. */
  def partInterests(spark: SparkSession, sfDir: String): DataFrame =
    part(spark, sfDir).select(
      col("p_partkey").as("id"),
      split(lower(col("p_name")), " ").as("interests"))
}
