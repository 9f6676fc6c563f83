package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.EdgeRules

/** Source/sink formats: the engine's tables round-trip through CSV and
  * JSON sources with schemas intact (same DataFrame API downstream — format
  * is a reader concern, not an operator concern), and the edge sink writes
  * partitioned parquet (partition pruning on rel_type is the read-path
  * payoff at scale). */
class SourcesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("students survive a CSV and a JSON round-trip bit-for-bit") {
    val students = Tables.students(spark, sfDir)
    val expected = students.orderBy("id").collect().toSeq

    val csvDir = Files.createTempDirectory("students-csv").toString
    students.write.mode("overwrite").option("header", "true").csv(csvDir)
    val fromCsv = spark.read.schema(students.schema)
      .option("header", "true").csv(csvDir)
    assert(fromCsv.orderBy("id").collect().toSeq === expected)

    val jsonDir = Files.createTempDirectory("students-json").toString
    students.write.mode("overwrite").json(jsonDir)
    val fromJson = spark.read.schema(students.schema).json(jsonDir)
    assert(fromJson.orderBy("id").collect().toSeq === expected)
  }

  test("ORC round-trip preserves rows AND pushes filters to the scan") {
    val students = Tables.students(spark, sfDir)
    val orcDir = Files.createTempDirectory("students-orc").toString
    students.write.mode("overwrite").orc(orcDir)
    val fromOrc = spark.read.orc(orcDir)
    assert(fromOrc.orderBy("id").collect().toSeq ===
      students.orderBy("id").collect().toSeq)
    // columnar format ⇒ predicate pushdown reaches the ORC scan, same as
    // parquet (the reader swap changes nothing downstream of the scan).
    val q = fromOrc.filter(col("id") === 42L).select("id", "name")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,42)"),
      s"id filter not pushed to the ORC scan:\n$scan")
    assert(q.count() === 1)
  }

  test("edge sink: partitioned parquet prunes by rel_type on read") {
    val edges = EdgeRules.backfill(Tables.students(spark, sfDir))
    val dir = Files.createTempDirectory("edges-part").toString
    edges.write.mode("overwrite").partitionBy("rel_type").parquet(dir)

    // partition dirs exist per rel_type
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("rel_type=")).map(_.getName).toSet
    assert(parts === Set("rel_type=SAME_COLLEGE", "rel_type=SAME_BOARD",
      "rel_type=SAME_STREAM", "rel_type=NEARBY"))

    // a rel_type filter becomes a partition filter (no data scan of others)
    val one = spark.read.parquet(dir).filter(col("rel_type") === "SAME_BOARD")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(rel_type"),
      s"rel_type not pruned as a partition filter:\n$scan")
    assert(one.count() ===
      edges.filter(col("rel_type") === "SAME_BOARD").count())
  }
}
