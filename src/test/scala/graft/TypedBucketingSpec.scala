package graft

import org.apache.spark.sql.functions._

import graft.model.{Student, Tables}

/** Typed Dataset API + bucketed co-located joins (the shuffle-elimination
  * strategy for repeated large-table joins at scale). */
class TypedBucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("typed Dataset[Student]: compile-checked pipeline matches DataFrame path") {
    import spark.implicits._
    val ds = Student.ds(spark, sfDir)
    val typedCount = ds.filter(_.college.exists(_.startsWith("f")))
      .groupByKey(_.college.getOrElse("?"))
      .count().collect().toMap
    val dfCount = Tables.students(spark, sfDir)
      .filter(col("college").startsWith("f"))
      .groupBy("college").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typedCount === dfCount)
  }

  test("bucketed tables join without an exchange") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_test LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS graft_test.students_bucketed")
    Tables.students(spark, sfDir).write
      .bucketBy(8, "id").sortBy("id")
      .format("parquet")
      .saveAsTable("graft_test.students_bucketed")

    // Force the non-broadcast path: the point is that BUCKETS align the
    // partitioning, so the sort-merge join needs no shuffle exchange.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("graft_test.students_bucketed")
      val joined = t.as("a").join(t.as("b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed self-join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
      assert(joined.count() === 150)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
