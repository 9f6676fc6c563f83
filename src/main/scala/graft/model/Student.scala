package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed form of the reference's Student schema
  * (fastapi/models/student.py:5-11): compile-time field checks via the
  * case-class Encoder where type safety helps; the DataFrame views stay the
  * dynamic-schema path. */
case class Student(
    id: Long,
    name: String,
    address: Option[String],
    college: Option[String],
    board: Option[String],
    stream: Option[String],
    interests: Option[Seq[String]])

object Student {

  /** Typed students over the driver tables (interests has no customer-side
    * analog → None; populated in the reference-domain fixtures). */
  def ds(spark: SparkSession, sfDir: String): Dataset[Student] = {
    import spark.implicits._
    Tables.students(spark, sfDir)
      .withColumn("interests", lit(null).cast("array<string>"))
      .as[Student]
  }
}
