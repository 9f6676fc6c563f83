package graft.ops

import org.apache.spark.sql.SparkSession

import graft.model.Tables

/** Session-prebuilt standing indexes for the QUERY-ONLY rows (the q15
  * warm-view precedent applied to index-backed retrieval): every
  * `*_indexed` row prices build + query together, so a plan regression
  * in the QUERY path — the amortized repeated-query regime the index
  * exists for — can hide inside build-cost noise. Each build here runs
  * once per (layout, sfDir) per JVM; the `*_query` twins then time
  * probe + ADC + rescore (or postings probe + score) ONLY. Under the
  * bench harness's best-of-2, iteration 1 pays the one-time build and
  * iteration 2 is the pure query — the recorded number.
  *
  * The external-query oracle rows reuse the same standing indexes, so
  * correctness coverage costs no extra builds. */
object WarmIndex {

  private val built = scala.collection.concurrent.TrieMap[String, String]()

  /** Memoized build: one table per (kind, sfDir) per JVM, in a
    * temp-located `graft_warm` database (fresh location per JVM — a
    * stale warehouse dir from an earlier run must not collide). */
  private def ensure(spark: SparkSession, sfDir: String, kind: String)(
      build: String => Unit): String =
    built.getOrElseUpdate(s"$kind|$sfDir", {
      val wh = java.nio.file.Files.createTempDirectory(s"graft-warm-$kind")
        .toFile.getAbsolutePath
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_warm LOCATION '$wh'")
      // table name from the SANITIZED path, not a hash — two sfDirs with
      // colliding hashCodes would silently serve one corpus's index for
      // the other (a silent-wrong-answer class, however unlikely)
      val t = s"graft_warm.${kind}_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      build(t)
      t
    })

  def ivf(spark: SparkSession, sfDir: String): String =
    ensure(spark, sfDir, "ivf")(t =>
      Similarity.buildIvfIndex(Tables.embeddings(spark, sfDir), t))

  def ivfPq(spark: SparkSession, sfDir: String): String =
    ensure(spark, sfDir, "ivfpq")(t =>
      Similarity.buildIvfPqIndex(Tables.embeddings(spark, sfDir), t))

  def ivfPqResidual(spark: SparkSession, sfDir: String): String =
    ensure(spark, sfDir, "ivfpqr")(t =>
      Similarity.buildIvfPqResidualIndex(Tables.embeddings(spark, sfDir), t))

  def ivfSq(spark: SparkSession, sfDir: String): String =
    ensure(spark, sfDir, "ivfsq")(t =>
      Similarity.buildIvfSqIndex(Tables.embeddings(spark, sfDir), t))

  def bm25(spark: SparkSession, sfDir: String): String =
    ensure(spark, sfDir, "bm25")(t =>
      Search.buildIndex(Tables.documents(spark, sfDir), t))
}
