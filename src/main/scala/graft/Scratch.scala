package graft
import org.apache.spark.sql.SparkSession
import graft.model.Tables
import graft.ops.{Similarity, WarmIndex}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    for (slpp <- Seq(5, 10, 20, 40)) {
      val sw = Similarity.annNprobeSweep(spark, emb,
        WarmIndex.ivfPq(spark, d), WarmIndex.ivfPqResidual(spark, d),
        WarmIndex.ivfSq(spark, d), shortlistPerProbe = slpp)
      println(s"=== slpp=$slpp ===")
      sw.collect().foreach(r => println(r.mkString(" ")))
      graft.CacheScope.unpersistAll()
    }
    spark.stop()
  }
}
