package graft
import org.apache.spark.sql.SparkSession
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    spark.read.parquet(s"$sf/nation.parquet").count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"@@ $name%-12s ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    import graft.ops.WarmIndex._
    t("ivf")(ivf(spark, sf)); t("ivfpq")(ivfPq(spark, sf))
    t("ivfpqr")(ivfPqResidual(spark, sf)); t("ivfsq")(ivfSq(spark, sf))
    t("bm25")(bm25(spark, sf)); t("positional")(positional(spark, sf))
    t("fuzzy")(fuzzy(spark, sf)); t("fuzzyskip")(fuzzySkip(spark, sf))
    t("graphadj")(graphAdjacency(spark, sf))
    spark.stop()
  }
}
