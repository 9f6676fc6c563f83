package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.GraftSql

/** Planner strategy for [[TopKPerKey]]: partial heaps → (exchange inserted
  * by EnsureRequirements from the final's required distribution) → final
  * heaps. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ord, k, child) =>
      TopKPerKeyFinalExec(keys, ord, k,
        TopKPerKeyPartialExec(keys, ord, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API for the custom operator. */
object TopK {
  /** Keep the `k` best rows per distinct `keys` value, "best" = highest
    * `scoreCol` with ascending `tiebreakCol` resolving ties. */
  def perKey(df: DataFrame, keys: Seq[String], scoreCol: String,
      tiebreakCol: String, k: Int): DataFrame =
    build(df, keys, scoreCol, Descending, tiebreakCol, k)

  /** Keep the `k` SMALLEST rows per key (ascending `scoreCol`) — same
    * operator; used for deterministic hash-quota sampling where "best"
    * means lowest hash. */
  def perKeyMin(df: DataFrame, keys: Seq[String], scoreCol: String,
      tiebreakCol: String, k: Int): DataFrame =
    build(df, keys, scoreCol, Ascending, tiebreakCol, k)

  private def build(df: DataFrame, keys: Seq[String], scoreCol: String,
      dir: org.apache.spark.sql.catalyst.expressions.SortDirection,
      tiebreakCol: String, k: Int): DataFrame = {
    require(k >= 1, s"TopK.perKey requires k >= 1, got $k")
    // Fail fast with an actionable message instead of Spark's opaque
    // planner assertion when the session was built without GraftExtensions
    // (library-style callers): without TopKPerKeyStrategy the logical node
    // has no physical plan.
    require(
      df.sparkSession.sessionState.planner.strategies.exists(_ eq TopKPerKeyStrategy),
      "TopKPerKey requires a SparkSession built with graft.plans.GraftExtensions " +
        "(SparkSession.builder().withExtensions(new GraftExtensions)) so " +
        "TopKPerKeyStrategy can plan it")
    val ordering = Seq(
      SortOrder(UnresolvedAttribute.quoted(scoreCol), dir),
      SortOrder(UnresolvedAttribute.quoted(tiebreakCol), Ascending))
    GraftSql.ofRows(df.sparkSession,
      TopKPerKey(keys.map(UnresolvedAttribute.quoted), ordering, k,
        df.queryExecution.logical))
  }
}
