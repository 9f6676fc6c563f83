package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.IndelRatio

/** Optimizer rule: rewrite `array_intersect(l, r)` over non-null string
  * arrays into `array_distinct(filter(l, x -> array_contains(r, x)))`.
  *
  * Why: ArrayIntersect's evaluator builds a hash set per evaluated ROW; on
  * the short arrays typical of token/interest columns the nested-loop
  * filter form is ~50× faster (measured at sf0.1: 279s → 5.4s over a 10⁸-row
  * pair join — see EdgeRules.interestRule, which uses the fast form
  * directly; this rule gives ad-hoc/SQL queries the same plan for free).
  *
  * Semantics: array_intersect returns the DISTINCT elements of `l` present
  * in `r`, preserving first-occurrence order — exactly
  * distinct(filter(contains)). Restricted to containsNull=false string
  * arrays so null-element semantics (where the two forms differ) are never
  * in play.
  */
object ArrayIntersectToFilter extends Rule[LogicalPlan] {

  private def eligible(e: ArrayIntersect): Boolean = (e.left.dataType, e.right.dataType) match {
    case (ArrayType(StringType, false), ArrayType(StringType, false)) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ai: ArrayIntersect if eligible(ai) =>
        val lv = NamedLambdaVariable("x", StringType, nullable = false)
        ArrayDistinct(ArrayFilter(ai.left,
          LambdaFunction(ArrayContains(ai.right, lv), Seq(lv))))
    }
}

/** Session extensions: the optimizer rule above + the `indel_ratio`
  * function, so `SparkSession.builder().withExtensions(new GraftExtensions)`
  * gives a fully-equipped session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ArrayIntersectToFilter)
    e.injectOptimizerRule(_ => ArraysOverlapJoinToExplodeJoin)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    e.injectFunction((
      new FunctionIdentifier("indel_ratio"),
      new ExpressionInfo(classOf[IndelRatio].getName, "indel_ratio"),
      (exprs: Seq[Expression]) => IndelRatio(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => graft.functions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[graft.functions.SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => graft.functions.SimHash32(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[graft.functions.MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => graft.functions.MinHashSigs(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[graft.functions.ZValue].getName, "z_value"),
      (exprs: Seq[Expression]) => graft.functions.ZValue(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        graft.functions.BloomMightContain(exprs(0), exprs(1))))
  }
}
