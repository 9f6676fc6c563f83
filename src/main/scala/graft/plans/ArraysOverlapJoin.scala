package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule (SURVEY.md §4: "ArraysOverlapJoinToExplodeJoin"): an inner
  * join whose condition contains `arrays_overlap(la, ra)` (la from the left,
  * ra from the right) would otherwise plan as a cartesian
  * BroadcastNestedLoopJoin — O(|L|·|R|) row comparisons. Rewrite both sides
  * with `explode(array_distinct(...))` and join on token equality, keeping
  * exactly one output row per qualifying pair by accepting only the MINIMUM
  * shared token (the same dedupe-by-expression trick EdgeRules uses, so no
  * post-join distinct is needed).
  *
  * Guarded to containsNull=false string arrays: with null elements
  * arrays_overlap can return null-vs-false distinctions the token join
  * doesn't reproduce.
  *
  * This generalizes the hand-written plan in EdgeRules.interestRule (which
  * additionally salts for skew) to any user-written overlap join.
  */
object ArraysOverlapJoinToExplodeJoin extends Rule[LogicalPlan] {

  private def eligible(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val overlapIdx = conjuncts.indexWhere {
        case ArraysOverlap(la, ra) =>
          eligible(la) && eligible(ra) &&
            la.references.subsetOf(left.outputSet) &&
            ra.references.subsetOf(right.outputSet)
        case _ => false
      }
      if (overlapIdx < 0) j
      else {
        val ArraysOverlap(la, ra) = conjuncts(overlapIdx): @unchecked
        val rest = conjuncts.patch(overlapIdx, Nil, 1)

        val tokL = AttributeReference("__tok_l", StringType, nullable = false)()
        val tokR = AttributeReference("__tok_r", StringType, nullable = false)()
        val genL = Generate(Explode(ArrayDistinct(la)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(tokL), left)
        val genR = Generate(Explode(ArrayDistinct(ra)), Nil, outer = false,
          qualifier = None, generatorOutput = Seq(tokR), right)

        // emit each qualifying pair only on its minimum shared token
        val lv = NamedLambdaVariable("x", StringType, nullable = false)
        val sharedMin = ArrayMin(ArrayFilter(la,
          LambdaFunction(ArrayContains(ra, lv), Seq(lv))))
        val newCond = (EqualTo(tokL, tokR) +: EqualTo(tokL, sharedMin) +: rest)
          .reduce(And)

        Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
      }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }
}
