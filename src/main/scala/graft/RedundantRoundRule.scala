package graft

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Custom Catalyst optimizer rule: drop a provably-redundant outer
  * round(). round(round(e, s1), s2) ≡ round(e, s1) whenever s2 >= s1 —
  * the inner result already has at most s1 decimal digits, so the outer
  * HALF_UP round is the identity. (The converse, s2 < s1, is NOT safe:
  * double rounding can differ from rounding once.)
  *
  * This pattern arises naturally in this engine: composed operators each
  * apply the rounding discipline (SURVEY.md §5.3.2), so a consumer
  * re-rounding an already-rounded column at an equal-or-finer scale is
  * common. Injected via GraftExtensions.injectOptimizerRule — the public
  * plug-in point; the rule itself only uses public Catalyst APIs
  * (Rule[LogicalPlan], transformAllExpressions).
  */
object RedundantRoundRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dataType equality guard: optimizer rules must preserve output
      // types. On DOUBLE both rounds are DoubleType and the rewrite is
      // free; on DECIMAL the two Rounds carry DIFFERENT precisions
      // (RoundBase.dataType = p - s + 1 + scale), so dropping the outer
      // one would change the plan's schema mid-optimization (a hard
      // failure under spark.sql.planChangeValidation, a silent schema
      // drift without it).
      case outer @ Round(inner @ Round(_, Literal(s1: Int, IntegerType), _),
          Literal(s2: Int, IntegerType), _)
          if s2 >= s1 && s1 >= 0 && outer.dataType == inner.dataType =>
        inner
    }
}
