package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: guard `levenshtein(a, b) <= k` filters with the
  * necessary condition `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is at least the length difference, so the guard is
  * semantics-preserving — but it short-circuits the O(|a|·|b|) DP for
  * every candidate pair whose lengths already rule it out, which in a
  * blocked near-dup scan (Dedup.q69EditDistancePairs) is most of them.
  * This is the engine's example of extension point (c): a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * (GraftExtensions), where the reference's only extension surface was
  * a Python UDF.
  *
  * Convergence: the guard is only added when an equivalent conjunct
  * isn't already present in the same Filter, so the optimizer's
  * fixpoint batch stops after one application.
  */
object EditDistancePruning extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(lev: Levenshtein, k: Literal): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def rewrite(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    cond.transformUp {
      case cmp @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
          if lev.threshold.isEmpty &&
            !conjuncts.exists(_.semanticEquals(guardFor(lev, k))) =>
        And(guardFor(lev, k), cmp)
      case cmp @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
          if lev.threshold.isEmpty &&
            !conjuncts.exists(_.semanticEquals(guardFor(lev, k))) =>
        And(guardFor(lev, k), cmp)
    }
  }

  // The comparison may sit in a Filter OR have been pushed into a Join
  // condition by PushDownPredicates (the usual resting place for a
  // blocked self-join's distance threshold).
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond)
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewrite(cond)
      if (rewritten.fastEquals(cond)) j else j.copy(condition = Some(rewritten))
  }
}
