package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard `levenshtein(a, b) <= k` predicates with the
  * free necessary condition `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is at least the length difference, so the guard
  * rejects a pair in O(1) before the O(|a|·|b|) DP runs — on a fuzzy
  * self-join (q126's shape) most candidate pairs die at the guard.
  * Length is computed from the string header, no content scan.
  *
  * The rewrite is purely additive (`guard AND original`), so results
  * are identical; idempotence comes from checking whether the guard is
  * already present (the optimizer runs batches to fixed point).
  *
  * Injection paths:
  *  - cluster-wide: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (injectOptimizerRule);
  *  - live session: `spark.experimental.extraOptimizations`.
  */
object LevenshteinGuardRule extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case cmp @ LessThanOrEqual(lev: Levenshtein, k: Literal) =>
      And(guardFor(lev, k), cmp)
    case cmp @ LessThan(lev: Levenshtein, k: Literal) =>
      And(guardFor(lev, k), cmp)
    case cmp @ GreaterThanOrEqual(k: Literal, lev: Levenshtein) =>
      And(guardFor(lev, k), cmp)
    case cmp @ GreaterThan(k: Literal, lev: Levenshtein) =>
      And(guardFor(lev, k), cmp)
  }

  // fixed-point safety: if the condition already carries a guard, the
  // rewrite must leave it untouched (the optimizer re-runs batches).
  private def alreadyGuarded(cond: Expression, guarded: Expression): Boolean =
    guarded.semanticEquals(cond) ||
      cond.exists {
        case LessThanOrEqual(Abs(Subtract(Length(_), Length(_), _), _), _) =>
          true
        case _ => false
      }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val guarded = rewrite(cond)
      if (alreadyGuarded(cond, guarded)) f else f.copy(condition = guarded)
    // predicate pushdown may have folded the filter into a join
    // condition before this rule runs
    case j @ Join(_, _, _, Some(cond), _) =>
      val guarded = rewrite(cond)
      if (alreadyGuarded(cond, guarded)) j
      else j.copy(condition = Some(guarded))
  }
}
