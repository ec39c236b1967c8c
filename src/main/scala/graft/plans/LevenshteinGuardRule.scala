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

  // A levenshtein-vs-literal comparison this rule guards, with the
  // pieces needed to build (or recognize) its guard.
  private def guardable(e: Expression): Option[(Levenshtein, Expression)] =
    e match {
      case LessThanOrEqual(lev: Levenshtein, k: Literal) => Some((lev, k))
      case LessThan(lev: Levenshtein, k: Literal)        => Some((lev, k))
      case GreaterThanOrEqual(k: Literal, lev: Levenshtein) => Some((lev, k))
      case GreaterThan(k: Literal, lev: Levenshtein)        => Some((lev, k))
      case _ => None
    }

  /** Guard each comparison independently; a comparison already wrapped
    * in ITS OWN guard (`guard AND cmp`, the shape this rule emits) is
    * left untouched, so the optimizer's re-run of the batch reaches a
    * fixed point — but one guarded predicate never suppresses guarding
    * of a different, unguarded one in the same condition.
    */
  private def rewrite(cond: Expression): Expression = cond match {
    case And(g, cmp) if guardable(cmp).exists { case (lev, k) =>
          g.semanticEquals(guardFor(lev, k)) } =>
      cond
    case _ =>
      guardable(cond) match {
        case Some((lev, k)) => And(guardFor(lev, k), cond)
        case None           => cond.mapChildren(rewrite)
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val guarded = rewrite(cond)
      if (guarded.fastEquals(cond)) f else f.copy(condition = guarded)
    // predicate pushdown may have folded the filter into a join
    // condition before this rule runs
    case j @ Join(_, _, _, Some(cond), _) =>
      val guarded = rewrite(cond)
      if (guarded.fastEquals(cond)) j
      else j.copy(condition = Some(guarded))
  }
}
