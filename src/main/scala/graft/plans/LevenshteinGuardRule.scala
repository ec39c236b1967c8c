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

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  /** Guard each comparison independently. Guardedness is detected
    * STRUCTURALLY, not positionally: within a conjunction, a
    * comparison is skipped iff any sibling conjunct `semanticEquals`
    * its own guard — regardless of how the `And` tree is associated.
    * (Other optimizer rules, e.g. predicate pushdown, split and
    * recombine conjuncts left-associatively, so the `And(guard, cmp)`
    * adjacency this rule emits does not survive a fixed-point batch;
    * an adjacency-based check would re-wrap every iteration until the
    * iteration cap.) One guarded predicate never suppresses guarding
    * of a different, unguarded comparison in the same condition.
    */
  private def rewrite(cond: Expression): Expression = {
    val cs = conjuncts(cond)
    if (cs.length > 1) {
      val rewritten = cs.map { c =>
        guardable(c) match {
          case Some((lev, k)) =>
            val g = guardFor(lev, k)
            if (cs.exists(_.semanticEquals(g))) c else And(g, c)
          case None => rewriteLeaf(c)
        }
      }
      // keep the original And association when nothing changed, so the
      // optimizer's change detection sees a true fixed point
      if (rewritten.zip(cs).forall { case (a, b) => a eq b }) cond
      else rewritten.reduceLeft(And)
    } else rewriteLeaf(cond)
  }

  // a non-conjunction: wrap a bare guardable comparison (the next
  // fixed-point pass sees [guard, cmp] as siblings and stops), or
  // recurse into children (Or/Not/… may hold nested conjunctions)
  private def rewriteLeaf(e: Expression): Expression =
    guardable(e) match {
      case Some((lev, k)) => And(guardFor(lev, k), e)
      case None           => e.mapChildren(rewrite)
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
