package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Materialized-summary rewrite — the query-optimizer half of
  * incremental view maintenance (q286 maintains the summary; this
  * rule makes queries USE it): an `Aggregate` whose child is a
  * registered fact table, whose grouping keys are a subset of the
  * summary's keys, and whose aggregates decompose over partials
  * (SUM / COUNT(*) / MIN / MAX) is rewritten to re-aggregate the
  * summary instead of scanning the fact — at 100 TB that is the
  * difference between reading a KB-scale rollup and the corpus.
  *
  * Correctness constraints, enforced structurally:
  *  - grouping expressions must be plain attribute references whose
  *    names are summary keys (any derived grouping → no rewrite);
  *  - every aggregate must map through the registered partials:
  *    SUM(x) → SUM(sum_x), COUNT(*)/COUNT(1) → SUM(cnt),
  *    MIN(x) → MIN(min_x), MAX(x) → MAX(max_x); DISTINCT or
  *    filtered aggregates never rewrite (not decomposable);
  *  - SUM over FLOAT/DOUBLE never rewrites: re-aggregating partial
  *    double sums changes the addition order and therefore the
  *    result bits — only order-free types (integral, decimal) pass;
  *  - the rewritten output preserves every original name, exprId and
  *    dataType (casts re-impose the original Sum result type, which
  *    re-aggregation would otherwise widen), so parent operators are
  *    untouched.
  *
  * Fact matching uses `sameResult` on the project-stripped child —
  * the same normalized-plan equivalence CacheManager uses — so the
  * rule still fires after column pruning inserts a Project over the
  * scan.
  *
  * Injection paths: cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or on a
  * live session via `spark.experimental.extraOptimizations`.
  */
object SummaryRewriteRule extends Rule[LogicalPlan] {

  final case class Entry(factPlan: LogicalPlan, summaryPlan: LogicalPlan,
      keys: Set[String], partials: Map[(String, String), String])

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[Entry]()

  /** Register `summary` as the rollup of `fact` grouped by `keys`.
    * `partials` maps (agg, column) → summary column, e.g.
    * ("sum", "l_quantity") → "sum_qty", ("count", "*") → "n_rows",
    * ("min", "l_shipdate") → "min_sd". The caller owns the summary's
    * freshness (q175/q286 give it the incremental refresh).
    */
  def register(fact: DataFrame, summary: DataFrame, keys: Seq[String],
      partials: Map[(String, String), String]): Unit =
    entries.add(Entry(fact.queryExecution.analyzed,
      summary.queryExecution.analyzed, keys.toSet, partials))

  def clear(): Unit = entries.clear()

  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  private def orderFree(dt: DataType): Boolean = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
    case _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // same cheap rejects as ZoneMapPruneRule: the rule runs globally
    // now, and a registered fact is a leaf relation — skip the
    // canonicalization tax on aggregates over arbitrary subtrees
    if (entries.isEmpty) return plan
    plan.transformUp {
    case agg @ Aggregate(_, _, child, _)
        if stripProjects(child)
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical
            .LeafNode] =>
      val stripped = stripProjects(child)
      val it = entries.iterator()
      var done: Option[Aggregate] = None
      while (done.isEmpty && it.hasNext) {
        val e = it.next()
        if (stripped.sameResult(e.factPlan)) done = tryRewrite(agg, e)
      }
      done.getOrElse(agg)
    }
  }

  private def tryRewrite(agg: Aggregate, e: Entry): Option[Aggregate] = {
    val sumOut: Map[String, Attribute] =
      e.summaryPlan.output.map(a => a.name -> a).toMap

    // grouping: plain refs, names ⊆ keys, present in the summary
    val groupingOk = agg.groupingExpressions.forall {
      case a: AttributeReference =>
        e.keys.contains(a.name) && sumOut.contains(a.name)
      case _ => false
    }
    if (!groupingOk) return None

    def partialFor(kind: String, col: String): Option[Attribute] =
      e.partials.get((kind, col)).flatMap(sumOut.get)

    val rewritten: Seq[Option[NamedExpression]] =
      agg.aggregateExpressions.map {
        case a: AttributeReference
            if agg.groupingExpressions.exists(_.semanticEquals(a)) =>
          sumOut.get(a.name).map(sa =>
            Alias(sa, a.name)(exprId = a.exprId))
        case al @ Alias(
            AggregateExpression(fn, _, false, None, _), name) =>
          val repl: Option[Expression] = fn match {
            case Sum(attr: AttributeReference, _)
                if orderFree(attr.dataType) =>
              partialFor("sum", attr.name).map(pa =>
                Cast(Sum(pa).toAggregateExpression(), al.dataType))
            // COUNT(NULL) is 0 per group, not the row count — only a
            // non-null literal is COUNT(*); and an UNGROUPED count
            // over an empty fact must yield 0 where SUM over the
            // empty summary yields NULL, hence the coalesce.
            case Count(Seq(Literal(v, _))) if v != null =>
              partialFor("count", "*").map(pa =>
                Coalesce(Seq(
                  Cast(Sum(pa).toAggregateExpression(), LongType),
                  Literal(0L))))
            case Count(Seq()) =>
              partialFor("count", "*").map(pa =>
                Coalesce(Seq(
                  Cast(Sum(pa).toAggregateExpression(), LongType),
                  Literal(0L))))
            case Min(attr: AttributeReference) =>
              partialFor("min", attr.name).map(pa =>
                Cast(Min(pa).toAggregateExpression(), al.dataType))
            case Max(attr: AttributeReference) =>
              partialFor("max", attr.name).map(pa =>
                Cast(Max(pa).toAggregateExpression(), al.dataType))
            case _ => None
          }
          repl.map(r => Alias(r, name)(exprId = al.exprId))
        case _ => None
      }
    if (rewritten.exists(_.isEmpty)) return None

    val newGrouping = agg.groupingExpressions.map {
      case a: AttributeReference => sumOut(a.name)
    }
    Some(Aggregate(newGrouping, rewritten.map(_.get), e.summaryPlan))
  }
}
