package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL time travel over [[graft.operators.VersionedStore]] tables:
  * resolves the parser's native `VERSION AS OF n` / `TIMESTAMP AS OF
  * ts` suffix (which Spark emits as an unresolved
  * [[RelationTimeTravel]] node and, without a v2 catalog, would
  * reject during analysis) against store views registered through
  * `VersionedStore.registerTable` —
  *
  * {{{
  * VersionedStore.registerTable(spark, path, "doc_store")
  * spark.sql("SELECT * FROM doc_store VERSION AS OF 2")
  * spark.sql("SELECT * FROM doc_store TIMESTAMP AS OF '2026-01-01'")
  * }}}
  *
  * An analyzer (resolution) rule, not an optimizer rule, because the
  * node must become a resolved relation before analysis completes;
  * activated at session build via `spark.sql.extensions =
  * graft.functions.GraftExtensions`. Names not registered with the
  * store fall through untouched (a v2 catalog table keeps its own
  * time-travel semantics). `TIMESTAMP AS OF` resolves through the
  * commit timestamps persisted in the log — the newest version
  * committed at or before the instant — so it costs one cached log
  * read, never a data scan.
  */
class StoreTimeTravelRule(session: SparkSession)
    extends Rule[LogicalPlan] {
  import graft.operators.VersionedStore

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // the bare registered name = LATEST, resolved fresh per query
      // (builtin rules run first each iteration, so a real catalog
      // table or temp view of the same name wins over the registry)
      case u: UnresolvedRelation
          if u.multipartIdentifier.size == 1 &&
            VersionedStore
              .registeredPath(u.multipartIdentifier.head).isDefined =>
        VersionedStore.read(session,
          VersionedStore.registeredPath(u.multipartIdentifier.head).get)
          .queryExecution.analyzed
      case RelationTimeTravel(u: UnresolvedRelation, ts, v)
          if u.multipartIdentifier.size == 1 &&
            VersionedStore
              .registeredPath(u.multipartIdentifier.head).isDefined =>
        val name = u.multipartIdentifier.head
        val path = VersionedStore.registeredPath(name).get
        val version = (v, ts) match {
          case (Some(vs), _) =>
            try vs.toLong
            catch {
              case _: NumberFormatException => sys.error(
                s"VERSION AS OF over store view $name expects a " +
                  s"numeric commit version, got '$vs'")
            }
          case (None, Some(expr)) if expr.foldable =>
            val micros = Cast(expr, TimestampType,
              Some(session.sessionState.conf.sessionLocalTimeZone))
              .eval() match {
              case l: java.lang.Long => l.longValue()
              case _ => sys.error(
                s"TIMESTAMP AS OF over store view $name: cannot " +
                  "evaluate the timestamp expression")
            }
            VersionedStore
              .versionAtTimestamp(session, path, micros / 1000L)
          case _ => sys.error(
            s"time travel over store view $name needs VERSION AS " +
              "OF <n> or a literal TIMESTAMP AS OF")
        }
        VersionedStore.readAt(session, path, version)
          .queryExecution.analyzed
    }
}
