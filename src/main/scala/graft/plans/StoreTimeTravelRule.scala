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
  import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
    DeleteFromTable, InsertIntoStatement, UpdateTable}
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

  private def pathOf(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
      VersionedStore.registeredPath(u.multipartIdentifier.head)
    case org.apache.spark.sql.catalyst.plans.logical
      .SubqueryAlias(_, child) => pathOf(child) // MERGE INTO t AS tgt
    case _ => None
  }

  /** The alias a DML target was given (`DELETE FROM t AS x`), if
    * any — its qualifier must be stripped from the statement's
    * attributes before they can bind against the store DataFrame
    * (which carries no alias at run time).
    */
  private def aliasOf(p: LogicalPlan): Option[String] = p match {
    case org.apache.spark.sql.catalyst.plans.logical
      .SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  private def stripQual(alias: Option[String],
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    alias match {
      case None => e
      case Some(a) => e.transform {
        case u: UnresolvedAttribute if u.nameParts.size > 1 &&
            u.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(u.nameParts.tail)
      }
    }

  /** The equi-key list of a MERGE condition: a conjunction of
    * `<side>.k = <side>.k` equalities over IDENTICALLY-NAMED columns
    * (the only join shape the store's keyed merge expresses). Any
    * other condition → None, and the caller rejects with the
    * supported forms named.
    */
  private def mergeKeys(cond: org.apache.spark.sql.catalyst
      .expressions.Expression): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    cond match {
      case And(l, r) =>
        for { a <- mergeKeys(l); b <- mergeKeys(r) } yield a ++ b
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last == b.nameParts.last =>
        Some(Seq(a.nameParts.last))
      case _ => None
    }
  }

  /** TOP-DOWN, so a DML statement over a registered name is
    * intercepted while its table child is still an
    * [[UnresolvedRelation]] — bottom-up would resolve the child to
    * the store relation first and the builtin analyzer would then
    * reject "DELETE is only supported with v2 tables" before this
    * rule ever saw the statement.
    */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // ---- SQL DML over registered store tables: each statement
      // ---- becomes ONE driver-side command = one atomic store
      // ---- commit (StoreDmlCommands). Predicates/SETs/source stay
      // ---- unresolved inside the leaf command and bind at run time.
      case InsertIntoStatement(t, partSpec, userCols, query,
          overwrite, ifPartitionNotExists, byName)
          if pathOf(t).isDefined =>
        if (partSpec.nonEmpty) sys.error(
          "INSERT into a store table takes no PARTITION spec — the " +
            "store has no partition columns (zones/z-order cluster " +
            "instead)")
        if (overwrite) sys.error(
          "INSERT OVERWRITE is not supported on store tables — " +
            "spell the intent explicitly (deleteWhere + append, or " +
            "restore)")
        if (byName) sys.error(
          "INSERT BY NAME is not supported on store tables — SQL " +
            "inserts are by position (or name a column list)")
        val _ = ifPartitionNotExists
        StoreInsertCommand(pathOf(t).get, query, userCols)
      case DeleteFromTable(t, cond) if pathOf(t).isDefined =>
        // an absent WHERE arrives as a literal TRUE from the parser
        val real = Option(cond).filterNot(
          _ == org.apache.spark.sql.catalyst.expressions.Literal
            .TrueLiteral)
        StoreDeleteCommand(pathOf(t).get,
          real.map(e => new SqlExpr(stripQual(aliasOf(t), e))))
      case m: org.apache.spark.sql.catalyst.plans.logical
          .MergeIntoTable if pathOf(m.targetTable).isDefined =>
        import org.apache.spark.sql.catalyst.plans.logical.{
          DeleteAction, InsertStarAction, UpdateStarAction}
        val keys = mergeKeys(m.mergeCondition).getOrElse(sys.error(
          "MERGE INTO a store table: the ON condition must be a " +
            "conjunction of equalities over identically-named key " +
            "columns (t.k = s.k [AND …])"))
        if (m.withSchemaEvolution || m.notMatchedBySourceActions
          .nonEmpty) sys.error(
          "MERGE INTO a store table supports neither WITH SCHEMA " +
            "EVOLUTION nor WHEN NOT MATCHED BY SOURCE")
        val src = m.sourceTable match {
          case org.apache.spark.sql.catalyst.plans.logical
            .SubqueryAlias(_, child) => child
          case other => other
        }
        (m.matchedActions, m.notMatchedActions) match {
          case (Seq(UpdateStarAction(None)),
              Seq(InsertStarAction(None))) =>
            StoreMergeCommand(pathOf(m.targetTable).get, src,
              keys.distinct, upsert = true)
          case (Seq(DeleteAction(None)), Seq()) =>
            StoreMergeCommand(pathOf(m.targetTable).get, src,
              keys.distinct, upsert = false)
          case _ => sys.error(
            "MERGE INTO a store table supports exactly two forms: " +
              "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED " +
              "THEN INSERT * (keyed upsert), or WHEN MATCHED THEN " +
              "DELETE alone (keyed delete) — conditional or " +
              "per-column actions are not expressible as one " +
              "atomic store commit")
        }
      case UpdateTable(t, assignments, cond)
          if pathOf(t).isDefined =>
        val al = aliasOf(t)
        val sets = assignments.map {
          case Assignment(k: UnresolvedAttribute, v) =>
            (k.nameParts.last, new SqlExpr(stripQual(al, v)))
          case a => sys.error(
            s"UPDATE on a store table: unsupported SET target " +
              s"${a.key.sql} (name a plain column)")
        }
        StoreUpdateCommand(pathOf(t).get, sets,
          cond.map(e => new SqlExpr(stripQual(al, e))))

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
