package graft.plans

import graft.sources.GraftStoreTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2
  .DataSourceV2Relation

/** Native-plan reads for [[graft.sources.GraftStoreCatalog]]
  * tables: the analyzer resolves `lake.ns.t` to a
  * [[DataSourceV2Relation]] over a [[GraftStoreTable]]; this rule
  * swaps that relation for the store's OWN analyzed read plan — the
  * same multi-path parquet scan (column pruning, parquet filter
  * pushdown, zone-map and bloom prune rules, DV anti-joins) a
  * registry read gets. Without the swap the v2 relation would fall
  * back to the table's [[org.apache.spark.sql.connector.read
  * .V1Scan]] — correct rows, but an opaque RDD scan Catalyst cannot
  * prune into.
  *
  * The swapped plan is wrapped in a Project that REBINDS the
  * store's output onto the v2 relation's attribute ids, so
  * operators that already resolved against the relation (the rule
  * runs inside the analyzer's fixed point) keep valid references —
  * the same id-preservation discipline the public Delta analysis
  * rule applies when it swaps its file indexes.
  *
  * Time travel rides the pin: `VERSION AS OF` / `TIMESTAMP AS OF`
  * over a catalog table resolve through the catalog's versioned
  * `loadTable` overloads into a version-pinned [[GraftStoreTable]],
  * and the swap serves `readAt` of that version.
  */
class GraftCatalogRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftStoreTable] =>
        val native = r.table.asInstanceOf[GraftStoreTable]
          .readDf.queryExecution.analyzed
        val byName = native.output
          .map(a => a.name.toLowerCase -> a).toMap
        Project(r.output.map { o =>
          Alias(byName(o.name.toLowerCase), o.name)(
            exprId = o.exprId, qualifier = o.qualifier)
        }, native)
    }
}
