package graft.transform

import scala.collection.mutable

import graft.check.{Check, CheckResult, CheckRunner}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style transformation layer (reference: data_transformations/ —
  * models referencing each other via `{{ ref(...) }}`
  * (models/example/my_second_dbt_model.sql:5), materialized as `table`
  * or `view` (`{{ config(materialized='table') }}`
  * my_first_dbt_model.sql:10 overriding the project default `view`,
  * dbt_project.yml:34-38), with `unique`/`not_null` schema tests
  * (schema.yml:10-21)).
  *
  * Spark-native mapping (SURVEY.md §3.3): a model is a named DataFrame
  * definition; `ref` is function composition, so lineage IS the DAG
  * and Catalyst optimizes straight through view boundaries;
  * materialization `table` → `saveAsTable` (physical CTAS), `view` →
  * temp view (zero-copy). Tests reuse the Check algebra — each model's
  * suite runs in one aggregation pass.
  */
sealed trait Materialization
case object Table extends Materialization
case object View extends Materialization

final case class Model(
    name: String,
    materialization: Materialization,
    build: (String => DataFrame) => DataFrame,
    tests: Seq[Check] = Seq.empty)

/** The third public dbt materialization mode — `incremental` — mapped
  * onto [[graft.operators.VersionedStore]]. The reference's dbt
  * project only uses table/view (dbt_project.yml:34-38), which
  * re-materialize the WHOLE model every run; at 100 TB the refresh
  * must process only what changed, which is exactly dbt's
  * incremental mode: the model body sees the previously materialized
  * state (dbt's `{{ this }}` / `is_incremental()` pair — here the
  * explicit `thisOpt`, None on the first run or after a full
  * refresh) and returns only the candidate rows for THIS run; the
  * registry folds them in atomically.
  *
  *  - `uniqueKey` empty → append-only (dbt's default incremental
  *    strategy): candidates land as one commit.
  *  - `uniqueKey` set → upsert (dbt's merge strategy): candidates
  *    replace matching keys and insert the rest, rewriting only the
  *    file-groups the keys touch.
  *
  * Either way the store gives the run atomicity (one commit), an
  * audit trail (`history`), time travel to any prior run's state,
  * and a change feed downstream consumers can tail.
  */
final case class IncrementalModel(
    name: String,
    storePath: String,
    build: (String => DataFrame, Option[DataFrame]) => DataFrame,
    uniqueKey: Seq[String] = Seq.empty,
    statsCol: Option[String] = None,
    tests: Seq[Check] = Seq.empty,
    /** auto-OPTIMIZE: after each run, compact the store when its
      * live file-group count (incl. deletion vectors) exceeds this —
      * N small incremental runs end folded without anyone calling
      * compact. None = never self-compact.
      */
    autoCompact: Option[Int] = None)

class ModelRegistry(spark: SparkSession) {
  import graft.operators.VersionedStore

  private val models = mutable.LinkedHashMap.empty[String, Model]
  private val incrementals =
    mutable.LinkedHashMap.empty[String, IncrementalModel]

  def register(model: Model): this.type = {
    models(model.name) = model
    this
  }

  def register(model: IncrementalModel): this.type = {
    incrementals(model.name) = model
    this
  }

  /** Resolve a model and everything it `ref`s, memoized, with cycle
    * detection. Materializes each model exactly once per run();
    * incremental models ADVANCE their store exactly once per run()
    * (the "dbt run" unit), and downstream refs see the post-advance
    * content.
    */
  def run(): Map[String, DataFrame] = {
    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    val inFlight = mutable.Set.empty[String]

    def resolve(name: String): DataFrame = built.getOrElse(name, {
      require(models.contains(name) || incrementals.contains(name),
        s"unknown model: $name")
      require(inFlight.add(name), s"cycle detected at model: $name")
      val materialized = models.get(name) match {
        case Some(m) =>
          val df = m.build(resolve)
          m.materialization match {
            case Table =>
              df.write.mode("overwrite").saveAsTable(m.name)
              spark.table(m.name)
            case View =>
              df.createOrReplaceTempView(m.name)
              df
          }
        case None =>
          val m = incrementals(name)
          if (!VersionedStore.exists(spark, m.storePath))
            VersionedStore.create(spark, m.storePath)
          val thisOpt =
            if (VersionedStore.isEmpty(spark, m.storePath)) None
            else Some(VersionedStore.read(spark, m.storePath))
          val candidates = m.build(resolve, thisOpt)
          // a keyed model's FIRST run takes the append path (there
          // is nothing to merge against), but must still enforce
          // merge's duplicate-key rejection — a first batch with
          // duplicate keys would poison the store, and the next
          // run's merge would silently collapse each duplicated key
          // (later runs get the check inside merge itself)
          if (m.uniqueKey.nonEmpty && thisOpt.isEmpty) {
            val dup = candidates.groupBy(m.uniqueKey.map(
              org.apache.spark.sql.functions.col): _*)
              .count().filter(org.apache.spark.sql.functions
                .col("count") > 1).limit(1).count()
            require(dup == 0,
              s"incremental model ${m.name}: candidates carry " +
                s"duplicate ${m.uniqueKey.mkString(",")} keys")
          }
          (thisOpt, m.uniqueKey) match {
            case (None, _) | (_, Seq()) =>
              VersionedStore.append(candidates, m.storePath, m.statsCol)
            case (Some(_), keys) =>
              VersionedStore.merge(spark, m.storePath, candidates, keys)
          }
          // the maintenance policy the ingest loop consults itself:
          // past the fragmentation threshold the run ends with a
          // compaction commit, so read amplification never grows
          // unboundedly with run count
          m.autoCompact.foreach(maxGroups =>
            VersionedStore.maintain(spark, m.storePath, maxGroups))
          val out = VersionedStore.read(spark, m.storePath)
          out.createOrReplaceTempView(m.name)
          out
      }
      inFlight.remove(name)
      built(name) = materialized
      materialized
    })

    models.keys.foreach(resolve)
    incrementals.keys.foreach(resolve)
    built.toMap
  }

  /** `dbt test`: every model's declared checks, single pass per model. */
  def test(): Map[String, Seq[CheckResult]] = {
    val dfs = run()
    (models.values.map(m => (m.name, m.tests)) ++
      incrementals.values.map(m => (m.name, m.tests)))
      .filter(_._2.nonEmpty)
      .map { case (n, ts) => n -> CheckRunner.run(dfs(n), ts) }
      .toMap
  }
}
