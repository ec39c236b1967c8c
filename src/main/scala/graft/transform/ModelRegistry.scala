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

class ModelRegistry(spark: SparkSession) {
  private val models = mutable.LinkedHashMap.empty[String, Model]

  def register(model: Model): this.type = {
    models(model.name) = model
    this
  }

  /** Resolve a model and everything it `ref`s, memoized, with cycle
    * detection. Materializes each model exactly once.
    */
  def run(): Map[String, DataFrame] = {
    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    val inFlight = mutable.Set.empty[String]

    def resolve(name: String): DataFrame = built.getOrElse(name, {
      require(models.contains(name), s"unknown model: $name")
      require(inFlight.add(name), s"cycle detected at model: $name")
      val m = models(name)
      val df = m.build(resolve)
      val materialized = m.materialization match {
        case Table =>
          df.write.mode("overwrite").saveAsTable(m.name)
          spark.table(m.name)
        case View =>
          df.createOrReplaceTempView(m.name)
          df
      }
      inFlight.remove(name)
      built(name) = materialized
      materialized
    })

    models.keys.foreach(resolve)
    built.toMap
  }

  /** `dbt test`: every model's declared checks, single pass per model. */
  def test(): Map[String, Seq[CheckResult]] = {
    val dfs = run()
    models.values
      .filter(_.tests.nonEmpty)
      .map(m => m.name -> CheckRunner.run(dfs(m.name), m.tests))
      .toMap
  }
}
