package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline extensions); `oracleSql` the DuckDB-runnable
  * equivalent for every SQL-expressible one.
  */
object SparkEntry {

  /** Registry of all declared queries. */
  def allQueries: Seq[QueryDef] = Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema join-aggregate: broadcast dims + shuffled fact join.
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q07_join_agg").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
