package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins (builder
  * prompt: "repartition/bucketing for co-located joins").
  *
  * Writing both join sides bucketed+sorted on the join key lets
  * Catalyst plan a SortMergeJoin with NO Exchange on either side —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation on that key. This is the 100 TB answer
  * for repeatedly-joined fact tables (e.g. orders ⋈ lineitem on
  * orderkey every day).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts Catalyst elides both shuffles (verify: no Exchange below
    * the SortMergeJoin in the plan).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
