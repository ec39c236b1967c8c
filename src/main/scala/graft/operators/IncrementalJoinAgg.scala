package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN view between two versioned
  * stores — the classic signed delta rule: for M = γ(A ⋈ B),
  *
  *   ΔM = γ(ΔA ⋈ B_old) + γ(A_old ⋈ ΔB) + γ(ΔA ⋈ ΔB)
  *
  * where every Δ row carries a sign (insert = +1, delete = −1) and a
  * joined row's contribution is the PRODUCT of its sides' signs —
  * which is what makes deletes compose: a fact row deleted while its
  * dim row is also deleted is subtracted twice by the first two
  * terms and added back once by the third.
  *
  * Maintained measures are count (`n`) and long SUMs of fact-side
  * columns (exact integer arithmetic), applied to the snapshot with
  * [[IncrementalAgg.applyDelta]] — same atomicity, same idempotent
  * txn, same zero-group sweep.
  *
  * Scale shape: ΔA ⋈ B joins a small delta against the dim store
  * (broadcast the delta); A ⋈ ΔB is the expensive term — it scans
  * the fact store once per DIM change window, the unavoidable cost
  * of dimension churn in any join-view IVM (dim deltas are rare and
  * batched in practice); ΔA ⋈ ΔB is delta-sized. Nothing ever
  * recomputes the full historical join.
  *
  * Contract: `joinKey` is a single column present on both sides; all
  * other column names must be disjoint across the two stores;
  * `groupCols` may come from either side; `measures` are fact-side
  * numeric columns.
  */
object IncrementalJoinAgg {

  private def signed(df: DataFrame, as: String): DataFrame =
    df.withColumn(as,
      when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L)))
      .drop("_change")

  /** Content at `v`, or an empty frame in the schema of `atSchemaV`
    * when nothing is visible (v = 0, the pre-history version).
    */
  private def contentOrEmpty(spark: SparkSession, path: String,
      v: Long, atSchemaV: Long): DataFrame =
    if (v == 0) VersionedStore.readAt(spark, path, atSchemaV)
      .limit(0)
    else VersionedStore.readAt(spark, path, v)

  /** Advance the join-view snapshot from store versions
    * (fromFact, fromDim) to (toFact, toDim). Returns the snapshot's
    * new latest version.
    */
  def advance(spark: SparkSession, factPath: String, dimPath: String,
      snapPath: String, fromFact: Long, toFact: Long, fromDim: Long,
      toDim: Long, joinKey: String, groupCols: Seq[String],
      measures: Seq[String], txn: Long = -1L): Long = {
    // each delta feeds two terms; recomputing the (cheap, shuffle-
    // free for append/drop windows) feed twice measured FASTER than
    // eagerly materializing it — don't checkpoint here
    val dA = signed(
      VersionedStore.changes(spark, factPath, fromFact, toFact), "_sa")
    val dB = signed(
      VersionedStore.changes(spark, dimPath, fromDim, toDim), "_sb")
    val aOld = contentOrEmpty(spark, factPath, fromFact, toFact)
      .withColumn("_sa", lit(1L))
    val bOld = contentOrEmpty(spark, dimPath, fromDim, toDim)
      .withColumn("_sb", lit(1L))
    def term(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, joinKey :: Nil)
        .select(groupCols.map(col) ++
          Seq((col("_sa") * col("_sb")).as("_sign")) ++
          measures.map(col): _*)
    val joined = term(dA, bOld)
      .unionByName(term(aOld, dB))
      .unionByName(term(dA, dB))
    val delta = joined.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_sign")).as("_d_n"),
        measures.map(m =>
          sum(col("_sign") * col(m).cast("long")).as(s"_d_$m")): _*)
    IncrementalAgg.applyDelta(spark, snapPath, delta, groupCols,
      measures, txn)
  }

  /** The full (non-incremental) join aggregate — the spec's
    * equivalence witness and the init shortcut.
    */
  def aggregate(fact: DataFrame, dim: DataFrame, joinKey: String,
      groupCols: Seq[String], measures: Seq[String]): DataFrame =
    fact.join(dim, joinKey :: Nil)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.map(m => sum(col(m).cast("long")).as(m)): _*)
}
