package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count roll-ups over Datasketches HLL — the
  * pre-aggregated form of COUNT(DISTINCT) that makes "distinct users
  * per day, re-rollable to any coarser grain" an O(sketch) MERGE
  * instead of a re-scan of history.
  *
  * Why it matters at 100 TB: an exact distinct roll-up is NOT
  * algebraic — distinct-per-day cannot be summed into
  * distinct-per-week, so every new grain re-shuffles the raw fact
  * table. An HLL sketch IS mergeable: the daily build is one linear
  * pass storing ~KB per (day, dim) cell, and every coarser grain
  * (week, month, all-time, any dimension slice union) is a union of
  * those cells — the q175 incremental-maintenance story extended to
  * the one aggregate that has no exact merge. Estimates carry the
  * standard HLL error (~1.04/√2^lgK ≈ 1.6% at lgK = 12); the
  * SketchRollupSpec pins the merge-consistency contract (union of
  * partial sketches == sketch of the union, exactly, since the merge
  * is deterministic) and the accuracy band vs exact counts.
  *
  * Built on `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` (Spark 4 built-ins over datasketches-java —
  * codegen'd aggregates, no UDFs, binary-sketch columns storable in
  * any parquet aggregate table).
  */
object SketchRollup {

  /** Per-`grain` sketch table: one binary HLL per (grainCols) cell
    * over `col`. Persist this — it is the only scan of the raw data.
    */
  def build(df: DataFrame, col: String, grainCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(grainCols.map(c => expr(c)): _*)
      .agg(hll_sketch_agg(expr(col), lgK).as("sketch"))

  /** Roll a sketch table built by [[build]] up to a coarser grain:
    * union the cell sketches, estimate distinct. `rollCols` must be
    * derivable from the build grain (e.g. week from day).
    */
  def rollup(sketches: DataFrame, rollCols: Seq[String]): DataFrame =
    sketches
      .groupBy(rollCols.map(c => expr(c)): _*)
      .agg(hll_union_agg(expr("sketch")).as("sketch"))
      .withColumn("n_distinct_est",
        hll_sketch_estimate(expr("sketch")).cast("long"))
}
