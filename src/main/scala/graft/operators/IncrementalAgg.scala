package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over a [[VersionedStore]]: a
  * materialized additive aggregate (per-group row count + long SUMs)
  * kept current by applying the store's row-level change feed
  * ([[VersionedStore.changes]]) instead of recomputing from scratch.
  *
  * This is the downstream half of the lakehouse loop: ingest commits
  * batches into the store (exactly once via the streaming sink), and
  * every dependent rollup advances by reading O(changed file-groups)
  * of deltas and rewriting O(changed groups) of snapshot — at 100 TB
  * the full recompute the reference's dbt models run per refresh
  * (`my_first_dbt_model.sql` materializes the whole table each run)
  * is exactly what this avoids.
  *
  * The maintained measures are count (`n`) and long sums — the
  * additive algebra where insert = +row and delete = -row is exact
  * (pure integer arithmetic, no float order sensitivity), so
  * snapshot ≡ full recompute at EVERY version, which the spec
  * witnesses step by step and q334 gates cross-engine. Non-additive
  * aggregates (min/max, distinct) need different machinery and are
  * deliberately out of scope.
  *
  * NULL measures contribute 0 and an all-NULL group sums to 0, i.e.
  * the maintained measure is `COALESCE(SUM(m), 0)` — the only
  * definition the additive algebra can maintain exactly (SQL's
  * NULL-propagating SUM cannot: deleting a group's last non-NULL
  * row would have to turn a finite running sum back into NULL,
  * which no signed delta can express). [[aggregate]] — the
  * recompute witness — uses the same definition, so the invariant
  * holds even for groups whose every measure value is NULL, and the
  * delta fold coalesces BOTH terms (a change window that only
  * touches NULL-measure rows has a NULL delta sum, which must read
  * as +0, never poison the running total).
  *
  * The snapshot itself is a VersionedStore: each advance is a keyed
  * [[VersionedStore.merge]] of only the groups the delta touches
  * (insert-only groups land as new rows; untouched groups carry by
  * reference), followed by a [[VersionedStore.deleteWhere]] of
  * groups whose count reached zero. Readers of the snapshot get the
  * same atomicity/time-travel guarantees as the store — including
  * "the rollup as of batch k" audit reads.
  */
object IncrementalAgg {

  /** Materialize the aggregate of store version `v` as the snapshot's
    * first content. `measures` are summed as longs (exact).
    */
  def init(spark: SparkSession, storePath: String, snapPath: String,
      v: Long, groupCols: Seq[String], measures: Seq[String]): Long = {
    val full = aggregate(
      VersionedStore.readAt(spark, storePath, v), groupCols, measures)
    VersionedStore.create(spark, snapPath)
    VersionedStore.append(full, snapPath)
  }

  /** Advance the snapshot from store version `fromV` to `toV` by
    * applying the change feed. Two atomic snapshot commits: the merge
    * of changed-group totals, then the removal of groups whose count
    * reached zero (between the two, vanished groups are visible as
    * explicit n=0 rows — counts are never wrong, only explicit).
    * Returns the snapshot's new latest version.
    */
  def advance(spark: SparkSession, storePath: String, snapPath: String,
      fromV: Long, toV: Long, groupCols: Seq[String],
      measures: Seq[String], txn: Long = -1L): Long = {
    val feed = VersionedStore.changes(spark, storePath, fromV, toV)
    val sgn = when(col("_change") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(sum(sgn).as("_d_n"),
        measures.map(m =>
          sum(sgn * col(m).cast("long")).as(s"_d_$m")): _*)
    applyDelta(spark, snapPath, delta, groupCols, measures, txn)
  }

  /** Fold a signed per-group delta frame (groupCols + `_d_n` +
    * `_d_<m>` columns) into the snapshot store: merge new totals for
    * exactly the groups the delta touches (groups it never mentions
    * are carried by reference), then sweep groups whose count
    * reached zero. Shared by the single-store and join-view advance
    * paths.
    */
  private[operators] def applyDelta(spark: SparkSession,
      snapPath: String, deltaIn: DataFrame, groupCols: Seq[String],
      measures: Seq[String], txn: Long): Long = {
    // the delta's lineage can be expensive (the join-view's three
    // delta terms); everything below re-derives it several times —
    // emptiness, the merge's duplicate-key check, affected-group
    // detection, the writes — so materialize the (group-sized) frame
    // once and cut the upstream recomputes
    val delta = deltaIn.localCheckpoint()
    if (delta.isEmpty) return VersionedStore.latestVersion(spark, snapPath)
    // An empty snapshot (the streaming rollup's first batch, or a
    // join view's first advance) takes the delta as-is.
    val updates =
      if (VersionedStore.isEmpty(spark, snapPath))
        delta.select(groupCols.map(col) ++
          Seq(col("_d_n").as("n")) ++
          measures.map(m =>
            coalesce(col(s"_d_$m"), lit(0L)).as(m)): _*)
      else {
        val cur = VersionedStore.read(spark, snapPath)
        delta.join(cur, groupCols, "left_outer")
          .select(groupCols.map(col) ++
            Seq((coalesce(col("n"), lit(0L)) + col("_d_n")).as("n")) ++
            measures.map(m =>
              (coalesce(col(m), lit(0L)) +
                coalesce(col(s"_d_$m"), lit(0L))).as(m)): _*)
      }
    // txn tags the MERGE commit (the one that must never double-
    // apply); the trailing zero-group sweep checks the POST-merge
    // snapshot, not `updates` — on a crash-replay the merge is
    // skipped (txn already committed) and `updates` was computed
    // against the already-advanced snapshot, so only the snapshot
    // itself says whether a zero row still needs sweeping
    val merged =
      VersionedStore.merge(spark, snapPath, updates, groupCols, txn)
    if (VersionedStore.read(spark, snapPath)
        .filter(col("n") === 0).isEmpty) merged
    else VersionedStore.deleteWhere(spark, snapPath, col("n") === 0)
  }

  /** The snapshot's current content. */
  def read(spark: SparkSession, snapPath: String): DataFrame =
    VersionedStore.read(spark, snapPath)

  /** The full (non-incremental) aggregate — init's body and the
    * spec's equivalence witness. Sums are `COALESCE(SUM(m), 0)` per
    * the NULL convention above (identical to plain SUM whenever the
    * group has any non-NULL value).
    */
  def aggregate(df: DataFrame, groupCols: Seq[String],
      measures: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.map(m =>
          coalesce(sum(col(m).cast("long")), lit(0L)).as(m)): _*)
}
