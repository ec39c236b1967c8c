package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile-pinned range layout: repartition a table into
  * near-equal-sized, range-disjoint buckets on one column, with the
  * cut points surfaced to the caller.
  *
  * Why not plain `repartitionByRange`: Spark's `RangePartitioner`
  * RESAMPLES the data on every run, so two writes of the same table
  * can land rows in different files — which breaks layout
  * reproducibility (incremental compaction, cross-run diffing,
  * file-level lineage) and hides the cut points the reader-side
  * min/max pruning story depends on. Here the cuts come from
  * `approxQuantile` once, are returned to the caller (persist them
  * next to the table), and bucket assignment is a pure projection —
  * deterministic given (data, cuts), no sampling in the write path.
  *
  * 100 TB shape: `approxQuantile` is one linear pass with bounded
  * per-partition sketch state (Greenwald-Khanna), the assignment is
  * map-side codegen (`filter` + `size` over a literal array — no UDF),
  * and the `repartition(n, bucket)` is the single shuffle a range
  * layout costs anyway. Heavily skewed keys (one value spanning
  * multiple quantiles) collapse duplicate cuts, so buckets stay
  * range-disjoint; the duplicate-heavy bucket is then the honest
  * skew, not an artifact.
  *
  * Reference analog: the dated-partition layout of
  * include/scripts/file_services/partitioner.py:21-38 generalized
  * from calendar buckets to data-driven quantile buckets.
  */
object RangeLayout {

  /** `df` plus a `__bucket` column in [0, cuts+1) assigned from the
    * returned ascending cut points, repartitioned so each bucket is
    * one partition. `relativeError` trades sketch size for balance
    * (0.001 ≈ within 0.1% of exact quantiles).
    */
  def byQuantiles(df: DataFrame, column: String, buckets: Int,
      relativeError: Double = 0.001): (DataFrame, Array[Double]) = {
    require(buckets >= 2, s"RangeLayout: need >= 2 buckets, got $buckets")
    require(!df.columns.contains("__bucket"),
      "RangeLayout: input already has the reserved __bucket column")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = df.stat.approxQuantile(column, probs, relativeError)
      .distinct.sorted
    val laid = df
      .withColumn("__bucket", bucketOf(col(column), cuts))
      .repartition(cuts.length + 1, col("__bucket"))
    (laid, cuts)
  }

  /** Write `df` range-laid on `column`: one directory per bucket
    * (Hive-style `__bucket=i/`), so every FILE holds exactly one
    * bucket's range whatever the shuffle's bucket→partition hash did
    * — readers prune whole directories from the persisted cuts. The
    * repartition before the write means each bucket is produced by
    * one task: no small-file spray.
    */
  def writeByQuantiles(df: DataFrame, column: String, buckets: Int,
      outDir: String): Array[Double] = {
    val (laid, cuts) = byQuantiles(df, column, buckets)
    laid.write.mode("overwrite").partitionBy("__bucket").parquet(outDir)
    cuts
  }

  /** Bucket index of `value` under ascending `cuts`: the count of cut
    * points ≤ value — a codegen'd higher-order-function projection,
    * no UDF, broadcastable-literal cuts.
    */
  def bucketOf(value: Column, cuts: Array[Double]): Column =
    size(filter(
      array(cuts.map(c => lit(c)).toIndexedSeq: _*),
      c => c <= value))
}
