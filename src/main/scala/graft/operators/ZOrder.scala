package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several key
  * columns into one sort key so that sorting by it keeps rows close in
  * EVERY dimension — the data-layout primitive behind multi-column
  * min/max skipping.
  *
  * Why it matters at 100 TB: parquet readers prune row groups by
  * per-column min/max. A table range-partitioned on one column skips
  * perfectly on that column and not at all on others; laid out by
  * z-value, each file covers a small hyper-rectangle of the key space,
  * so selective predicates on ANY of the clustered columns prune most
  * files. Same idea as Delta/Iceberg `ZORDER BY` / `sort_order`, built
  * here from plain codegen'd bit arithmetic — `shiftright`/`&`/`<<`/
  * `|` over the low `bits` of each key, no UDF, no custom expression,
  * whole-stage codegen keeps it at scan speed.
  *
  * Keys must be non-negative after the caller's own normalization
  * (rank, bucket id, epoch-day, dictionary code…); values above
  * `2^bits - 1` are clamped to the top bucket so outliers cannot wrap
  * into the wrong corner of the curve. NULL keys map to `nullsTo`
  * (default 0, the origin corner) — deliberate and explicit: a
  * mostly-null column then clusters with the 0 bucket rather than
  * scattering; callers who want nulls isolated at the far corner pass
  * `nullsTo = (1L << bits) - 1`.
  */
object ZOrder {

  /** Morton code of `cols` (low `bits` of each, clamped; NULL →
    * `nullsTo`), as a long. Bit `b` of column `i` lands at interleaved
    * position `b * n + i` — at most `bits * n <= 63` total.
    */
  def zValue(cols: Seq[Column], bits: Int = 16,
      nullsTo: Long = 0L): Column = {
    val n = cols.length
    require(n >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * n <= 63,
      s"bits * cols must fit a long: got $bits * $n")
    val cap = (1L << bits) - 1
    require(nullsTo >= 0L && nullsTo <= cap,
      s"nullsTo must be in [0, $cap], got $nullsTo")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(
        least(greatest(coalesce(c.cast("long"), lit(nullsTo)), lit(0L)),
          lit(cap)), b)
        .bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` into `numPartitions` z-ordered partitions: range
    * partition on the z-value (one shuffle sized by the sampled range
    * bounds — AQE-friendly, skew handled by the sampler) and sort
    * within each so every output file covers a tight z-range, i.e. a
    * small rectangle in key space. Write the result with any sink;
    * per-file min/max on the clustered columns is what downstream
    * scans prune on.
    */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Int = 0, nullsTo: Long = 0L): DataFrame = {
    require(!df.columns.contains("__z"),
      "clusterByZ: input already has a __z column (reserved internal name)")
    val z = zValue(cols.map(col), bits, nullsTo).as("__z")
    val withZ = df.withColumn("__z", z)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions("__z").drop("__z")
  }
}
