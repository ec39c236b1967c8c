package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join as an EQUI hash join: pairs `(l, r)` whose
  * closed intervals `[l.start, l.end]` and `[r.start, r.end]`
  * intersect. The two-sided generalization of [[BandedRangeJoin]]
  * (point-vs-point within gap) and the batch shape of a stream-stream
  * interval join — sessions × promotions, outages × requests,
  * validity-window reconciliation.
  *
  * A bare overlap predicate (`ls <= re AND rs <= le`) has no equality
  * conjunct, so Catalyst plans a nested-loop join — quadratic.
  * Rewrite: tile the line into width-`blockSize` blocks; each side
  * explodes into the blocks its interval covers
  * (`sequence(blk(start), blk(end))`), the join key becomes the block
  * id, and the exact overlap predicate filters the (locally bounded)
  * candidates. An overlapping pair shares every block that contains
  * any point of the intersection — it is emitted exactly once by
  * keeping only the block containing the overlap START
  * (`greatest(ls, rs)`), with no distinct/dedup pass.
  *
  * Correct for ANY interval length (`sequence` covers however many
  * blocks the interval spans); `blockSize` is purely a performance
  * knob — fan-out per row is `len/blockSize + 1`, per-block candidate
  * count is bounded by the data's interval density. Pick it near the
  * typical interval length. At 100 TB: one linear shuffle on block id,
  * no cartesian anywhere.
  *
  * Interval columns must be integral (day numbers, epoch seconds,
  * nanos); ends are inclusive; `start <= end` is the caller's
  * contract. Column-name collisions between the sides must be
  * resolved by the caller first.
  */
object IntervalJoin {

  /** Inner join of `left` and `right` on interval overlap:
    * `left(leftStart) <= right(rightEnd) AND
    *  right(rightStart) <= left(leftEnd)`.
    */
  def overlaps(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      blockSize: Long, maxBlocksPerRow: Long = 1 << 20): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    require(maxBlocksPerRow > 0,
      s"maxBlocksPerRow must be positive, got $maxBlocksPerRow")
    // `withColumn` would silently overwrite a caller's __blk and the
    // using-join would then run on the synthetic key — fail loudly
    require(!left.columns.contains("__blk") &&
        !right.columns.contains("__blk"),
      "overlaps: inputs must not contain a __blk column " +
        "(reserved internal name)")
    // integral floor division (Double's 53-bit mantissa would
    // mis-block nanosecond-scale keys — same trap BandedRangeJoin
    // fixed): c - pmod(c, g) is exactly divisible by g, so truncating
    // `div` equals floor for negative keys too.
    def blk(c: Column): Column = {
      val g = lit(blockSize)
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, g), g)
    }
    // Fan-out guard: one degenerate super-long interval (a year at
    // blockSize=second) would explode into millions of rows and blow
    // the stage. Fail loudly (executor-side, codegen'd — no extra
    // pass) instead of silently amplifying; the caller either raises
    // blockSize (see [[suggestBlockSize]]) or filters the outlier.
    def blockIds(s: Column, e: Column): Column = {
      val span = blk(e) - blk(s) + 1L
      val guard = assert_true(span <= lit(maxBlocksPerRow),
        concat(lit(s"IntervalJoin: interval spans more blocks than " +
          s"maxBlocksPerRow=$maxBlocksPerRow at blockSize=$blockSize " +
          "(raise blockSize, raise maxBlocksPerRow, or drop the " +
          "outlier); span="), span.cast("string")))
      // assert_true yields NULL when the predicate holds, raises
      // otherwise — so the when() forces the guard before the explode
      when(guard.isNull, sequence(blk(s), blk(e)))
    }
    val ls = col(leftStart); val le = col(leftEnd)
    val rs = col(rightStart); val re = col(rightEnd)
    val l = left.withColumn("__blk", explode(blockIds(ls, le)))
    val r = right.withColumn("__blk", explode(blockIds(rs, re)))
    l.join(r, "__blk")
      .filter(ls <= re && rs <= le)
      // emit each overlapping pair exactly once: only at the block
      // holding the first point both intervals share
      .filter(col("__blk") === blk(greatest(ls, rs)))
      .drop("__blk")
  }

  /** Data-driven `blockSize`: the `quantile` (default 0.75) of the
    * interval lengths, from a sampled sketch (`approxQuantile`, one
    * cheap aggregation — a planning step, not a per-row action). A
    * block near the typical interval length keeps fan-out at ~2 blocks
    * per row while keeping per-block candidate lists short; taking an
    * upper quantile rather than the mean keeps a long tail from
    * dragging the block size (and thus candidate density) up.
    */
  def suggestBlockSize(df: DataFrame, startCol: String, endCol: String,
      quantile: Double = 0.75): Long = {
    require(quantile > 0 && quantile < 1,
      s"quantile must be in (0, 1), got $quantile")
    val lens = df.select((col(endCol).cast("long") -
      col(startCol).cast("long") + 1L).as("__len"))
    val q = lens.stat.approxQuantile("__len", Array(quantile), 0.01)
    math.max(q.headOption.map(_.toLong).getOrElse(1L), 1L)
  }
}
