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
      blockSize: Long): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    // integral floor division (Double's 53-bit mantissa would
    // mis-block nanosecond-scale keys — same trap BandedRangeJoin
    // fixed): c - pmod(c, g) is exactly divisible by g, so truncating
    // `div` equals floor for negative keys too.
    def blk(c: Column): Column = {
      val g = lit(blockSize)
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, g), g)
    }
    val ls = col(leftStart); val le = col(leftEnd)
    val rs = col(rightStart); val re = col(rightEnd)
    val l = left.withColumn("__blk", explode(sequence(blk(ls), blk(le))))
    val r = right.withColumn("__blk", explode(sequence(blk(rs), blk(re))))
    l.join(r, "__blk")
      .filter(ls <= re && rs <= le)
      // emit each overlapping pair exactly once: only at the block
      // holding the first point both intervals share
      .filter(col("__blk") === blk(greatest(ls, rs)))
      .drop("__blk")
  }
}
