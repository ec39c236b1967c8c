package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-gap range join as an EQUI hash join (the q126 blocking
  * pattern, reusable): pairs `(l, r)` with `0 <= r.key - l.key <=
  * maxGap` — without this rewrite a bare range predicate plans as a
  * nested-loop join, quadratic in the input.
  *
  * Rewrite: block every row by `key div maxGap`; a qualifying right
  * row lives in the left row's block or the next one, so the LEFT
  * side probes both (explode of 2 block ids) and the join key becomes
  * the block — a plain shuffled/broadcast HASH join with ≤ 2×|L|
  * probe rows, then the exact gap filter on the (bounded) candidates.
  *
  * At 100 TB: linear shuffle on the block id; per-block candidate
  * count is bounded by the data's density in a `maxGap` window, not
  * by table size. Fuzzy entity matching, sensor alignment, and
  * near-key reconciliation all reduce to this shape.
  */
object BandedRangeJoin {

  /** Inner join of `left` and `right` on
    * `0 <= right(rightKey) - left(leftKey) <= maxGap`. Key columns
    * must be integral (LongType/IntegerType); keys must be
    * `>= Long.MinValue + maxGap` (the floor-division rewrite would
    * wrap below that — irrelevant for real timestamps/ids). Column-name
    * collisions between the two sides must be resolved by the caller
    * first.
    */
  def joinWithinGap(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, maxGap: Long): DataFrame = {
    require(maxGap > 0, s"maxGap must be positive, got $maxGap")
    // `withColumn` would silently overwrite a caller's __blk and the
    // using-join would then run on the synthetic key — fail loudly
    require(!left.columns.contains("__blk") &&
        !right.columns.contains("__blk"),
      "joinWithinGap: inputs must not contain a __blk column " +
        "(reserved internal name)")
    // Floor division in pure Long arithmetic: floor(c / maxGap) via
    // `/` promotes to Double, whose 53-bit mantissa mis-blocks keys
    // above 2^53 (nanosecond epochs!) and silently DROPS pairs the
    // equi-join never produces. `c - pmod(c, g)` is exactly divisible
    // by g, so truncating integral `div` equals floor, for negative
    // keys too.
    def blk(c: Column): Column = {
      val g = lit(maxGap)
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, g), g)
    }
    val l = left.withColumn("__blk",
      explode(array(blk(col(leftKey)), blk(col(leftKey)) + 1)))
    val r = right.withColumn("__blk", blk(col(rightKey)))
    l.join(r, "__blk")
      .filter(col(rightKey) >= col(leftKey) &&
        col(rightKey) - col(leftKey) <= maxGap)
      .drop("__blk")
  }
}
