package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM joins (SURVEY.md §2.10's remaining join surface —
  * the stateful two-sided form next to the stream-static joins the
  * batch-parity gates run): both sides buffer in watermark-bounded
  * state and pairs emit as they meet.
  */
object StreamJoins {

  /** Event-time RANGE join: each left event pairs with same-key right
    * events whose time lies in `[leftTime − lookback, leftTime]` —
    * the streaming form of the q23/q126 banded range join and the
    * candidate-generation half of last-touch attribution (q251): the
    * as-of "latest only" cut is a downstream aggregation; the join
    * itself must emit every in-window candidate.
    *
    * State bound (the reason the watermarks are REQUIRED here, not
    * optional): with both sides watermarked and the join condition
    * bounding right time to a window of left time, Spark derives a
    * state watermark for each side — buffered rows older than
    * watermark + lookback are evicted, so state is
    * O(rate × (watermark + lookback)), not O(stream). Column names
    * must be disjoint apart from `key` (rename upstream).
    */
  def eventTimeRangeJoin(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      lookback: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark).alias("l")
    val r = right.withWatermark(rightTime, watermark).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND r.$rightTime <= l.$leftTime AND " +
        s"r.$rightTime >= l.$leftTime - INTERVAL $lookback"),
      "inner")
      .drop(col(s"r.$key"))
  }
}
