package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Batch sessionization with BOTH an inactivity gap and a maximum
  * session duration (reference analog: the event-stream sessionizer
  * of SURVEY §2.10, taken to its batch form).
  *
  * The max-duration split is what makes this a real operator: a
  * session's end depends on its START, which depends on the previous
  * session's end — a recursion no window cumsum expresses (the
  * gap-only variant is q27's session_window / a flag-cumsum; this is
  * not that). It runs as the classic SECONDARY-SORT pattern:
  * `repartition(key)` + `sortWithinPartitions(key, ts)` + one linear
  * `mapPartitions` scan that tracks (key, session start, last ts).
  * Per-task state is O(1) — no per-key buffering, no driver
  * involvement — so a 100 TB event log sessionizes with exactly one
  * shuffle. Output is deterministic for any input partitioning
  * because the scan order (key, ts, tiebreaker) is total.
  */
object Sessionize {

  /** Appends `session_seq` (0-based per key): a new session starts at
    * an event that is more than `gapMicros` after the previous one,
    * or that would stretch the current session past `maxLenMicros`
    * from its first event. `tsCol` must be a non-null LONG (epoch
    * micros) — a null timestamp cannot be ordered, so it is rejected
    * at the boundary, not NPE'd mid-scan. `keyCol` must be an atomic
    * non-binary type: the scan compares keys with value equality,
    * which is REFERENCE equality for array/binary — silently wrong,
    * so those types are rejected up front. Ties on (key, ts) are
    * broken by `tieCol` to keep the order total.
    */
  def assign(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapMicros: Long,
      maxLenMicros: Long): DataFrame = {
    require(gapMicros > 0 && maxLenMicros > 0,
      s"gap/maxLen must be positive: $gapMicros/$maxLenMicros")
    require(events.schema(tsCol).dataType == LongType,
      s"tsCol '$tsCol' must be LONG epoch micros, " +
        s"got ${events.schema(tsCol).dataType.sql}")
    events.schema(keyCol).dataType match {
      case _: org.apache.spark.sql.types.BinaryType |
          _: org.apache.spark.sql.types.ArrayType |
          _: org.apache.spark.sql.types.MapType |
          _: org.apache.spark.sql.types.StructType =>
        throw new IllegalArgumentException(
          s"keyCol '$keyCol' must be an atomic non-binary type " +
            "(array/binary/map/struct keys compare by reference in " +
            "the session scan)")
      case _ => ()
    }
    val sorted = events
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(tieCol))
    val outSchema = StructType(
      sorted.schema.fields :+ StructField("session_seq", LongType))
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val tsIdx = sorted.schema.fieldIndex(tsCol)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var haveKey = false
      var seq = -1L
      var sessionStart = 0L
      var lastTs = 0L
      rows.map { r =>
        val k = r.get(keyIdx)
        if (r.isNullAt(tsIdx)) throw new IllegalArgumentException(
          s"Sessionize: null timestamp (key = $k) — filter null " +
            "timestamps before sessionizing")
        val ts = r.getLong(tsIdx)
        val newKey = !haveKey || k != curKey
        if (newKey || ts - lastTs > gapMicros ||
            ts - sessionStart > maxLenMicros) {
          seq = if (newKey) 0L else seq + 1L
          sessionStart = ts
        }
        curKey = k
        haveKey = true
        lastTs = ts
        Row.fromSeq(r.toSeq :+ seq)
      }
    }(enc)
  }
}
