package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the engine's event operators
  * (SURVEY.md §2.10). The reference's only streaming-ish construct is
  * the polling file sensor (dags/ingest_bundesliga_match_scores.py:
  * 54-67); its event-driven replacement is a file stream — new files
  * under a landing path become micro-batches, `Trigger.AvailableNow`
  * gives catch-up-then-stop semantics (the batch-parity mode used in
  * tests), a continuous trigger gives the always-on pipeline.
  *
  * The windowed transforms are the SAME declarations as the batch
  * queries q25/q27 plus a watermark — one definition, two execution
  * modes, which is the point of declaring plans rather than schedules.
  */
object EventStream {

  /** File-arrival source over a directory (sensor replacement). */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    spark.readStream.format(format).schema(schema).load(path)

  /** Watermarked tumbling-window counts (streaming form of q25).
    * State for a window is dropped once the watermark passes its end —
    * bounded state no matter how long the stream runs.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked sliding-window counts (streaming form of q26): each
    * event lands in width/slide overlapping windows; state per window
    * dropped once the watermark passes its end.
    */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Watermarked session windows per user (streaming form of q27). */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes",
      gap: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Stream-static enrichment join: each micro-batch joins against
    * the (small) static dimension, planned as a broadcast hash join —
    * the streaming form of the q07-style dim join. The static side is
    * re-resolvable per batch, so a dimension refresh (new snapshot
    * under the same path) is picked up without restarting the query.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join (inner): each left row
    * pairs with same-key right rows whose timestamp falls in
    * [left.ts, left.ts + within]. The time bound plus the watermarks
    * let the engine evict buffered rows once the watermark passes
    * their last possible match — state stays bounded no matter how
    * long both streams run (an unconstrained stream-stream join would
    * buffer forever). Caller projects from the `l`/`r` aliases.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      watermark: String = "10 minutes",
      within: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $within"))
  }

  /** foreachBatch sink: apply an arbitrary batch writer per
    * micro-batch (idempotent by batchId) — the escape hatch for sinks
    * without a native streaming writer (JDBC, upserts, partitioned
    * rewrites). Returns the started query; caller awaits/stops.
    */
  def foreachBatchSink(streamed: DataFrame,
      write: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    streamed.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch(write)
      .start()

  /** Run a streaming DataFrame to an in-memory table with
    * AvailableNow (process everything present, then stop) and return
    * the materialized result. Complete mode because the sinks above
    * are aggregations.
    */
  def runAvailableNow(spark: SparkSession, streamed: DataFrame,
      queryName: String, timeoutMs: Long = 120000L): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(timeoutMs)
    spark.table(queryName)
  }

  /** Append-mode twin of [[runAvailableNow]] for row-emitting streams
    * (joins, enrichments) where complete mode doesn't apply.
    */
  def runAvailableNowAppend(spark: SparkSession, streamed: DataFrame,
      queryName: String, timeoutMs: Long = 120000L): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(timeoutMs)
    spark.table(queryName)
  }
}
