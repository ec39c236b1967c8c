package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Custom stateful streaming operators via KeyValueGroupedDataset
  * state APIs (SURVEY.md §2.10: `mapGroupsWithState` /
  * `flatMapGroupsWithState` as the custom-state forms).
  */
object StatefulOps {

  final case class UserStats(user_id: Long, n_events: Long,
      sum_value: Double)

  /** Per-user running event count + value sum maintained in keyed
    * state across micro-batches (Update output mode). State is one
    * (long, double) pair per user — bounded by key cardinality, not
    * stream length; add a timeout for unbounded key spaces.
    */
  def runningUserStats(spark: SparkSession,
      events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserStats](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          UserStats(uid, n, s)
      }
  }

  /** Streaming dedup on a key column within a watermark window —
    * the built-in stateful form (state pruned by the watermark).
    *
    * Late-data caveat (observed in verification): rows older than
    * `watermark` behind the stream's max event time are DROPPED, so a
    * key-based backfill whose event times lag the live stream loses
    * rows silently — widen the watermark (or run backfills as batch
    * dropDuplicates) when arrival order diverges from event order.
    */
  def dedupByKey(events: DataFrame, watermark: String = "10 minutes",
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
