package graft.streaming

import graft.SparkFixture
import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming/batch parity: the streaming window transforms over the
  * events table (fed as a file stream, AvailableNow) must equal the
  * same declaration run in batch.
  */
class EventStreamSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("file-stream tumbling counts equal the batch computation") {
    val batchEvents = Tables.events(spark, sfDir)
      .select("ts", "event_type", "value")
    // stage as micro-batch-able parquet with a clean schema
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = EventStream.tumblingCounts(
      EventStream.fileStream(spark, dir, batchEvents.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "tumbling_test")

    val expected = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

    got.count() shouldBe expected.count()
    got.except(expected).count() shouldBe 0
    expected.except(got).count() shouldBe 0
  }

  test("file-stream session windows produce sessions with bounded gaps") {
    val batchEvents = Tables.events(spark, sfDir)
      .select("ts", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = EventStream.sessionCounts(
      EventStream.fileStream(spark, dir, batchEvents.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "session_test")

    val batchSessions = batchEvents
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    got.count() shouldBe batchSessions.count()
    got.agg(sum("n_events")).head().getLong(0) shouldBe batchEvents.count()
  }
}
