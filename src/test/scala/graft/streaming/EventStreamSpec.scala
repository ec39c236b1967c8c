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

  test("file-stream sliding counts equal the batch computation") {
    val batchEvents = Tables.events(spark, sfDir)
      .select("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream5").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = EventStream.slidingCounts(
      EventStream.fileStream(spark, dir, batchEvents.schema))
    val got = EventStream.runAvailableNow(spark, streamed, "sliding_test")

    val expected = batchEvents
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
    got.count() shouldBe expected.count()
    got.except(expected).count() shouldBe 0
  }

  test("stream-static enrichment join equals the batch join") {
    val s = spark
    import s.implicits._
    val batchEvents = Tables.events(spark, sfDir)
      .select("ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream3").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val dim = batchEvents.select("user_id").distinct()
      .withColumn("user_tier",
        when(col("user_id") % 2 === 0, "even").otherwise("odd"))

    val streamed = EventStream.enrich(
      EventStream.fileStream(spark, dir, batchEvents.schema), dim, "user_id")
    val q = streamed.writeStream.format("memory").queryName("enrich_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val got = spark.table("enrich_test")

    val expected = EventStream.enrich(batchEvents, dim, "user_id")
    got.count() shouldBe expected.count()
    got.filter(col("user_tier").isNull).count() shouldBe 0
    got.except(expected).count() shouldBe 0
  }

  test("foreachBatch sink lands every micro-batch exactly once") {
    val batchEvents = Tables.events(spark, sfDir).select("ts", "user_id")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream4").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val outDir = java.nio.file.Files.createTempDirectory("graft-fb-out").toString

    val q = EventStream.foreachBatchSink(
      EventStream.fileStream(spark, dir, batchEvents.schema),
      (df, batchId) =>
        df.write.mode("overwrite").parquet(s"$outDir/batch_$batchId"))
    q.awaitTermination(120000L)

    val landed = spark.read.parquet(s"$outDir/batch_*")
    landed.count() shouldBe batchEvents.count()
  }

  test("stream-stream interval join equals the batch interval join") {
    val ev = Tables.events(spark, sfDir)
      .select("ts", "user_id", "event_type")
    val clicks = ev.filter(col("event_type") === "click")
      .select("ts", "user_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("ts", "user_id")
    val dirL = java.nio.file.Files.createTempDirectory("graft-ssl").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft-ssr").toString
    clicks.write.mode("overwrite").parquet(dirL)
    purchases.write.mode("overwrite").parquet(dirR)

    def project(j: org.apache.spark.sql.DataFrame) = j.select(
      col("l.user_id").as("user_id"),
      col("l.ts").as("click_ts"), col("r.ts").as("purchase_ts"))

    val streamed = project(EventStream.intervalJoin(
      EventStream.fileStream(spark, dirL, clicks.schema),
      EventStream.fileStream(spark, dirR, purchases.schema),
      key = "user_id", within = "10 minutes"))
    val got = EventStream.runAvailableNowAppend(spark, streamed, "ssjoin_test")

    val expected = project(
      clicks.alias("l").join(purchases.alias("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr("INTERVAL 10 MINUTES")))

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
