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

  test("watermark semantics: late rows beyond the watermark are " +
      "evicted, out-of-order rows within it are counted, finalized " +
      "windows emit exactly once across a restart") {
    val s = spark
    import s.implicits._
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    val schema = Seq((ts("00:00"), "click", 1.0))
      .toDF("ts", "event_type", "value").schema
    val inDir = java.nio.file.Files.createTempDirectory("graft-late-in")
      .toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-late-out")
      .toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-late-ck")
      .toString

    def runOnce(): Unit = {
      // append mode + checkpoint: a window row lands in the sink only
      // when the watermark passes its end (memory sink can't
      // checkpoint, so the restartable form needs a file sink)
      val q = EventStream.tumblingCounts(
          EventStream.fileStream(spark, inDir, schema),
          watermark = "10 minutes", width = "1 hour")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    def landed(): Map[(java.sql.Timestamp, String), (Long, Double)] =
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          "window_start TIMESTAMP, event_type STRING, " +
            "n_events BIGINT, sum_value DOUBLE"))
        .parquet(outDir).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

    // run 1: two rows in the 10:00 window, then 12:00 arrives →
    // watermark 11:50 → the 10:00 window (end 11:00) is finalized
    Seq((ts("10:05"), "click", 1.0), (ts("10:20"), "click", 2.0),
      (ts("12:00"), "click", 4.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce()
    val after1 = landed()
    after1 should contain key ((ts("10:00"), "click"))
    after1((ts("10:00"), "click")) shouldBe ((2L, 3.0))

    // run 2 (same checkpoint — watermark 11:50 restored):
    //  10:30 is LATE beyond the watermark (its window closed) → dropped
    //  11:55 is out-of-order (older than the 12:00 already seen) but
    //        its window end 12:00 > watermark → counted
    //  14:00 advances the watermark to 13:50, finalizing the 11:00 and
    //        12:00 windows; its own window stays open and unemitted
    Seq((ts("10:30"), "click", 100.0), (ts("11:55"), "click", 8.0),
      (ts("14:00"), "click", 16.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce()
    val after2 = landed()
    after2 shouldBe Map(
      (ts("10:00"), "click") -> ((2L, 3.0)),   // unchanged: late row out
      (ts("11:00"), "click") -> ((1L, 8.0)),   // out-of-order row in
      (ts("12:00"), "click") -> ((1L, 4.0)))   // state survived restart
    // the 14:00 window is still open — not in the sink, no early emit
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
