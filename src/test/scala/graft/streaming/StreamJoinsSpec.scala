package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Stream-stream event-time range join vs its batch form: the
  * streamed candidate set must equal the batch range join exactly —
  * including across a micro-batch split where one side of a pair
  * arrives a batch after the other (the buffered-state case a
  * stream-static join cannot express).
  */
class StreamJoinsSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  test("stream-stream range join equals the batch range join across " +
      "a micro-batch split") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("t_id"),
        col("user_id").as("user_id"), col("ts").as("t_ts"))

    val want = purchases.alias("l").join(touches.alias("r"),
        expr("l.user_id = r.user_id AND r.t_ts <= l.p_ts AND " +
          "r.t_ts >= l.p_ts - INTERVAL 7 days"), "inner")
      .select(col("p_id"), col("t_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    want should not be empty

    val pDir = java.nio.file.Files
      .createTempDirectory("graft-ssj-p").toString
    val tDir = java.nio.file.Files
      .createTempDirectory("graft-ssj-t").toString
    // split each side in two files -> two micro-batches per source:
    // some pairs only complete when the LATER batch arrives, so the
    // parity proves cross-batch buffering, not single-batch join
    val pm = purchases.agg(expr("percentile(p_id, 0.5)")).head().getDouble(0)
    val tm = touches.agg(expr("percentile(t_id, 0.5)")).head().getDouble(0)
    purchases.filter(col("p_id") <= pm).coalesce(1)
      .write.mode("append").parquet(pDir)
    purchases.filter(col("p_id") > pm).coalesce(1)
      .write.mode("append").parquet(pDir)
    touches.filter(col("t_id") <= tm).coalesce(1)
      .write.mode("append").parquet(tDir)
    touches.filter(col("t_id") > tm).coalesce(1)
      .write.mode("append").parquet(tDir)

    val joined = StreamJoins.eventTimeRangeJoin(
      EventStream.fileStream(spark, pDir, purchases.schema),
      EventStream.fileStream(spark, tDir, touches.schema),
      "user_id", "p_ts", "t_ts",
      lookback = "7 days", watermark = "365 days")
    val q = joined.select("p_id", "t_id")
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000L)

    val got = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe want
  }
}
