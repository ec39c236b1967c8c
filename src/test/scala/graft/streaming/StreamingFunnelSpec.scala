package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Batch-parity witness for the 3-stage funnel state machine: on an
  * in-order stream split across micro-batches (partial progress
  * carried between them), the emitted completions must equal a
  * sequential scan of the sorted event log running the same
  * first-touch/reset rules.
  */
class StreamingFunnelSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val SpanUs = 5L * 24 * 3600 * 1000000 // 5 days

  private def truth(): Set[(Long, Long, Long, Long)] = {
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    rows.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      var st = (0, 0L, 0L, 0L, 0L) // (stage, s1_ts, s1_id, s2_id, s2_ts)
      evs.sortBy(e => (e._2, e._3)).flatMap { case (_, ts, eid, tpe) =>
        if (st._1 > 0 && ts - st._2 > SpanUs) st = (0, 0L, 0L, 0L, 0L)
        tpe match {
          case "view" =>
            if (st._1 == 0) st = (1, ts, eid, 0L, 0L)
            None
          case "click" =>
            if (st._1 == 1 && ts > st._2) st = (2, st._2, st._3, eid, ts)
            None
          case _ =>
            if (st._1 == 2 && ts > st._5 && ts - st._2 <= SpanUs) {
              val done = (uid, st._3, st._4, eid)
              st = (0, 0L, 0L, 0L, 0L)
              Some(done)
            } else None
        }
      }
    }.toSet
  }

  test("completions equal the scan truth across in-order micro-batches") {
    val batch = Tables.events(spark, sfDir)
      .select("ts", "user_id", "event_type", "value", "event_id")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-funnel-stream").toString
    val ts33 = batch.selectExpr("percentile(unix_micros(ts), 0.33)")
      .head().getDouble(0).toLong
    val ts66 = batch.selectExpr("percentile(unix_micros(ts), 0.66)")
      .head().getDouble(0).toLong
    val parts = Seq(
      batch.filter(unix_micros(col("ts")) <= ts33),
      batch.filter(unix_micros(col("ts")) > ts33 &&
        unix_micros(col("ts")) <= ts66),
      batch.filter(unix_micros(col("ts")) > ts66))
    parts.zipWithIndex.foreach { case (p, i) =>
      p.coalesce(1).write.mode("overwrite").parquet(s"$dir/p$i")
      Thread.sleep(1100) // distinct mtimes → in-order pickup
    }
    val stream = spark.readStream.format("parquet")
      .schema(batch.schema)
      .option("maxFilesPerTrigger", 1)
      .load(s"$dir/p*")
    val q = StatefulOps
      .funnelProgress(spark, stream, "view", "click", "purchase",
        SpanUs)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("funnel_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = truth()
    want should not be empty
    got shouldBe want
  }
}
