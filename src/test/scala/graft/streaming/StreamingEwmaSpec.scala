package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Batch-parity witness for the streaming per-key EWMA: on an
  * in-order stream split across micro-batches (state carried between
  * them), the final per-user snapshot must equal a single sequential
  * fold over the sorted event log — bit-equal doubles, since both
  * paths run the identical α·x + (1−α)·e recursion in the same
  * order.
  */
class StreamingEwmaSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val Alpha = 0.25

  private def truth(): Map[Long, (Long, Long, Double)] = {
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    rows.groupBy(_._1).map { case (uid, evs) =>
      var e = 0.0; var n = 0L; var lastTs = Long.MinValue
      evs.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, x) =>
        e = if (n == 0L) x else Alpha * x + (1.0 - Alpha) * e
        n += 1
        lastTs = math.max(lastTs, ts)
      }
      uid -> ((n, lastTs, e))
    }
  }

  test("final snapshots equal the sequential fold across micro-batches") {
    val batch = Tables.events(spark, sfDir)
      .select("ts", "user_id", "event_type", "value", "event_id")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ewma-stream").toString
    val ts50 = batch.selectExpr("percentile(unix_micros(ts), 0.5)")
      .head().getDouble(0).toLong
    val parts = Seq(
      batch.filter(unix_micros(col("ts")) <= ts50),
      batch.filter(unix_micros(col("ts")) > ts50))
    parts.zipWithIndex.foreach { case (p, i) =>
      p.coalesce(1).write.mode("overwrite").parquet(s"$dir/p$i")
      Thread.sleep(1100) // distinct mtimes → in-order pickup
    }
    val stream = spark.readStream.format("parquet")
      .schema(batch.schema)
      .option("maxFilesPerTrigger", 1)
      .load(s"$dir/p*")
    val q = StatefulOps.ewmaPerKey(spark, stream, Alpha)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // update-mode memory sink keeps every emitted snapshot; the LAST
    // row per user (max n_events) is the final state
    val got = spark.table("ewma_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
      .map { case (uid, rs) =>
        val last = rs.maxBy(_._2)
        uid -> ((last._2, last._3, last._4))
      }
    val want = truth()
    want should not be empty
    got shouldBe want
  }
}
