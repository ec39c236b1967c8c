package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Eviction contracts for the `stateTtl` option on the remaining
  * stateful ops (the StreamingSessionizeSpec/StreamingNearDupSpec
  * family): a processing-time TTL bounds keyed state to the active
  * key set, and each op's documented eviction behavior — snapshot
  * re-emit (runningUserStats, cdcLatestState), open-session flush
  * (sessionizeFlat), restart-from-zero on return — actually happens.
  *
  * Timing note (probed, and documented on StatefulOps): with a
  * ProcessingTimeTimeout a Trigger.AvailableNow query keeps running
  * timeout-check batches (so a 1 ms TTL evicts within the SAME run)
  * and never self-terminates — `awaitTermination` AND
  * `processAllAvailable` both block forever. The harness therefore
  * polls the sink for the run's expected row count and stops the
  * query explicitly, and the assertions are batch-order-insensitive.
  */
class StatefulTtlSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Drain inDir through a TTL'd stream, appending each micro-batch
    * (tagged with its batch id) to outDir, stopping once the sink
    * holds `expectRows` total rows (the data batch AND the eviction
    * batch have both committed by then).
    */
  private def runOnce(mk: DataFrame => DataFrame, inDir: String,
      schema: org.apache.spark.sql.types.StructType, outDir: String,
      ckpt: String, mode: String, expectRows: Long): Unit = {
    val q = mk(EventStream.fileStream(spark, inDir, schema))
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty)
          b.withColumn("batch", lit(id))
            .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    def n(): Long = scala.util.Try(
      spark.read.parquet(outDir).count()).getOrElse(0L)
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (n() < expectRows && System.nanoTime() < deadline)
      Thread.sleep(500L)
    Thread.sleep(1500L) // let the reached batch's checkpoint commit
    q.stop()
    q.awaitTermination(60000L)
    // >= not ==: stopping between a foreachBatch write and its
    // checkpoint commit replays that batch on the next run
    // (at-least-once) — the assertions below are replay-tolerant
    n() should be >= expectRows
  }

  test("runningUserStats stateTtl: eviction re-emits the final " +
      "snapshot and the key restarts from zero") {
    val s0 = spark
    import s0.implicits._
    val schema = Seq((1L, 1.0)).toDF("user_id", "value").schema
    val inDir = tmp("graft-rusttl-in")
    val outDir = tmp("graft-rusttl-out") + "/out"
    val ckpt = tmp("graft-rusttl-ck")
    def go(expect: Long): Unit = runOnce(
      df => StatefulOps.runningUserStats(spark, df,
        stateTtl = Some("1 milliseconds")).toDF(),
      inDir, schema, outDir, ckpt, "update", expect)

    // run 1: user 1 accumulates two events; the 1 ms TTL then fires
    // in the trailing timeout batch — eviction re-emits the final
    // snapshot and removes the state
    Seq((1L, 1.0), (1L, 2.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    go(expect = 2L) // data emit + eviction re-emit
    // run 2: user 1 returns — totals restart from zero, proving the
    // state was evicted (with carried state this would be n=3)
    Seq((1L, 7.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    go(expect = 4L)

    val u1 = spark.read.parquet(outDir)
      .filter(col("user_id") === 1L).orderBy("batch").collect()
      .map(r => (r.getAs[Long]("batch"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    // the (2, 3.0) snapshot appears in >= 2 distinct batches: once
    // from the data batch, once re-emitted by the eviction
    u1.filter(r => r._2 == 2L && r._3 == 3.0)
      .map(_._1).distinct.length should be >= 2
    // after eviction the key restarted, not continued
    (u1.last._2, u1.last._3) shouldBe ((1L, 7.0))
  }

  test("sessionizeFlat stateTtl: an abandoned open session is flushed " +
      "as closed on eviction") {
    val s0 = spark
    import s0.implicits._
    val schema = Seq((1L, ts(0L))).toDF("user_id", "ts").schema
    val inDir = tmp("graft-sfttl-in")
    val outDir = tmp("graft-sfttl-out") + "/out"
    val ckpt = tmp("graft-sfttl-ck")

    // user 1 has one open session of 2 events — without a TTL this
    // session would NEVER be emitted (only sessions CLOSED by a gap
    // are); the TTL eviction flushes it as closed with true bounds
    Seq((1L, ts(0L)), (1L, ts(60L * 1000000L)))
      .toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(
      df => StatefulOps.sessionizeFlat(spark, df, gapMinutes = 5,
        stateTtl = Some("1 milliseconds")).toDF(),
      inDir, schema, outDir, ckpt, "append", expectRows = 1L)

    val u1 = spark.read.parquet(outDir)
      .filter(col("user_id") === 1L).collect()
      .map(r => (r.getAs[Long]("n_events"),
        r.getAs[java.sql.Timestamp]("start_ts"),
        r.getAs[java.sql.Timestamp]("end_ts")))
    u1.distinct.toSeq shouldBe Seq((2L, ts(0L), ts(60L * 1000000L)))
  }

  test("cdcLatestState stateTtl: eviction re-emits the final state; " +
      "post-eviction the version comparison restarts") {
    val s0 = spark
    import s0.implicits._
    val schema = Seq((1L, "update", 1.0, ts(0L), 1L))
      .toDF("user_id", "event_type", "value", "ts", "event_id").schema
    val inDir = tmp("graft-cdcttl-in")
    val outDir = tmp("graft-cdcttl-out") + "/out"
    val ckpt = tmp("graft-cdcttl-ck")
    def go(expect: Long): Unit = runOnce(
      df => StatefulOps.cdcLatestState(spark, df,
        stateTtl = Some("1 milliseconds")).toDF(),
      inDir, schema, outDir, ckpt, "update", expect)

    // run 1: two changes; the higher (ts, event_id) version wins,
    // then the TTL eviction re-emits that final state and evicts
    Seq((1L, "insert", 1.0, ts(1000000L), 10L),
        (1L, "update", 2.0, ts(2000000L), 11L))
      .toDF("user_id", "event_type", "value", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(inDir)
    go(expect = 2L) // data emit + eviction re-emit
    // run 2: a change OLDER than the pre-eviction winner — with
    // carried state it would lose; post-eviction it wins (the
    // documented TTL-vs-out-of-orderness trade)
    Seq((1L, "insert", 9.0, ts(1500000L), 12L))
      .toDF("user_id", "event_type", "value", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(inDir)
    go(expect = 4L)

    val u1 = spark.read.parquet(outDir)
      .filter(col("user_id") === 1L).orderBy("batch").collect()
      .map(r => (r.getAs[Long]("batch"), r.getAs[String]("state"),
        r.getAs[Double]("last_value"), r.getAs[Long]("n_changes")))
    // final pre-eviction state emitted from the data batch AND
    // re-emitted by the eviction
    u1.filter(r => r._2 == "update" && r._3 == 2.0 && r._4 == 2L)
      .map(_._1).distinct.length should be >= 2
    // post-eviction the older version WINS from a fresh state
    (u1.last._2, u1.last._3, u1.last._4) shouldBe (("insert", 9.0, 1L))
  }

  test("detectSequence stateTtl: an evicted pending A no longer " +
      "matches a later B") {
    val s0 = spark
    import s0.implicits._
    def row(uid: Long, eid: Long, t: Long, et: String) =
      (eid, ts(t), uid, et, 0.0)
    val mk = (df: DataFrame) => StatefulOps.detectSequence(spark, df,
      "view", "purchase", maxGapMicros = 3600L * 1000000L,
      stateTtl = Some("1 milliseconds")).toDF()
    val schema = Seq(row(1L, 1L, 0L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value").schema
    val inDir = tmp("graft-seqttl-in")
    val outDir = tmp("graft-seqttl-out") + "/out"
    val ckpt = tmp("graft-seqttl-ck")

    // run 1: user 1 leaves a pending A; user 2's complete A→B pair is
    // the commit canary (its match row is what runOnce polls for).
    // The 1 ms TTL then evicts user 1's pending A in the trailing
    // timeout batch before the query stops.
    Seq(row(1L, 10L, 0L, "view"),
      row(2L, 20L, 0L, "view"), row(2L, 21L, 1000000L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(mk, inDir, schema, outDir, ckpt, "append", expectRows = 1L)

    // run 2: user 1's B arrives WITHIN the event-time gap — with
    // carried state this would match; the eviction means it must
    // not. User 2's second pair is again the commit canary.
    Seq(row(1L, 11L, 2000000L, "purchase"),
      row(2L, 22L, 5000000L, "view"),
      row(2L, 23L, 6000000L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(mk, inDir, schema, outDir, ckpt, "append", expectRows = 2L)

    val matches = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
        r.getAs[Long]("b_event_id"))).toSet
    matches.filter(_._1 == 1L) shouldBe empty // pending A was evicted
    matches.filter(_._1 == 2L) shouldBe
      Set((2L, 20L, 21L), (2L, 22L, 23L))

    // control: same two-run split WITHOUT a TTL carries the pending A
    // across runs and the q251-rule match fires
    val inDir2 = tmp("graft-seqttl2-in")
    val outDir2 = tmp("graft-seqttl2-out") + "/out"
    val ckpt2 = tmp("graft-seqttl2-ck")
    val mkNoTtl = (df: DataFrame) => StatefulOps.detectSequence(spark,
      df, "view", "purchase", maxGapMicros = 3600L * 1000000L).toDF()
    Seq(row(1L, 10L, 0L, "view"),
      row(2L, 20L, 0L, "view"), row(2L, 21L, 1000000L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(inDir2)
    runOnce(mkNoTtl, inDir2, schema, outDir2, ckpt2, "append", 1L)
    Seq(row(1L, 11L, 2000000L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(inDir2)
    runOnce(mkNoTtl, inDir2, schema, outDir2, ckpt2, "append", 2L)
    spark.read.parquet(outDir2).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
        r.getAs[Long]("b_event_id"))).toSet should
      contain((1L, 10L, 11L))
  }
}
