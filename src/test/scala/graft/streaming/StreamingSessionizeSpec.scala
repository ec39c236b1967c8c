package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming gap+cap sessionizer ≡ the batch Sessionize operator when
  * each user's events arrive in event-time order — including across a
  * checkpointed restart, so the carried (seq, start, last) state must
  * survive and continue numbering where the first run stopped.
  */
class StreamingSessionizeSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val gapUs = 21600000000L      // 6 h
  private val capUs = 64800000000L      // 18 h

  test("assignments equal batch Sessionize across a checkpointed " +
      "restart with time-ordered arrival") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .cache()
    val midTs = ev.agg(expr("percentile(ts_us, 0.5)")).head()
      .getDouble(0).toLong

    val inDir = java.nio.file.Files
      .createTempDirectory("graft-ssz-in").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-ssz-out").toString + "/out"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ssz-ck").toString
    def runOnce(): Unit = {
      val q = StatefulOps.sessionizeGapCap(spark,
          EventStream.fileStream(spark, inDir, ev.schema),
          gapMicros = gapUs, maxLenMicros = capUs)
        .toDF().writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
    }

    // event-time-ordered arrival: every pre-median-ts event lands
    // (and is fully processed) before any post-median event exists,
    // so each user's stream is in ts order across the restart
    ev.filter(col("ts_us") <= midTs).coalesce(1)
      .write.mode("append").parquet(inDir)
    runOnce()
    ev.filter(col("ts_us") > midTs).coalesce(1)
      .write.mode("append").parquet(inDir)
    runOnce()

    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("session_seq")).toMap

    val expected = graft.operators.Sessionize.assign(
        ev, "user_id", "ts_us", "event_id",
        gapMicros = gapUs, maxLenMicros = capUs)
      .select(col("user_id"), col("event_id"), col("session_seq"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    got.size shouldBe expected.size
    got shouldBe expected
    // both split rules actually fire on this data: more sessions than
    // the trivial one-per-user, and at least one cap-forced split
    val nSessions = got.groupBy(_._1._1).values
      .map(_.values.max + 1).sum
    nSessions should be > got.keySet.map(_._1).size.toLong
  }

  test("stateTtl evicts idle users: numbering restarts at session 0") {
    val s0 = spark
    import s0.implicits._
    val schema = Seq((1L, 0L, 0L)).toDF("user_id", "ts_us", "event_id")
      .schema
    val inDir = java.nio.file.Files
      .createTempDirectory("graft-ttl-in").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-ttl-out").toString + "/out"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ttl-ck").toString
    def runOnce(expect: Long): Unit = {
      val q = StatefulOps.sessionizeGapCap(spark,
          EventStream.fileStream(spark, inDir, schema),
          gapMicros = gapUs, maxLenMicros = capUs,
          stateTtl = Some("1 milliseconds"))
        .toDF().writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      // AvailableNow + ProcessingTimeTimeout never self-terminates,
      // and processAllAvailable never returns (see StatefulOps
      // scaladoc) — poll the sink for this run's expected cumulative
      // row count, settle so the trailing timeout-only batch fires
      // the eviction, then stop explicitly
      def n(): Long = scala.util.Try(
        spark.read.parquet(outDir).count()).getOrElse(0L)
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (n() < expect && System.nanoTime() < deadline)
        Thread.sleep(500L)
      Thread.sleep(4000L)
      q.stop()
      q.awaitTermination(60000L)
    }

    // run 1: user 1 ends on session_seq 1 (one gap split) — state
    // (seq=1, ...) is checkpointed with a 1 ms processing-time TTL
    Seq((1L, 0L, 10L), (1L, gapUs + 1L, 11L))
      .toDF("user_id", "ts_us", "event_id")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(expect = 2L)
    // run 2: a batch with NO user-1 data fires user 1's expired
    // timeout — state removed, and eviction itself emits nothing
    Seq((2L, 0L, 20L)).toDF("user_id", "ts_us", "event_id")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(expect = 3L)
    // run 3: user 1 returns WITHIN the gap of their last event; with
    // carried state this would continue session 1 — after eviction
    // the user is indistinguishable from new and restarts at 0
    Seq((1L, gapUs + 2L, 12L)).toDF("user_id", "ts_us", "event_id")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(expect = 4L)

    val got = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"))).toMap
    got(10L) shouldBe (1L, 0L)
    got(11L) shouldBe (1L, 1L)
    got(20L) shouldBe (2L, 0L)   // eviction emitted no extra rows
    got(12L) shouldBe (1L, 0L)   // restarted, not continued at 1
    got.size shouldBe 4
  }
}
