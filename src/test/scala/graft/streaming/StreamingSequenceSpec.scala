package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Batch-parity witness for the CEP-lite sequence detector: on an
  * in-order stream — including across micro-batch boundaries, with
  * the latest-A state carried between batches — the emitted
  * (user, a, b) matches must equal the scan-based truth computed
  * directly from the sorted event log.
  */
class StreamingSequenceSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val GapUs = 6L * 3600 * 1000000 // 6 hours

  private def truth(): Set[(Long, Long, Long)] = {
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"),
        (col("event_type") === "view").as("is_a"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    rows.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      var lastA: Option[(Long, Long)] = None
      evs.sortBy(e => (e._2, e._3)).toSeq.flatMap {
        case (_, ts, eid, true) =>
          if (lastA.forall(p => ts > p._1 || (ts == p._1 && eid > p._2)))
            lastA = Some((ts, eid))
          None
        case (_, ts, eid, false) =>
          lastA.collect { case (ats, aid) if ts - ats <= GapUs =>
            (uid, aid, eid)
          }
      }
    }.toSet
  }

  test("matches equal the scan truth across in-order micro-batches") {
    val batch = Tables.events(spark, sfDir)
      .select("ts", "user_id", "event_type", "value", "event_id")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-seq-stream").toString
    // three time-ordered files; maxFilesPerTrigger=1 makes each its
    // own micro-batch, so the latest-view state must carry across
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
      Thread.sleep(1100) // distinct modification times → in-order pickup
    }
    val stream = spark.readStream.format("parquet")
      .schema(batch.schema)
      .option("maxFilesPerTrigger", 1)
      .load(s"$dir/p*")
    val q = StatefulOps
      .detectSequence(spark, stream, "view", "purchase", GapUs)
      .writeStream.format("memory").queryName("seq_matches")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("seq_matches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = truth()
    want should not be empty
    got shouldBe want
  }
}
