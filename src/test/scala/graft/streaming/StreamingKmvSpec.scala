package graft.streaming

import graft.{SparkFixture, Tables}
import graft.operators.KmvSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** KMV is mergeable and order-insensitive ("k smallest distinct of a
  * union" is associative), so the streaming keyed-state build must
  * land on exactly the batch sketch — the KMV counterpart of the
  * streaming CMS and sharded Space-Saving witnesses. Verifies both
  * the raw hash samples and the derived distinct estimates.
  */
class StreamingKmvSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 16

  test("streaming KMV state converges to the batch sketch exactly") {
    val batch = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kmv-stream").toString
    // one file -> one AvailableNow micro-batch -> the memory sink
    // holds exactly one (final) row per group
    batch.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = EventStream.fileStream(spark, dir, batch.schema)
    val q = StatefulOps
      .streamingKmv(spark, stream, "event_type", "user_id", K)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("kmv_stream").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val want = KmvSketch.build(batch, "event_type", "user_id", K)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).sorted.toVector }
    got shouldBe want

    // derived distinct estimates agree too (serve from the streamed
    // state by exploding it back into sketch rows)
    val streamedSketch = spark.table("kmv_stream")
      .select(col("group").as("event_type"),
        explode(col("hashes")).as("hv"))
    val estStream = KmvSketch.estimate(streamedSketch, "event_type", K)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val estBatch = KmvSketch
      .estimate(KmvSketch.build(batch, "event_type", "user_id", K),
        "event_type", K)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    estStream shouldBe estBatch
  }
}
