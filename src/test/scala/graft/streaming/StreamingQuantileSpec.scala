package graft.streaming

import graft.{SparkFixture, Tables}
import graft.operators.QuantileSample
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bottom-k-hash quantile sample is mergeable and
  * order-insensitive ("k smallest of a union" is associative), so
  * the streaming keyed-state build must land on exactly the batch
  * sketch — the quantile counterpart of the streaming KMV/CMS
  * witnesses. Cross-batch associativity itself is pinned by
  * QuantileSampleSpec's shard-merge test; here the streamed state
  * and the estimates served from it must be bit-equal to batch.
  */
class StreamingQuantileSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 32

  test("streaming quantile-sample state converges to the batch " +
      "sketch exactly") {
    val batch = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("user_id"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-qsk-stream").toString
    batch.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = EventStream.fileStream(spark, dir, batch.schema)
    val q = StatefulOps
      .streamingQuantileSample(spark, stream, "event_type",
        "event_id", "user_id", K)
      .writeStream.format("memory").queryName("qsk_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("qsk_stream").collect()
      .map(r => r.getString(0) ->
        r.getSeq[Long](1).zip(r.getSeq[Long](2)).toVector).toMap
    val want = QuantileSample
      .build(batch, "event_type", "event_id", "user_id", K)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (g, rs) =>
        g -> rs.map(t => (t._2, t._3)).sorted.toVector
      }
    got shouldBe want

    // estimates served from the streamed state match batch exactly
    val streamedSketch = spark.table("qsk_stream")
      .select(col("group").as("event_type"),
        explode(arrays_zip(col("hv"), col("v"))).as("z"))
      .select(col("event_type"), col("z.hv").as("hv"),
        col("z.v").as("v"))
    val estOf = (sk: org.apache.spark.sql.DataFrame) =>
      QuantileSample.quantiles(sk, "event_type",
          Seq((1, 2, "p50"), (9, 10, "p90")))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    estOf(streamedSketch) shouldBe estOf(
      QuantileSample.build(batch, "event_type", "event_id",
        "user_id", K))
  }
}
