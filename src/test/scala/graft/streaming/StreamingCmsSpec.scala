package graft.streaming

import graft.{SparkFixture, Tables}
import graft.operators.CountMinSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The count-min sketch is MODE-AGNOSTIC by construction: build() is
  * one explode + hash-agg, which Structured Streaming maintains
  * incrementally in complete mode with no operator changes — the
  * online frequency monitor is the same code as the batch build, and
  * its cells converge to exactly the batch sketch. (This is the CMS
  * counterpart of the streaming sharded Space-Saving witness.)
  */
class StreamingCmsSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming CMS cells converge to the batch sketch exactly") {
    val batch = Tables.events(spark, sfDir).select("event_type")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cms-stream").toString
    batch.write.mode("overwrite").parquet(dir)

    val stream = EventStream.fileStream(spark, dir, batch.schema)
    val q = CountMinSketch.build(stream, "event_type", 4, 64)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = CountMinSketch.build(batch, "event_type", 4, 64)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe want

    // and the estimates served from the streamed sketch match the
    // batch-estimated counts for every observed key
    val keys = batch.distinct()
    val estStream = CountMinSketch
      .estimate(keys, spark.table("cms_stream"), "event_type", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val estBatch = CountMinSketch
      .estimate(keys, CountMinSketch.build(batch, "event_type", 4, 64),
        "event_type", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    estStream shouldBe estBatch
  }
}
