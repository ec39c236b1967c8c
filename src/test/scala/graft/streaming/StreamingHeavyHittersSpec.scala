package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming Space-Saving heavy hitters: exact-regime parity with the
  * batch truth across micro-batches, shard disjointness, and the
  * bounded-state guarantee that is the operator's reason to exist.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("exact regime: latest per-shard summaries union to the batch " +
      "counts and global top-10") {
    val batch = Tables.lineitem(spark, sfDir).select("l_suppkey")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shh").toString
    // several files → several micro-batches: the sketch must carry
    // state across batch boundaries, not just within one fold
    batch.repartition(4).write.mode("overwrite").parquet(dir)

    val streamed = StatefulOps.streamingHeavyHitters(spark,
      EventStream.fileStream(spark, dir, batch.schema), "l_suppkey",
      shards = 4, capacity = 1024)
    val q = streamed.toDF().writeStream.format("memory")
      .queryName("shh_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // latest summary per shard (n_items grows monotonically within a
    // shard, so max row count per shard identifies the final one —
    // instead track via row order: take the LAST emitted row per shard)
    val rows = spark.table("shh_out")
      .withColumn("__ord", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__ord").desc)
    val latest = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("shard"), explode(col("items")))
      .select(col("shard"), col("key").as("item"),
        col("value._1").as("est"), col("value._2").as("err"))
      .collect()

    // shards partition the item space: no item in two shards
    val byItem = latest.groupBy(_.getString(1))
    all(byItem.values.map(_.length)) shouldBe 1

    // exact regime: every est is the true count, every err is 0
    val expected = batch.groupBy(col("l_suppkey").cast("string")
        .as("item"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    latest.foreach { r =>
      r.getLong(3) shouldBe 0L
      r.getLong(2) shouldBe expected(r.getString(1))
    }
    latest.length shouldBe expected.size

    // global top-10 by (est desc, item) matches the batch truth
    val gotTop = latest.map(r => (r.getString(1), r.getLong(2)))
      .sortBy { case (item, est) => (-est, item) }.take(10).toSeq
    val wantTop = expected.toSeq
      .sortBy { case (item, est) => (-est, item) }.take(10)
    gotTop shouldBe wantTop
  }

  test("state stays bounded at capacity per shard below the distinct " +
      "count (approximate regime)") {
    val s = spark
    import s.implicits._
    val batch = (1 to 5000).map(i => s"item_$i").toDF("k")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shh2").toString
    batch.repartition(3).write.mode("overwrite").parquet(dir)

    val streamed = StatefulOps.streamingHeavyHitters(spark,
      EventStream.fileStream(spark, dir, batch.schema), "k",
      shards = 2, capacity = 64)
    val q = streamed.toDF().writeStream.format("memory")
      .queryName("shh_cap")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val sizes = spark.table("shh_cap")
      .select(org.apache.spark.sql.functions.size(col("items")))
      .collect().map(_.getInt(0))
    all(sizes) should be <= 64
    sizes.max should be > 0
  }
}
