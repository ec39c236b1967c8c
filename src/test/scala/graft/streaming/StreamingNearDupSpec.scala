package graft.streaming

import graft.{SparkFixture, Tables}
import graft.llm.MinHashDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming LSH near-dup gate: with id-ordered arrival (two
  * checkpointed runs, low ids before high ids — state must survive
  * the restart), the flagged set equals the batch rule "shares a
  * band bucket with a lower-id document", and flagged docs coincide
  * with the b-side of the batch candidate-pair join.
  */
class StreamingNearDupSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  private def banded(): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val numHashes = 8
    val bands = 4
    val rows = numHashes / bands
    val sigs = MinHashDedup.signatures(
      MinHashDedup.shinglesCapped(docs), numHashes)
    val bandCols = (0 until bands).map(b =>
      concat_ws("|",
        (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
    sigs.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bv")
  }

  test("flags equal the batch lower-id bucket-mate rule across a " +
      "checkpointed restart") {
    val all = banded().cache()
    val mid = all.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)

    val inDir = java.nio.file.Files
      .createTempDirectory("graft-snd-in").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-snd-out").toString + "/out"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-snd-ck").toString
    def runOnce(): Unit = {
      val q = StatefulOps.streamingNearDupFlags(spark,
          EventStream.fileStream(spark, inDir,
            all.select("doc_id", "band", "bv").schema))
        .toDF().writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
    }

    // id-ordered arrival: all low ids land (and are fully processed)
    // before any high id exists
    all.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(inDir)
    runOnce()
    all.filter(col("doc_id") > mid).coalesce(1)
      .write.mode("append").parquet(inDir)
    runOnce()

    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("first_seen"))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bv")
    val expected = all
      .withColumn("mn", min(col("doc_id")).over(w))
      .filter(col("mn") < col("doc_id"))
      .select(col("doc_id"), col("band"), col("mn"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    got shouldBe expected
    got should not be empty

    // cross-check against the batch LSH join: a document is flagged
    // iff it is the higher side of some candidate pair
    val pairs = MinHashDedup.candidatePairs(
      Tables.documents(spark, sfDir))
    val bSide = pairs.select("b_id").distinct().collect()
      .map(_.getLong(0)).toSet
    got.map(_._1) shouldBe bSide
  }

  test("stateTtl evicts idle buckets: the dedup horizon is bounded " +
      "and a late duplicate re-opens the bucket unflagged") {
    val s0 = spark
    import s0.implicits._
    val schema = Seq((1L, 0, "x")).toDF("doc_id", "band", "bv").schema
    val inDir = java.nio.file.Files
      .createTempDirectory("graft-sndttl-in").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-sndttl-out").toString + "/out"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sndttl-ck").toString
    def runOnce(expect: Long): Unit = {
      val q = StatefulOps.streamingNearDupFlags(spark,
          EventStream.fileStream(spark, inDir, schema),
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

    // run 1: docs 1 and 2 share bucket (0,"A") — 2 flagged against 1;
    // the bucket state (min id 1) carries a 1 ms TTL
    Seq((1L, 0, "A"), (2L, 0, "A")).toDF("doc_id", "band", "bv")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(expect = 1L)
    // run 2: a batch touching only another bucket fires the expired
    // timeout for (0,"A") — eviction emits nothing
    Seq((5L, 1, "B")).toDF("doc_id", "band", "bv")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(expect = 1L)
    // run 3: doc 3 lands in the expired bucket — NOT flagged (the
    // documented horizon trade-off: pre-expiry docs are forgotten);
    // doc 4 in the same batch IS flagged against the re-opened
    // representative 3, not the evicted 1
    Seq((3L, 0, "A"), (4L, 0, "A")).toDF("doc_id", "band", "bv")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce(expect = 2L)

    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_seen")))
      .toSet
    got shouldBe Set((2L, 1L), (4L, 3L))
  }
}
