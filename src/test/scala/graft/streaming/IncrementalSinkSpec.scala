package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class IncrementalSinkSpec extends AnyFlatSpec with Matchers
    with SparkFixture {

  behavior of "IncrementalSink"

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  it should "upsert micro-batches into a keyed snapshot (AvailableNow)" in {
    val s = spark
    import s.implicits._
    val src = tmpDir("inc-src")
    val target = tmpDir("inc-target") + "/snapshot"
    val ckpt = tmpDir("inc-ckpt")

    Seq((1L, 1L, "a1"), (2L, 1L, "b1"))
      .toDF("id", "version", "value")
      .write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    val stream = EventStream.fileStream(spark, src, schema)
    IncrementalSink
      .runAvailableNow(spark, stream, target, ckpt, "id", "version")
      .awaitTermination()

    val snap1 = spark.read.parquet(target)
      .orderBy("id").as[(Long, Long, String)].collect()
    snap1 shouldBe Array((1L, 1L, "a1"), (2L, 1L, "b1"))

    // Second wave: update id=1 (newer version), stale copy of id=2
    // (older must lose), and a new id=3. A fresh AvailableNow run over
    // the same checkpoint processes ONLY the new file.
    Seq((1L, 2L, "a2"), (2L, 0L, "stale"), (3L, 1L, "c1"))
      .toDF("id", "version", "value")
      .write.mode("append").parquet(src)

    IncrementalSink
      .runAvailableNow(spark,
        EventStream.fileStream(spark, src, schema), target, ckpt,
        "id", "version")
      .awaitTermination()

    val snap2 = spark.read.parquet(target)
      .orderBy("id").as[(Long, Long, String)].collect()
    snap2 shouldBe Array((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1"))
  }

  it should "validate the batch in-flight during the upsert (observed " +
      "metrics ride the merge write — one scan for load AND checks)" in {
    val s = spark
    import s.implicits._
    import graft.check._
    val target = tmpDir("inc-obs") + "/snapshot"
    val batch = Seq((1L, 1L, "ok"), (2L, 1L, null.asInstanceOf[String]))
      .toDF("id", "version", "value")
    val suite: Seq[Check] = Seq(NotNull("value"), Unique(Seq("id")))
    val (instrumented, obs) = CheckRunner.observed(batch, suite)
    IncrementalSink.upsertParquet(spark, instrumented, target,
      "id", "version")
    val results = CheckRunner.observedResults(obs, suite)
    results.map(r => r.check -> r.violations).toMap shouldBe
      Map("notnull_value" -> 1L, "unique_id" -> 0L)
    // the upsert itself still happened
    spark.read.parquet(target).count() shouldBe 2L
  }

  it should "recover a snapshot demoted to __old by a crashed swap" in {
    // The swap demotes target -> __old, promotes __next -> target,
    // then drops __old. A crash between demote and promote leaves only
    // the backup; the next upsert (the checkpointed stream re-delivers
    // the batch that died) must restore it and proceed — data is never
    // unrecoverable at any crash point.
    val s = spark
    import s.implicits._
    val target = tmpDir("inc-crash") + "/snapshot"
    IncrementalSink.upsertParquet(spark,
      Seq((1L, 1L, "a")).toDF("id", "version", "value"),
      target, "id", "version")
    val tp = new org.apache.hadoop.fs.Path(target)
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: snapshot demoted, promotion never ran
    // (plus a stale half-written __next lying around)
    fs.rename(tp, new org.apache.hadoop.fs.Path(target + "__old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(target + "__next"))
    fs.exists(tp) shouldBe false
    IncrementalSink.upsertParquet(spark,
      Seq((2L, 1L, "b")).toDF("id", "version", "value"),
      target, "id", "version")
    val snap = spark.read.parquet(target)
      .orderBy("id").as[(Long, Long, String)].collect()
    snap shouldBe Array((1L, 1L, "a"), (2L, 1L, "b"))
    // a completed upsert leaves no backup or temp dirs behind
    fs.exists(new org.apache.hadoop.fs.Path(target + "__old")) shouldBe
      false
    fs.exists(new org.apache.hadoop.fs.Path(target + "__next")) shouldBe
      false
  }

  it should "be idempotent when the same batch is re-applied" in {
    val s = spark
    import s.implicits._
    val target = tmpDir("inc-idem") + "/snapshot"
    val batch = Seq((1L, 5L, "x"), (2L, 3L, "y"))
      .toDF("id", "version", "value")
    IncrementalSink.upsertParquet(spark, batch, target, "id", "version")
    IncrementalSink.upsertParquet(spark, batch, target, "id", "version")
    val snap = spark.read.parquet(target)
      .orderBy("id").as[(Long, Long, String)].collect()
    snap shouldBe Array((1L, 5L, "x"), (2L, 3L, "y"))
  }
}
