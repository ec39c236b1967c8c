package graft.streaming

import graft.SparkFixture
import graft.operators.VersionedStore
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Exactly-once witness for the streaming store sink: arriving waves
  * land as atomic commits, a crash-replay of a committed batch is a
  * no-op, and the store's version history is the batch arrival
  * order — so time travel reproduces the corpus as of any batch.
  */
class VersionedStoreSinkSpec extends AnyFlatSpec with Matchers
    with SparkFixture {

  behavior of "VersionedStoreSink"

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ids(path: String): Seq[Long] =
    VersionedStore.read(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  it should "commit each arriving wave exactly once, surviving a " +
      "crash-replay of a committed batch" in {
    val s = spark
    import s.implicits._
    val src = tmpDir("vss-src")
    val store = tmpDir("vss-store") + "/store"
    val ckpt = tmpDir("vss-ckpt")
    VersionedStore.create(spark, store)

    // wave 1
    Seq((0L, "A"), (1L, "B")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    VersionedStoreSink.runAvailableNow(
      EventStream.fileStream(spark, src, schema), store, ckpt,
      statsCol = Some("doc_id")).awaitTermination()
    ids(store) shouldBe Seq(0L, 1L)
    val v1 = VersionedStore.latestVersion(spark, store)

    // crash-replay: the same micro-batch re-delivered under its
    // committed batch id (what foreachBatch does after a crash
    // between sink write and checkpoint commit) must be a no-op
    VersionedStore.appendIdempotent(
      Seq((0L, "A"), (1L, "B")).toDF("doc_id", "text"), store,
      txn = 0L, statsCol = Some("doc_id")) shouldBe v1
    ids(store) shouldBe Seq(0L, 1L)
    VersionedStore.latestVersion(spark, store) shouldBe v1

    // wave 2: a fresh AvailableNow run over the same checkpoint
    // processes ONLY the new file and commits it as the next version
    Seq((2L, "C"), (3L, "D")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    VersionedStoreSink.runAvailableNow(
      EventStream.fileStream(spark, src, schema), store, ckpt,
      statsCol = Some("doc_id")).awaitTermination()
    ids(store) shouldBe Seq(0L, 1L, 2L, 3L)

    // each wave is one retained version: time travel reproduces the
    // store as of wave 1
    VersionedStore.readAt(spark, store, v1)
      .select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(0L, 1L)

    // the statted waves keep key-range pruning armed store-wide
    VersionedStore.storeStatsCol(spark, store) shouldBe Some("doc_id")
  }

  it should "maintain a rollup exactly-once alongside the store " +
      "(runAvailableNowWithRollup)" in {
    import graft.operators.IncrementalAgg
    val s = spark
    import s.implicits._
    val src = tmpDir("vsr-src")
    val store = tmpDir("vsr-store") + "/store"
    val snap = tmpDir("vsr-snap") + "/snap"
    val ckpt = tmpDir("vsr-ckpt")
    VersionedStore.create(spark, store)
    VersionedStore.create(spark, snap)

    def fullAgg(): Map[String, (Long, Long)] =
      IncrementalAgg.aggregate(VersionedStore.read(spark, store),
        Seq("grp"), Seq("v")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    def snapAgg(): Map[String, (Long, Long)] =
      IncrementalAgg.read(spark, snap).collect()
        .map(r => r.getString(r.fieldIndex("grp")) ->
          (r.getLong(r.fieldIndex("n")),
            r.getLong(r.fieldIndex("v")))).toMap

    Seq((0L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L))
      .toDF("doc_id", "grp", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    VersionedStoreSink.runAvailableNowWithRollup(
      EventStream.fileStream(spark, src, schema), store, snap, ckpt,
      Seq("grp"), Seq("v")).awaitTermination()
    snapAgg() shouldBe fullAgg()
    snapAgg() shouldBe Map("a" -> (2L, 15L), "b" -> (1L, 20L))

    // crash-replay of the committed batch: both halves are no-ops
    val v1 = VersionedStore.latestVersion(spark, store)
    VersionedStore.appendIdempotent(
      Seq((0L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L))
        .toDF("doc_id", "grp", "v"), store, txn = 0L) shouldBe v1
    IncrementalAgg.advance(spark, store, snap, v1 - 1, v1,
      Seq("grp"), Seq("v"), txn = 0L)
    snapAgg() shouldBe fullAgg()

    // second wave keeps the pair in lockstep
    Seq((3L, "b", 7L), (4L, "c", 1L))
      .toDF("doc_id", "grp", "v").write.mode("append").parquet(src)
    VersionedStoreSink.runAvailableNowWithRollup(
      EventStream.fileStream(spark, src, schema), store, snap, ckpt,
      Seq("grp"), Seq("v")).awaitTermination()
    snapAgg() shouldBe fullAgg()
    snapAgg()("c") shouldBe (1L, 1L)
  }
}
