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
}
