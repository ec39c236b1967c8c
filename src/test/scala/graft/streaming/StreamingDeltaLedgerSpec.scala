package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Stream ≡ batch for the delta exact-dedup ledger: draining document
  * waves through DeltaLedgerStream must produce exactly the verdicts
  * of applying deltaExactLedger wave by wave — and, because arrival
  * order extends the keep-first order, of the full keep-first rebuild
  * over everything seen.
  */
class StreamingDeltaLedgerSpec extends AnyFlatSpec with Matchers
    with SparkFixture {

  behavior of "DeltaLedgerStream"

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ledgerMap(path: String): Map[Long, String] = {
    val s = spark
    s.read.parquet(path).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("removed_by"))).toMap
  }

  it should "judge arriving waves against the accumulated store " +
      "(AvailableNow), matching the keep-first rebuild" in {
    val s = spark
    import s.implicits._
    val src = tmpDir("dls-src")
    val store = tmpDir("dls-store") + "/fps"
    val ledger = tmpDir("dls-ledger") + "/ledger"
    val ckpt = tmpDir("dls-ckpt")

    // wave 1: A kept at 0, B kept at 1, 2 duplicates A within-batch
    Seq((0L, "A"), (1L, "B"), (2L, "A")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    DeltaLedgerStream.runAvailableNow(spark,
      EventStream.fileStream(spark, src, schema), store, ledger, ckpt)
      .awaitTermination()
    ledgerMap(ledger) shouldBe Map(0L -> "kept", 1L -> "kept",
      2L -> "exact_dup_batch")

    // wave 2: 10 re-ships A (base dup), 11/12 ship C (keep-first
    // within the wave), 13 ships D — a fresh AvailableNow run over
    // the same checkpoint processes ONLY the new file
    Seq((10L, "A"), (11L, "C"), (12L, "C"), (13L, "D"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    DeltaLedgerStream.runAvailableNow(spark,
      EventStream.fileStream(spark, src, schema), store, ledger, ckpt)
      .awaitTermination()
    val got = ledgerMap(ledger)
    got shouldBe Map(0L -> "kept", 1L -> "kept",
      2L -> "exact_dup_batch", 10L -> "exact_dup_base",
      11L -> "kept", 12L -> "exact_dup_batch", 13L -> "kept")

    // invariant: streamed verdicts' kept set == full keep-first
    // rebuild over everything seen (arrival order = id order here)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    val rebuiltKept = spark.read.parquet(src)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("keep", row_number().over(w) === 1)
      .filter(col("keep")).collect()
      .map(_.getLong(0)).toSet
    got.collect { case (id, "kept") => id }.toSet shouldBe rebuiltKept

    // the store holds exactly the kept contents' fingerprints
    spark.read.parquet(store).distinct().count() shouldBe 4L // A B C D
  }

  it should "split one arrival set across micro-batches without " +
      "changing verdicts (processBatch sequential parity)" in {
    val s = spark
    import s.implicits._
    val store1 = tmpDir("dls-p1") + "/fps"
    val ledger1 = tmpDir("dls-p1") + "/ledger"
    val store2 = tmpDir("dls-p2") + "/fps"
    val ledger2 = tmpDir("dls-p2") + "/ledger"
    val docs = Seq((0L, "X"), (1L, "Y"), (2L, "X"), (3L, "Z"),
      (4L, "Y"), (5L, "W"))
    // one batch
    DeltaLedgerStream.processBatch(spark,
      docs.toDF("doc_id", "text"), store1, ledger1)
    // three batches, id order
    docs.grouped(2).foreach { wave =>
      DeltaLedgerStream.processBatch(spark,
        wave.toDF("doc_id", "text"), store2, ledger2)
    }
    val one = ledgerMap(ledger1)
    val split = ledgerMap(ledger2)
    // verdict CATEGORY may shift between dup_batch and dup_base at
    // the split boundary (the duplicate's keeper moved into the
    // base) — the kept/removed PARTITION must be identical
    one.view.mapValues(_ == "kept").toMap shouldBe
      split.view.mapValues(_ == "kept").toMap
  }
}
