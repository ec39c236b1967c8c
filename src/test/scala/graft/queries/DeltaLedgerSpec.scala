package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q321's keep-first invariant, witnessed against an actual rebuild:
  * because the base/batch split is a doc_id PREFIX, judging the batch
  * against the frozen base store must equal the full keep-first
  * exact-dedup rebuilt from scratch, restricted to batch rows — the
  * property that makes the incremental ledger SAFE to ship (no
  * shipped decision is ever contradicted by a later batch).
  */
class DeltaLedgerSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("frozen-base delta judgment equals the full keep-first " +
      "rebuild restricted to the batch") {
    val docs = graft.Tables.documents(spark, sfDir)
    val thr = docs
      .agg(expr("CAST(max(doc_id) * 4 DIV 5 AS BIGINT)"))
      .collect()(0).getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    val full = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("keep", row_number().over(w) === 1)
    val batchIds = full.filter(col("doc_id") >= thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rebuiltKept = full
      .filter(col("doc_id") >= thr && col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val delta = graft.SparkEntry.allQueries
      .find(_.name == "q321_delta_exact_ledger").get
      .run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // one row per batch doc, none below the prefix threshold
    delta.keySet shouldBe batchIds
    all(delta.keySet) should be >= thr
    // the invariant: delta-kept == rebuild-kept ∩ batch
    delta.collect { case (id, "kept") => id }.toSet shouldBe rebuiltKept
  }

  test("deltaExactLedger exercises every branch on planted " +
      "duplicates and matches the keep-first rebuild") {
    // the testdata corpus has no full-text duplicates, so the dup
    // branches are pinned here on a synthetic frame: base keeps
    // contents A, B; batch re-ships A (dup_base), ships C twice
    // (keep-first within batch), and D once (kept)
    val s = spark
    import s.implicits._
    val all = Seq(
      (0L, "A"), (1L, "B"), (2L, "A"), // base: A kept at 0, B at 1,
      //                                  2 is a base-internal dup
      (10L, "A"), (11L, "C"), (12L, "C"), (13L, "D"))
      .toDF("doc_id", "text")
    val baseFps = all.filter(col("doc_id") < 10L)
      .select(md5(col("text")).as("fp")).distinct()
    val batch = all.filter(col("doc_id") >= 10L)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val got = graft.llm.DedupClusters.deltaExactLedger(baseFps, batch)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(10L -> "exact_dup_base", 11L -> "kept",
      12L -> "exact_dup_batch", 13L -> "kept")
    // invariant against the full keep-first rebuild (prefix split)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    val rebuiltKept = all
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("keep", row_number().over(w) === 1)
      .filter(col("doc_id") >= 10L && col("keep"))
      .collect().map(_.getLong(0)).toSet
    got.collect { case (id, "kept") => id }.toSet shouldBe rebuiltKept
  }
}
