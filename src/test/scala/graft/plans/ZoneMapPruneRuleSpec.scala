package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Plan contract for the automatic zone-map pruning rule: on a
  * FILE-backed zfile-partitioned table (a LocalRelation would
  * constant-fold the filter away before the rule sees it — the DPP
  * spec gotcha), a range predicate on a registered clustered column
  * must inject a zfile partition filter into the scan, never change
  * results, and refuse to fire on unregistered predicates.
  */
class ZoneMapPruneRuleSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private lazy val dir = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("graft-zmap").toString + "/t"
    // 8 files × 100 rows; k is perfectly clustered by file (zone
    // [f*100, f*100+99]); u is uniform noise (useless zones)
    (0 until 800)
      .map(i => (i.toLong, (i % 8).toLong, (i * 37 % 100).toLong))
      .toDF("k", "zf", "u")
      .withColumn("k", col("zf") * 100 + col("k") % 100)
      .select(col("k"), col("u"), col("zf").as("zfile"))
      .write.partitionBy("zfile").parquet(d)
    d
  }

  private def table = spark.read.parquet(dir)

  private def withRule[T](body: => T): T = {
    val s = spark
    if (!s.experimental.extraOptimizations.contains(ZoneMapPruneRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ ZoneMapPruneRule
    try body finally ZoneMapPruneRule.clear()
  }

  test("range predicate on the clustered column injects a zfile " +
      "partition filter and preserves results") {
    withRule {
      val t = table
      ZoneMapPruneRule.register(t, "zfile", Seq("k"))
      val q = t.filter(col("k") >= 250 && col("k") <= 420)
        .select("k", "u")
      val rows = q.collect()
      // ground truth from an unregistered, rule-free read
      ZoneMapPruneRule.clear()
      val want = table.filter(col("k") >= 250 && col("k") <= 420)
        .select("k", "u").collect()
      rows.map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe
        want.map(r => (r.getLong(0), r.getLong(1))).sorted
      // the scan carries the injected partition filter: files 2..4
      val plan = q.queryExecution.executedPlan.toString
      plan should include("PartitionFilters")
      plan should include("zfile")
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.partitionCount
        }
      scanned shouldBe Some(3)
    }
  }

  test("strict bounds tighten by one: k > 299 skips file 2") {
    withRule {
      val t = table
      val e = ZoneMapPruneRule.register(t, "zfile", Seq("k"))
      // decision function: (299, 420] should survive files 3..4 only
      ZoneMapPruneRule.survivors(e,
        Map("k" -> (Some(300L), Some(420L)))) shouldBe Seq(3L, 4L)
      val q = t.filter(col("k") > 299 && col("k") < 421)
      val want = {
        ZoneMapPruneRule.clear()
        val n = spark.read.parquet(dir)
          .filter(col("k") > 299 && col("k") < 421).count()
        ZoneMapPruneRule.register(t, "zfile", Seq("k"))
        n
      }
      q.count() shouldBe want
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.partitionCount
        }
      scanned shouldBe Some(2)
    }
  }

  test("IN-list predicates prune by the list hull") {
    withRule {
      val t = table
      val e = ZoneMapPruneRule.register(t, "zfile", Seq("k"))
      // hull [110, 315] -> files 1..3
      ZoneMapPruneRule.survivors(e,
        Map("k" -> (Some(110L), Some(315L)))) shouldBe Seq(1L, 2L, 3L)
      val q = t.filter(col("k").isin(110L, 315L, 220L))
      val want = {
        ZoneMapPruneRule.clear()
        val n = spark.read.parquet(dir)
          .filter(col("k").isin(110L, 315L, 220L)).count()
        ZoneMapPruneRule.register(t, "zfile", Seq("k"))
        n
      }
      q.count() shouldBe want
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.partitionCount
        }
      scanned shouldBe Some(3)
    }
  }

  test("refuses to fire on unclustered or unregistered predicates") {
    withRule {
      val t = table
      ZoneMapPruneRule.register(t, "zfile", Seq("k"))
      // u is not a clustered column -> full scan, full result
      val q = t.filter(col("u") < 50)
      val plan = q.queryExecution.optimizedPlan.toString
      plan should not include "zfile IN"
      val unreg = spark.read.parquet(dir).filter(col("u") < 50)
      q.count() shouldBe unreg.count()
      // an unregistered table with a k predicate is untouched too
      ZoneMapPruneRule.clear()
      val q2 = spark.read.parquet(dir).filter(col("k") >= 250)
      val scanned = q2.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.partitionCount
        }
      scanned shouldBe Some(8)
    }
  }
}
