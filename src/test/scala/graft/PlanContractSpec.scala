package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical-plan contracts: the plan shapes the 100 TB design relies
  * on, asserted so a refactor that silently degrades one (a broadcast
  * that becomes a shuffle, a filter that stops reaching the scan, a
  * candidate join that degenerates to a cartesian product) fails CI
  * instead of only showing up at scale.
  */
class PlanContractSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.allQueries.find(_.name == name).get
      .run(spark, sfDir).queryExecution.executedPlan.toString

  test("q07 star join: dims broadcast, date filter pushed to the scan") {
    val p = plan("q07_join_agg")
    p should include("BroadcastHashJoin")
    p should include("PushedFilters")
    p should include("o_orderdate")
  }

  test("q11 top-k plans as TakeOrderedAndProject (per-partition heaps)") {
    plan("q11_topk") should include("TakeOrderedAndProject")
  }

  test("near-dup candidate joins never degenerate to all-pairs") {
    Seq("q31_ngram_jaccard", "q32_minhash_lsh", "q44_embed_neardup",
      "q56_simhash_neardup", "q115_containment", "q85_contamination",
      "q179_prefix_filter_jaccard", "q208_winnow_candidates",
      "q210_pipeline_funnel")
      .foreach { q =>
        val p = plan(q)
        withClue(s"$q plan:") {
          p should not include "CartesianProduct"
          p should not include "BroadcastNestedLoopJoin"
        }
      }
  }

  test("q103 five-way star: all dims broadcast, ship-date pushed down") {
    val p = plan("q103_volume_shipping")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should include("l_shipdate")
  }

  test("decorrelated subqueries plan as hash joins, never nested loops") {
    Seq("q118_large_orders", "q119_sales_opportunity",
      "q131_cust_distribution", "q134_supplier_cnt",
      "q135_waiting_supplier").foreach { q =>
      val p = plan(q)
      withClue(s"$q plan:") {
        p should not include "CartesianProduct"
        p should (include("BroadcastHashJoin") or
          include("SortMergeJoin") or include("ShuffledHashJoin"))
      }
    }
  }

  test("q126 fuzzy blocking is an equi join, not a nested loop") {
    val p = plan("q126_fuzzy_match")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year",
        org.apache.spark.sql.functions.year(
          org.apache.spark.sql.functions.col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("o_year") === 1997)
    val formatted = scan.queryExecution.executedPlan.toString
    // the partition predicate must prune directories, not filter rows
    formatted should include("PartitionFilters")
    formatted should include("o_year")
    scan.count() should be > 0L
  }

  test("q01 projection/filter reach the parquet scan") {
    val p = plan("q01_scan_filter_project")
    p should include("PushedFilters")
    // column pruning: the scan must not read the full lineitem schema
    p should not include "l_tax"
  }

  test("bloom anti join: both fact scans pushed-down/pruned, join only " +
      "on the candidate branch") {
    import org.apache.spark.sql.functions.col
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val dim = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
    val q = graft.operators.BloomJoin.antiJoinPruned(
      fact, dim, "l_orderkey", "o_orderkey")
    // AQE wraps the tree in AdaptiveSparkPlanExec, whose collect()
    // doesn't descend — unwrap to the current physical plan
    val exec = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = exec.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.toString.contains("lineitem") => s
    }
    // the documented two-scan trade: exactly two fact scans…
    scans.length shouldBe 2
    scans.foreach { s =>
      val str = s.toString
      withClue(str) {
        // …each carrying the pushed predicate and the pruned schema
        str should include("PushedFilters")
        str should include("l_quantity")
        str should not include "l_tax"
        str should not include "l_comment"
      }
    }
    // and exactly one join, on the candidate branch only
    val joins = exec.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    joins.length shouldBe 1
    joins.head.toString should include("LeftAnti")
    q.count() should be > 0L
  }

  test("q57 snowflake dims broadcast; no shuffle on the dim side") {
    val p = plan("q57_local_supplier_volume")
    p should include("BroadcastHashJoin")
    p should include("r_name")
  }

  test("q177 checksum: XOR folds map-side (partial_bit_xor before the " +
      "exchange), only O(buckets) rows shuffle") {
    val p = plan("q177_snapshot_checksum_diff")
    // partial aggregation must run before the exchange — at 100 TB the
    // shuffle carries 64 (bucket, count, xor) rows per side, not rows
    p should include("partial_bit_xor")
    p should not include "CartesianProduct"
  }

  test("join on a partition column triggers dynamic partition pruning") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val s = spark
    import s.implicits._
    // the dim must be FILE-backed: on a LocalRelation the selective
    // filter constant-folds away and the DPP rule sees no predicate
    val dimDir = java.nio.file.Files.createTempDirectory("dppdim").toString
    Seq(("1-URGENT", 1), ("2-HIGH", 0), ("3-MEDIUM", 0),
      ("4-NOT SPECIFIED", 0), ("5-LOW", 0)).toDF("prio", "flag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = fact.join(dim.filter(col("flag") === 1),
      fact("o_orderpriority") === dim("prio"))
    // the selective dim filter must reach the partitioned scan as a
    // runtime DPP subquery — at 100 TB this is the difference between
    // scanning one partition and scanning the table
    val planStr = q.queryExecution.executedPlan.toString
    planStr.toLowerCase should include("dynamicpruning")
    q.count() should be > 0L
  }

  test("BM25 probe: the query-vocab semi join pushes below the " +
      "postings aggregate") {
    // The one-pass probe contract (Bm25.scoredAll): non-query terms
    // must be dropped BEFORE the postings shuffle, i.e. the LeftSemi
    // sits under the partial aggregate, adjacent to the explode —
    // not above the finished postings table. A Catalyst upgrade that
    // stops pushing PushDownLeftSemiAntiJoin would silently turn the
    // probe into a full-index aggregation at 100 TB.
    import org.apache.spark.sql.functions.{broadcast, col, explode,
      slice, split}
    val docs = Tables.documents(spark, sfDir)
    val idx = graft.llm.Bm25.index(docs)
    val qvocab = docs.filter(col("doc_id") % 100 === 7)
      .select(explode(slice(split(col("text"), " "), 1, 3)).as("term"))
      .distinct()
    val probe = idx.postings
      .join(broadcast(qvocab), Seq("term"), "left_semi")
    val p = probe.queryExecution.executedPlan.toString
    // tree order proves the nesting (a parent prints before its
    // children): the postings aggregate must sit ABOVE the LeftSemi,
    // and the LeftSemi above the postings explode (Generate) — i.e.
    // the filter runs on exploded tokens, before the agg's shuffle
    val iAgg = p.indexOf("HashAggregate")
    val iSemi = p.indexOf("LeftSemi")
    val iGen = p.indexOf("Generate", iSemi)
    iAgg should be >= 0
    iSemi should be > iAgg
    iGen should be > iSemi
  }
}
