package graft.plans

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The materialized-summary rewrite: matching aggregates must READ
  * THE SUMMARY (plan-asserted) and return exactly the fact-scan
  * answer; non-decomposable or unsafe shapes must be left untouched.
  */
class SummaryRewriteSpec extends AnyFunSuite with SparkFixture
    with Matchers with BeforeAndAfterEach {

  private val sfDir = "/root/testdata/sf0.001"
  private def fact: DataFrame = Tables.lineitem(spark, sfDir)

  private lazy val summaryPath = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-summary").toString
    fact.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_linenumber")).as("sum_ln"),
        min(col("l_shipdate")).as("min_sd"),
        max(col("l_shipdate")).as("max_sd"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def installRule(): Unit = {
    if (!spark.experimental.extraOptimizations
        .contains(SummaryRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewriteRule
    SummaryRewriteRule.clear()
    SummaryRewriteRule.register(fact,
      spark.read.parquet(summaryPath),
      keys = Seq("l_returnflag", "l_linestatus"),
      partials = Map(
        ("count", "*") -> "n_rows",
        ("sum", "l_linenumber") -> "sum_ln",
        ("min", "l_shipdate") -> "min_sd",
        ("max", "l_shipdate") -> "max_sd"))
  }

  override def afterEach(): Unit = {
    SummaryRewriteRule.clear()
    super.afterEach()
  }

  private def readsSummary(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation =>
          h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.exists(_.contains(
      new java.io.File(summaryPath).getName))

  test("subset-grouped aggregate reads the summary and matches the " +
      "fact answer") {
    installRule()
    val q = fact.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"),
        min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))
    readsSummary(q) shouldBe true

    SummaryRewriteRule.clear() // direct answer without the rule
    val direct = fact.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"),
        min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    installRule()
    val got = q.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    got shouldBe direct
  }

  test("full-key grouping rewrites too (partials pass through one " +
      "group each)") {
    installRule()
    val q = fact.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_linenumber")).as("s"))
    readsSummary(q) shouldBe true
    SummaryRewriteRule.clear()
    val direct = fact.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_linenumber")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    installRule()
    q.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap shouldBe direct
  }

  test("a DOUBLE sum never rewrites (re-aggregation reorders float " +
      "addition)") {
    installRule()
    val q = fact.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"))
    readsSummary(q) shouldBe false
  }

  test("grouping outside the summary keys never rewrites") {
    installRule()
    val q = fact.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"))
    readsSummary(q) shouldBe false
  }

  test("an unmapped aggregate never rewrites") {
    installRule()
    val q = fact.groupBy("l_returnflag")
      .agg(sum(col("l_partkey")).as("s")) // no ("sum","l_partkey") partial
    readsSummary(q) shouldBe false
  }

  test("distinct aggregates never rewrite (not decomposable)") {
    installRule()
    val q = fact.groupBy("l_returnflag")
      .agg(countDistinct(col("l_linenumber")).as("nd"))
    readsSummary(q) shouldBe false
  }

  test("COUNT of a null literal is not treated as COUNT(*)") {
    installRule()
    val q = fact.groupBy("l_returnflag")
      .agg(count(lit(null)).as("n"))
    readsSummary(q) shouldBe false
    q.collect().map(_.getLong(1)).toSet shouldBe Set(0L)
  }

  test("randomized shapes: rewritten results equal the fact-scan " +
      "answers exactly") {
    // random grouping subsets × aggregate combinations: whatever the
    // rule decides (rewrite or leave), the answer must be the
    // fact-scan answer — run each shape with the catalog registered,
    // then cleared, and compare row sets
    val rnd = new scala.util.Random(11)
    val groupings = Seq(Seq("l_returnflag"), Seq("l_linestatus"),
      Seq("l_returnflag", "l_linestatus"))
    val aggPool = Seq(
      () => count(lit(1)).as("a_cnt"),
      () => sum(col("l_linenumber")).as("a_sum"),
      () => min(col("l_shipdate")).as("a_min"),
      () => max(col("l_shipdate")).as("a_max"))
    (1 to 6).foreach { i =>
      val g = groupings(rnd.nextInt(groupings.size))
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
        .map(_.apply())
      def run() = fact.groupBy(g.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .collect().map(_.toSeq).toSet
      installRule()
      val withRule = run()
      SummaryRewriteRule.clear()
      val direct = run()
      withClue(s"shape $i (group=$g, ${aggs.size} aggs):") {
        withRule shouldBe direct
      }
    }
  }

  test("ungrouped COUNT over an empty fact still returns 0 through " +
      "the rewrite") {
    val emptyFact = fact.filter(col("l_orderkey") < 0)
    val emptyPath = java.nio.file.Files
      .createTempDirectory("graft-summary-empty").toString
    emptyFact.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(emptyPath)
    if (!spark.experimental.extraOptimizations
        .contains(SummaryRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewriteRule
    SummaryRewriteRule.clear()
    SummaryRewriteRule.register(emptyFact,
      spark.read.parquet(emptyPath),
      keys = Seq("l_returnflag", "l_linestatus"),
      partials = Map(("count", "*") -> "n_rows"))
    val q = emptyFact.agg(count(lit(1)).as("n"))
    q.collect().map(_.getLong(0)).toSeq shouldBe Seq(0L)
  }
}
