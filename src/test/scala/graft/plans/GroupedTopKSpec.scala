package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Contract of the custom GroupedTopK physical operator: identical
  * answer to the window row_number spelling on any total order, with
  * a plan that contains the partial/final exec pair, exactly one
  * exchange, and no sort.
  */
class GroupedTopKSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def sampleDf(rows: Int, groups: Int, parts: Int) = {
    import spark.implicits._
    // Deterministic pseudo-random values with deliberate ties: value
    // collides across ids, so the id tie-break is load-bearing.
    (0 until rows)
      .map(i => (s"g${i % groups}", (i * 37 % 11).toDouble, i.toLong))
      .toDF("g", "v", "id")
      .repartition(parts, col("id"))
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g")
      .orderBy(col("v").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g", "id").collect().toSeq

  "GroupedTopK" should "match the window row_number form (ties included)" in {
    val df = sampleDf(rows = 500, groups = 7, parts = 5)
    val got = GroupedTopK.of(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 4)
    sortedRows(got) shouldBe sortedRows(windowTopK(df, 4))
  }

  it should "be partition-invariant" in {
    val a = GroupedTopK.of(sampleDf(300, 5, 1), Seq("g"),
      Seq(col("v").desc, col("id").asc), 3)
    val b = GroupedTopK.of(sampleDf(300, 5, 13), Seq("g"),
      Seq(col("v").desc, col("id").asc), 3)
    sortedRows(a) shouldBe sortedRows(b)
  }

  it should "return whole groups when k exceeds the group size" in {
    val df = sampleDf(40, 4, 3)
    val got = GroupedTopK.of(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 100)
    sortedRows(got) shouldBe sortedRows(df)
  }

  it should "handle empty input and reject k <= 0" in {
    val empty = sampleDf(10, 2, 2).filter(col("id") < 0)
    GroupedTopK.of(empty, Seq("g"),
      Seq(col("v").desc, col("id").asc), 3).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      GroupedTopK(Nil, Nil, 0, empty.queryExecution.analyzed)
  }

  it should "support ascending order and multiple group columns" in {
    val df = sampleDf(200, 6, 4)
      .withColumn("g2", (col("id") % 2).cast("string"))
    val w = Window.partitionBy("g", "g2")
      .orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    val got = GroupedTopK.of(df, Seq("g", "g2"),
      Seq(col("v").asc, col("id").asc), 2)
    sortedRows(got) shouldBe sortedRows(want)
  }

  it should "plan as partial/final with one exchange and no sort" in {
    import spark.implicits._
    // No repartition here: the only exchange in the plan must be the
    // one EnsureRequirements inserts for the final exec's
    // ClusteredDistribution.
    val df = (0 until 100)
      .map(i => (s"g${i % 3}", (i * 37 % 11).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val p = GroupedTopK.of(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 3)
      .queryExecution.executedPlan.toString
    p should include("GroupedTopKPartial")
    p should include("GroupedTopKFinal")
    "Exchange".r.findAllIn(p).size shouldBe 1
    p should not include "Sort "
  }
}
