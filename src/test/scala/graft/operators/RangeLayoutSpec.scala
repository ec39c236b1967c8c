package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** RangeLayout contract: balanced bucket sizes on skewed data,
  * range-disjoint buckets, deterministic cut points, and a written
  * layout whose directories are range-prunable.
  */
class RangeLayoutSpec extends AnyFlatSpec with Matchers with SparkFixture {

  // Log-skewed positive values: a uniform bucketing of the domain
  // would put ~90% of rows in the first bucket; quantile cuts must
  // not.
  private def skewed(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, math.pow(i.toDouble / n, 4) * 1000.0))
      .toDF("id", "v")
  }

  "RangeLayout.byQuantiles" should "balance bucket sizes on skewed data" in {
    val df = skewed(10000)
    val (laid, cuts) = RangeLayout.byQuantiles(df, "v", 8)
    cuts.length shouldBe 7
    val sizes = laid.groupBy("__bucket").count()
      .collect().map(_.getLong(1))
    sizes.length shouldBe 8
    val ideal = 10000.0 / 8
    all(sizes.map(_.toDouble / ideal)) should (be >= 0.8 and be <= 1.2)
  }

  it should "produce range-disjoint buckets" in {
    val (laid, cuts) = RangeLayout.byQuantiles(skewed(5000), "v", 5)
    val bounds = laid.groupBy("__bucket")
      .agg(min("v").as("lo"), max("v").as("hi"))
      .orderBy("__bucket")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    bounds.map(_._1) shouldBe (0 until 5)
    bounds.sliding(2).foreach { case Array((_, _, hi), (_, lo, _)) =>
      hi should be < lo
    }
    // Each bucket's range sits between its surrounding cuts.
    bounds.zipWithIndex.foreach { case ((_, lo, hi), i) =>
      if (i > 0) lo should be >= cuts(i - 1)
      if (i < cuts.length) hi should be < cuts(i)
    }
  }

  it should "compute identical cuts across runs (no resampling drift)" in {
    val a = RangeLayout.byQuantiles(skewed(3000), "v", 6)._2
    val b = RangeLayout.byQuantiles(skewed(3000), "v", 6)._2
    a shouldBe b
  }

  it should "reject a reserved __bucket column and k < 2" in {
    val df = skewed(10)
    an[IllegalArgumentException] should be thrownBy
      RangeLayout.byQuantiles(df.withColumn("__bucket", lit(1)), "v", 4)
    an[IllegalArgumentException] should be thrownBy
      RangeLayout.byQuantiles(df, "v", 1)
  }

  it should "write one range-disjoint directory per bucket" in {
    val dir = java.nio.file.Files
      .createTempDirectory("range-layout").toString
    val cuts = RangeLayout.writeByQuantiles(skewed(2000), "v", 4, dir)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__bucket=")).map(_.getName).sorted
    dirs shouldBe (0 until 4).map(i => s"__bucket=$i").toArray
    // Directory-level pruning: a predicate inside bucket 2's range
    // must read only that directory's rows.
    val back = spark.read.parquet(dir)
    val lo = cuts(1)
    val hi = cuts(2)
    val hit = back.filter(col("v") > lo && col("v") < hi)
      .select("__bucket").distinct().collect().map(_.getInt(0))
    hit shouldBe Array(2)
  }
}
