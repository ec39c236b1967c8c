package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class BandedRangeJoinSpec extends AnyFlatSpec with Matchers
    with SparkFixture {

  behavior of "BandedRangeJoin"

  private def nums(name: String, vals: Seq[Long]) = {
    val s = spark
    import s.implicits._
    vals.toDF(name)
  }

  it should "match the naive range-join result exactly" in {
    val l = nums("lk", Seq(1L, 5L, 17L, 40L, 41L, 99L))
    val r = nums("rk", Seq(3L, 6L, 20L, 41L, 55L, 100L))
    val banded = BandedRangeJoin.joinWithinGap(l, r, "lk", "rk", 10L)
      .select("lk", "rk").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    val naive = l.crossJoin(r)
      .filter(col("rk") >= col("lk") && col("rk") - col("lk") <= 10)
      .select("lk", "rk").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    banded shouldBe naive
    naive should contain((1L, 3L))   // same block
    naive should contain((17L, 20L)) // crosses a block boundary
    naive should not contain ((5L, 20L)) // gap 15 > 10
  }

  it should "reject inputs that already carry the reserved __blk " +
      "column" in {
    val l = nums("lk", Seq(1L)).withColumn("__blk", lit(0L))
    val r = nums("rk", Seq(1L))
    an[IllegalArgumentException] should be thrownBy
      BandedRangeJoin.joinWithinGap(l, r, "lk", "rk", 10L)
    an[IllegalArgumentException] should be thrownBy
      BandedRangeJoin.joinWithinGap(r, l, "rk", "lk", 10L)
  }

  it should "produce no duplicate pairs" in {
    val l = nums("lk", (1L to 50L))
    val r = nums("rk", (1L to 50L))
    val joined = BandedRangeJoin.joinWithinGap(l, r, "lk", "rk", 7L)
      .select("lk", "rk").collect().map(x => (x.getLong(0), x.getLong(1)))
    joined.length shouldBe joined.toSet.size
  }

  it should "equal the naive range join for random keys and gaps" in {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val cases = for {
      gap <- Gen.choose(1L, 30L)
      lks <- Gen.listOfN(40, Gen.choose(-100L, 100L))
      rks <- Gen.listOfN(40, Gen.choose(-100L, 100L))
    } yield (gap, lks, rks)
    val prop = Prop.forAll(cases) { case (gap, lks, rks) =>
      val l = lks.toDF("lk")
      val r = rks.toDF("rk")
      val banded = BandedRangeJoin.joinWithinGap(l, r, "lk", "rk", gap)
        .select("lk", "rk").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val naive = (for {
        a <- lks; b <- rks if b >= a && b - a <= gap
      } yield (a, b)).sorted
      banded == naive
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
      .passed shouldBe true
  }

  it should "match pairs exactly for keys above 2^53 (nanosecond epochs)" in {
    // Double's 53-bit mantissa can't represent these keys: a blocking
    // scheme computed via floating floor(c / gap) mis-blocks them and
    // silently drops qualifying pairs. The integral-div form must not.
    val base = Long.MaxValue - 1000L
    val lks = Seq(base, base + 3, base + 500, base + 995)
    val rks = Seq(base + 1, base + 9, base + 505, base + 999)
    val banded = BandedRangeJoin
      .joinWithinGap(nums("lk", lks), nums("rk", rks), "lk", "rk", 7L)
      .select("lk", "rk").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    val naive = (for {
      a <- lks; b <- rks if b >= a && b - a <= 7L
    } yield (a, b)).toSet
    banded shouldBe naive
    naive should contain((base, base + 1))
    naive should contain((base + 500, base + 505))
  }

  it should "equal the naive range join for random keys near Long.MaxValue" in {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val hi = Long.MaxValue - (1L << 20)
    val cases = for {
      gap <- Gen.choose(1L, 1000L)
      lks <- Gen.listOfN(30, Gen.choose(hi, hi + 5000L))
      rks <- Gen.listOfN(30, Gen.choose(hi, hi + 5000L))
    } yield (gap, lks, rks)
    val prop = Prop.forAll(cases) { case (gap, lks, rks) =>
      val banded = BandedRangeJoin
        .joinWithinGap(lks.toDF("lk"), rks.toDF("rk"), "lk", "rk", gap)
        .select("lk", "rk").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val naive = (for {
        a <- lks; b <- rks if b >= a && b - a <= gap
      } yield (a, b)).sorted
      banded == naive
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
      .passed shouldBe true
  }

  it should "plan as a hash join, not a nested loop" in {
    // parquet-backed input so nothing constant-folds away
    val dir = java.nio.file.Files.createTempDirectory("brj").toString
    nums("lk", (1L to 1000L)).write.mode("overwrite").parquet(dir)
    val l = spark.read.parquet(dir)
    val r = spark.read.parquet(dir).withColumnRenamed("lk", "rk")
    val plan = BandedRangeJoin.joinWithinGap(l, r, "lk", "rk", 10L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
