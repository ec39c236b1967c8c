package graft.ingest

import java.time.LocalDate

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PartitionerSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("reference example: 2022-05-12 → 2022/may/12/ (partitioner.py:12-22)") {
    Partitioner.suffix(LocalDate.of(2022, 5, 12)) shouldBe "2022/may/12/"
  }

  test("property: any date → <year>/<lowercase month name>/<day>/") {
    val dates = Gen.choose(0L, 365L * 80)
      .map(LocalDate.of(1990, 1, 1).plusDays(_))
    val prop = Prop.forAll(dates) { d =>
      val parts = Partitioner.suffix(d).stripSuffix("/").split("/")
      parts.length == 3 &&
        parts(0).toInt == d.getYear &&
        parts(1) == parts(1).toLowerCase &&
        parts(1).forall(_.isLetter) &&
        parts(2).toInt == d.getDayOfMonth
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
      .passed shouldBe true
  }

  test("column form matches driver form for a real date column") {
    val s = spark
    import s.implicits._
    val df = Seq("2022-05-12", "1999-12-31").toDF("d")
      .select(to_date(col("d")).as("d"))
    val out = Partitioner.withPartitionColumns(df, col("d"))
      .select("p_year", "p_month", "p_day").collect()
      .map(r => s"${r.get(0)}/${r.get(1)}/${r.get(2)}/")
    out should contain theSameElementsAs Seq("2022/may/12/", "1999/december/31/")
  }

  test("partitioned write lands Hive-style year/month/day directories") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = Seq(("a", "2022-05-12"), ("b", "2022-06-01")).toDF("v", "d")
      .select(col("v"), to_date(col("d")).as("d"))
    Partitioner.writePartitioned(df, col("d"), dir)
    new java.io.File(s"$dir/p_year=2022/p_month=may/p_day=12")
      .exists() shouldBe true
    spark.read.parquet(dir).count() shouldBe 2
  }
}
