package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The q176/q188 bin-sketch quantile pattern claims two properties
  * that make it the 100 TB shape: the sketch MERGES (bin counts from
  * disjoint slices re-aggregate to the whole — what lets per-day /
  * per-cluster sketches roll up without rescanning), and the derived
  * bound BRACKETS the true quantile within one bin width. Both
  * pinned here on random data.
  */
class BinSketchMergeSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val width = 10.0

  private def sketch(df: DataFrame): DataFrame =
    df.groupBy(floor(col("v") / width).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  private def quantiles(bins: DataFrame, pcts: Seq[Int]): Map[Int, Long] = {
    val cum = bins
      .withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
      .withColumn("n", max(col("cum")).over(Window.partitionBy()))
    pcts.map { p =>
      p -> cum.agg(
        min(when(col("cum") * 100 >= col("n") * p, col("bin"))))
        .collect()(0).getLong(0)
    }.toMap
  }

  test("sketches from disjoint slices merge to the whole, and bounds " +
      "bracket the exact quantile") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val vals = Seq.fill(2000)(rnd.nextDouble() * 500)
      val (h1, h2) = vals.splitAt(rnd.nextInt(vals.size - 1) + 1)

      val direct = sketch(vals.toDF("v"))
      // merge = union of the slice sketches re-aggregated by bin
      val merged = sketch(h1.toDF("v"))
        .union(sketch(h2.toDF("v")))
        .groupBy("bin").agg(sum("cnt").as("cnt"))

      val pcts = Seq(50, 90, 99)
      val qd = quantiles(direct, pcts)
      val qm = quantiles(merged, pcts)
      withClue(s"seed=$seed merge parity:") { qm shouldBe qd }

      // bracketing: bin*width <= true pth value < bin*width + width
      val sorted = vals.sorted
      pcts.foreach { p =>
        val target = (p.toLong * vals.size + 99) / 100
        val exact = sorted((target - 1).toInt)
        val lo = qd(p) * width
        withClue(s"seed=$seed p$p exact=$exact lo=$lo:") {
          exact should be >= lo
          exact should be < lo + width
        }
      }
    }
  }
}
