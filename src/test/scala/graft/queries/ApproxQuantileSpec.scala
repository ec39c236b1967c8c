package graft.queries

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The mergeable quantile sketch (Spark's built-in Greenwald–Khanna
  * `approx_percentile` — the 100 TB path where q61/q142/q188's exact
  * percentiles would need a full per-group sort): its documented rank
  * guarantee, error ≤ n/accuracy ranks, verified against the exact
  * order statistics. Mirrors q42's HLL-vs-rsd contract: the sketch is
  * not cross-engine oracle-able (its compression is
  * implementation-defined), so the published error bound IS the
  * testable spec.
  */
class ApproxQuantileSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  test("approx_percentile honors the n/accuracy rank-error bound " +
      "against exact order statistics") {
    val vals = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").cast("double").as("v"))
    val sorted = vals.orderBy("v").collect().map(_.getDouble(0))
    val n = sorted.length
    val accuracy = 1000
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val approx = vals
      .agg(percentile_approx(col("v"),
        array(qs.map(lit): _*), lit(accuracy)))
      .head.getSeq[Double](0)
    qs.zip(approx).foreach { case (q, a) =>
      // rank window the estimate must land in: target ± n/accuracy
      val lo = math.max(0, (q * n).toInt - n / accuracy - 1)
      val hi = math.min(n - 1, (q * n).toInt + n / accuracy + 1)
      withClue(s"q=$q est=$a n=$n: ") {
        a should be >= sorted(lo)
        a should be <= sorted(hi)
      }
    }
  }

  test("the sketch merges across partitionings without changing its " +
      "guarantee (partition-count invariance of the bound)") {
    val vals = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").cast("double").as("v"))
    val sorted = vals.orderBy("v").collect().map(_.getDouble(0))
    val n = sorted.length
    val accuracy = 1000
    Seq(1, 7, 32).foreach { parts =>
      val est = vals.repartition(parts)
        .agg(percentile_approx(col("v"), lit(0.5), lit(accuracy)))
        .head.getDouble(0)
      val lo = sorted(math.max(0, n / 2 - n / accuracy - 1))
      val hi = sorted(math.min(n - 1, n / 2 + n / accuracy + 1))
      withClue(s"parts=$parts est=$est: ") {
        est should be >= lo
        est should be <= hi
      }
    }
  }
}
