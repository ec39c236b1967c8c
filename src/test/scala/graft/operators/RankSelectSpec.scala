package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** RankSelect's claim is that the two-pass bin-sketch selection picks
  * the IDENTICAL rows a global sort would — checked against a
  * driver-side sort on random data, including ties (duplicate values
  * resolved by the tie-breaker), skewed distributions (most rows in
  * one bin), and a bin width larger than the whole value range (the
  * degenerate one-bin case, where pass two does all the work).
  */
class RankSelectSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def naive(vals: Seq[(Double, Long)], k: Int): Seq[(Int, Long, Double)] = {
    val sorted = vals.sortBy(identity)
    val n = sorted.length.toLong
    (1 until k).map { b =>
      val target = (b * n + k - 1) / k
      (b, target, sorted((target - 1).toInt)._1)
    }
  }

  test("quantileValues equals a global sort on random data (ties, skew)") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 3; binWidth <- Seq(5.0, 1000.0)) {
      val rnd = new Random(seed)
      // heavy ties + skew: half the mass at value 7
      val vals = (1L to 500L).map { id =>
        val v = if (rnd.nextBoolean()) 7.0
                else math.floor(rnd.nextDouble() * 100) / 2
        (v, id)
      }
      val got = RankSelect
        .quantileValues(vals.toDF("v", "id"), "v", Seq("id"), 8, binWidth)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toList
      withClue(s"seed=$seed binWidth=$binWidth:") {
        got shouldBe naive(vals, 8).toList
      }
    }
  }

  test("null values are excluded from ranks") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Double, Long)](
      (1.0, 1L), (null, 2L), (2.0, 3L), (3.0, 4L), (4.0, 5L))
      .toDF("v", "id")
    val got = RankSelect.quantileValues(df, "v", Seq("id"), 2, 10.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    // n = 4 non-null, target = ceil(4/2) = 2 → value 2.0
    got shouldBe List((2L, 2.0))
  }

  test("rejects degenerate parameters") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 1L)).toDF("v", "id")
    an[IllegalArgumentException] should be thrownBy
      RankSelect.quantileValues(df, "v", Seq("id"), 1, 10.0)
    an[IllegalArgumentException] should be thrownBy
      RankSelect.quantileValues(df, "v", Seq("id"), 4, 0.0)
  }
}
