package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkylineSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** Naive O(n²) dominance oracle over an in-memory point set. */
  private def naive(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filterNot { case (_, d1, d2) =>
      pts.exists { case (_, e1, e2) =>
        e1 >= d1 && e2 >= d2 && (e1 > d1 || e2 > d2)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Int)]): Set[Long] = {
    val s = spark
    import s.implicits._
    Skyline
      .pareto2dMax(pts.toDF("id", "d1", "d2"), "d1", "d2")
      .select("id").collect().map(_.getLong(0)).toSet
  }

  test("pareto2dMax equals the naive dominance filter on random points") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      // coarse value grid forces plenty of ties in BOTH dimensions
      val pts = (1L to 300L).map(i =>
        (i, (rnd.nextInt(20) * 0.5), rnd.nextInt(12)))
      run(pts) shouldBe naive(pts)
    }
  }

  test("duplicate frontier points are all kept (neither dominates)") {
    val pts = Seq((1L, 5.0, 5), (2L, 5.0, 5), (3L, 1.0, 1))
    run(pts) shouldBe Set(1L, 2L)
  }

  test("same-d1 ties keep only the max-d2 rows; nulls are dropped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(3.0), Some(9)), // frontier (only max d2 at d1=3.0)
      (2L, Some(3.0), Some(4)), // dominated by id=1
      (3L, Some(9.0), Some(1)), // frontier (highest d1)
      (4L, None, Some(99)),     // null d1 → dropped
      (5L, Some(9.0), None)     // null d2 → dropped
    ).toDF("id", "d1", "d2")
    Skyline.pareto2dMax(df, "d1", "d2")
      .select("id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L)
  }

  test("reserved internal column names are rejected") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 2.0, 3.0)).toDF("d1", "d2", "__mx")
    an[IllegalArgumentException] should be thrownBy
      Skyline.pareto2dMax(df, "d1", "d2")
  }
}
