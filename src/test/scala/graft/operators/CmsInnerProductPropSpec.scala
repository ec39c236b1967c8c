package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Randomized guarantee check for the CMS inner-product join-size
  * estimate (q287's operator form): for ANY two key multisets, the
  * estimate min_r Σ_b cntA[r][b]·cntB[r][b] must never undershoot
  * the true join size Σ_k fA(k)·fB(k) — hash collisions only ADD
  * cross terms. Also pins the exact case: with width ≥ distinct
  * keys and no colliding buckets the estimate equals the truth.
  */
class CmsInnerProductPropSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def joinSizeEst(a: Seq[Long], b: Seq[Long], d: Int,
      w: Int): Long = {
    val s = spark
    import s.implicits._
    val ca = CountMinSketch.build(a.toDF("k"), "k", d, w)
      .withColumnRenamed("cnt", "ca")
    val cb = CountMinSketch.build(b.toDF("k"), "k", d, w)
      .withColumnRenamed("cnt", "cb")
    ca.join(cb, Seq("row", "bucket"))
      .groupBy("row").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min("ip")).head().getLong(0)
  }

  private def joinSizeTrue(a: Seq[Long], b: Seq[Long]): Long = {
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong)
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong)
    fa.map { case (k, n) => n * fb.getOrElse(k, 0L) }.sum
  }

  test("the estimate never undershoots the true join size") {
    (1 to 4).foreach { seed =>
      val rnd = new Random(seed)
      val a = Seq.fill(300)(rnd.nextInt(40).toLong)
      val b = Seq.fill(200)(rnd.nextInt(60).toLong)
      val est = joinSizeEst(a, b, d = 4, w = 16) // narrow → collisions
      val truth = joinSizeTrue(a, b)
      withClue(s"seed $seed (est=$est truth=$truth):") {
        est should be >= truth
      }
    }
  }

  test("verified-collision-free keys make the estimate EXACT") {
    // select keys whose buckets are pairwise distinct in EVERY hash
    // row (checked with the operator's own bucket function), so the
    // inner product has no cross terms and est == truth is a hard
    // assertion — a systematic overshoot (e.g. a double-counting
    // join bug) fails here where `>=` alone would pass
    val s = spark
    import s.implicits._
    val d = 4; val w = 256
    val cand = (0L until 64L)
    val bucketRows = cand.toDF("k")
      .select(col("k") +: (0 until d).map(r =>
        CountMinSketch.bucket(col("k"), r, w).as(s"b$r")): _*)
      .collect()
      .map(row => row.getLong(0) ->
        (0 until d).map(i => row.getLong(i + 1)))
      .toMap
    val picked = cand.foldLeft(Vector.empty[Long]) { (acc, k) =>
      if (acc.size >= 8) acc
      else if (acc.forall(p => (0 until d).forall(i =>
        bucketRows(p)(i) != bucketRows(k)(i)))) acc :+ k
      else acc
    }
    picked.size shouldBe 8
    val rnd = new Random(7)
    val keys = Seq.fill(250)(picked(rnd.nextInt(picked.size)))
    val est = joinSizeEst(keys, keys, d, w)
    est shouldBe joinSizeTrue(keys, keys)
  }
}
