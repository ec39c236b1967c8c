package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** PCA pipeline invariants: the distributed covariance equals a
  * driver-side computation; power iteration lands on the dominant
  * eigenvector (checked as Av ≈ λv and against a planted-spike
  * construction); the projection matches a driver dot product.
  */
class EmbeddingPcaSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def mkDf(vecs: Seq[Array[Float]]) = {
    val s = spark
    import s.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("covariance equals the driver-side definition") {
    val rnd = new Random(7)
    val d = 5
    val vecs = Seq.fill(40)(Array.fill(d)(rnd.nextFloat() * 4 - 2))
    val got = EmbeddingPca.covariance(mkDf(vecs), "vec_id", "embedding")
      .collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2)))
      .toMap
    got.size shouldBe d * (d + 1) / 2
    val n = vecs.length
    for (i <- 0 until d; j <- i until d) {
      val xi = vecs.map(_(i).toDouble)
      val xj = vecs.map(_(j).toDouble)
      val expected =
        (xi.zip(xj).map { case (a, b) => a * b }.sum -
          xi.sum * xj.sum / n) / n
      got((i + 1, j + 1)) shouldBe expected +- 1e-6
    }
  }

  test("power iteration finds the planted dominant direction") {
    // data = strong signal along `axis` + weak noise elsewhere
    val rnd = new Random(11)
    val d = 8
    val axis = 3
    val vecs = Seq.fill(200) {
      val v = Array.fill(d)(rnd.nextFloat() * 0.1f)
      v(axis) = (rnd.nextFloat() * 10 - 5).toFloat
      v
    }
    val df = mkDf(vecs)
    val cov = EmbeddingPca.covariance(df, "vec_id", "embedding")
    val v = EmbeddingPca.topComponent(cov, d)
    math.abs(v(axis)) should be > 0.99
    // eigen-residual: ||Av − λv|| small with λ = vᵀAv
    val cells = cov.collect()
      .map(r => ((r.getLong(0).toInt - 1, r.getLong(1).toInt - 1),
        r.getDouble(2))).toMap
    def m(i: Int, j: Int) =
      cells.getOrElse((math.min(i, j), math.max(i, j)), 0.0)
    val av = Array.tabulate(d)(i => (0 until d).map(j => m(i, j) * v(j)).sum)
    val lambda = v.indices.map(i => v(i) * av(i)).sum
    val resid = math.sqrt(
      v.indices.map(i => math.pow(av(i) - lambda * v(i), 2)).sum)
    resid should be < 1e-8
  }

  test("projection equals a driver dot product and is map-side only") {
    val rnd = new Random(3)
    val d = 6
    val vecs = Seq.fill(25)(Array.fill(d)(rnd.nextFloat()))
    val df = mkDf(vecs)
    val comp = Array.tabulate(d)(i => (i + 1).toDouble / d)
    val proj = EmbeddingPca.project(spark, df, "embedding", comp)
    val got = proj.collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("pc1_score")))
      .toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      // DotDoubleExpr folds left-to-right in doubles — replicate
      val expected = v.zip(comp)
        .foldLeft(0.0) { case (acc, (x, c)) => acc + x.toDouble * c }
      got(i.toLong) shouldBe expected
    }
    // zero shuffle: the projection plan must contain no Exchange
    proj.queryExecution.executedPlan.toString should not include "Exchange"
  }
}
