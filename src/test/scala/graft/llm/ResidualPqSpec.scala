package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Residual IVF-PQ (IVFADC) against constructions where the expected
  * behavior is known exactly.
  */
class ResidualPqSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  // dim 8, 4 subspaces of 2. Vectors 1..4 double as codebook samples.
  private def emb = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0.8f)),
      (2L, Array(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f, 0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 0f, 1f, 0f, 0f, 1f, 0f)),
      (5L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f)), // dup of 0
      (6L, Array(0f, 0.5f, 0.5f, 0f, 0f, 0.7f, 0f, 0f))
    ).toDF("vec_id", "embedding")
  }

  private val twoCells: Seq[(Int, Array[Double])] = Seq(
    0 -> Array(0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5),
    1 -> Array(0.0, 0.3, 0.3, 0.0, 0.0, 0.3, 0.0, 0.0))

  test("with a single origin centroid, residual encode = plain encode") {
    val origin = Seq(0 -> Array.fill(8)(0.0))
    val cb = ProductQuantizer.codebookFromCorpus(emb, numSub = 4,
      codesPerSub = 4)
    val plain = ProductQuantizer.encode(emb, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSet
    val resid = ProductQuantizer.encodeResidual(emb, origin, cb)
      .select("vec_id", "m", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSet
    resid shouldBe plain
  }

  test("residual codebook from an origin centroid = plain codebook") {
    val origin = Seq(0 -> Array.fill(8)(0.0))
    val plain = ProductQuantizer.codebookFromCorpus(emb, 4, 4)
    val resid = ProductQuantizer.residualCodebookFromCorpus(emb,
      origin, 4, 4)
    resid.flatten.flatten.toSeq shouldBe plain.flatten.flatten.toSeq
  }

  test("an exact duplicate of the query attains the minimal residual " +
      "ADC distance") {
    // The dup's CODES are what ADC scores, so coarse codebooks can
    // tie it with other vectors mapping to the same codes — the
    // guarantee is minimal distance, not strict rank.
    val cb = ProductQuantizer.residualCodebookFromCorpus(emb, twoCells,
      numSub = 4, codesPerSub = 4)
    val top = ProductQuantizer.ivfResidualAdcTopK(spark, emb, twoCells,
      cb, queryId = 0, k = 6, nProbe = 2).collect()
    val dupDist = top.find(_.getLong(0) == 5L).get.getDouble(2)
    dupDist shouldBe top.map(_.getDouble(2)).min
  }

  test("non-contiguous cell labels are rejected loudly") {
    val bad = Seq(1 -> Array.fill(8)(0.0), 2 -> Array.fill(8)(1.0))
    val cb = ProductQuantizer.codebookFromCorpus(emb, 4, 4)
    an[IllegalArgumentException] should be thrownBy
      ProductQuantizer.encodeResidual(emb, bad, cb).collect()
  }
}
