package graft.llm

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ProductQuantizerSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def tinyEmb = {
    val s = spark
    import s.implicits._
    // dim 4, 2 subspaces × 2 codes from vec_id 1 and 2. vec 3 sits
    // near vec 1 in subspace 0 and near vec 2 in subspace 1.
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
  }

  test("codebook vectors encode to their own code") {
    val cb = ProductQuantizer.codebookFromCorpus(tinyEmb, numSub = 2,
      codesPerSub = 2)
    val codes = ProductQuantizer.encode(tinyEmb, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    codes((1L, 0)) shouldBe 0
    codes((1L, 1)) shouldBe 0
    codes((2L, 0)) shouldBe 1
    codes((2L, 1)) shouldBe 1
  }

  test("encode picks the nearest code per subspace") {
    val cb = ProductQuantizer.codebookFromCorpus(tinyEmb, numSub = 2,
      codesPerSub = 2)
    val codes = ProductQuantizer.encode(tinyEmb, cb)
      .filter(col("vec_id") === 3L)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    // sub0 of vec3 = (0.9, 0.1): nearer (1,0) than (0,1) -> code 0
    // sub1 of vec3 = (0.9, 0.1): nearer (1,0)=vec2's sub1 -> code 1
    codes(0) shouldBe 0
    codes(1) shouldBe 1
  }

  test("adcTopK ranks by quantized distance, ascending and total") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = ProductQuantizer.codebookFromCorpus(emb, numSub = 8,
      codesPerSub = 16)
    val top = ProductQuantizer.adcTopK(spark, emb, cb, queryId = 0,
      k = 15).collect()
    top.length shouldBe 15
    top.map(_.getLong(0)) should not contain 0L
    val dists = top.map(_.getDouble(1))
    dists.sorted.toSeq shouldBe dists.toSeq
    all(dists) should be >= 0.0
  }

  test("ADC top-10 overlaps the exact L2 top-10 (recall floor)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val cb = ProductQuantizer.codebookFromCorpus(emb, numSub = 8,
      codesPerSub = 16)
    val adcTop = ProductQuantizer.adcTopK(spark, emb, cb, queryId = 0,
      k = 10).collect().map(_.getLong(0)).toSet
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val exactTop = emb.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var d = 0.0; var i = 0
        while (i < v.length) {
          val t = v(i).toDouble - qv(i); d += t * t; i += 1
        }
        (d, r.getLong(0))
      }.sortBy(identity).take(10).map(_._2).toSet
    // The deliberately-unrefined sampled codebook lands overlap = 2
    // on this fixed corpus (deterministic); q220 tracks the number.
    (adcTop intersect exactTop).size should be >= 2
  }

  private def labelCentroids(
      emb: org.apache.spark.sql.DataFrame): Seq[(Int, Array[Double])] =
    emb.select("label", "embedding").collect()
      .groupBy(_.getInt(0)).toSeq
      .map { case (lbl, rs) =>
        val vs = rs.map(_.getSeq[Float](1).map(_.toDouble).toArray)
        val d = vs.head.length
        lbl -> Array.tabulate(d)(i => vs.map(_(i)).sum / vs.length)
      }.sortBy(_._1)

  test("ivfAdcTopK = full ADC ranking restricted to probed cells") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val cb = ProductQuantizer.codebookFromCorpus(emb, numSub = 8,
      codesPerSub = 16)
    val cents = labelCentroids(emb)
    val got = ProductQuantizer.ivfAdcTopK(spark, emb, cents, cb,
      queryId = 0, k = 10, nProbe = 3).collect()
    got.length shouldBe 10
    // probed cells, driver-side (same fold as the operator)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
      .map(_.toDouble).toArray
    def dot(c: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += qv(i) * c(i); i += 1 }; s
    }
    val probed = cents.map { case (l, c) => (dot(c), l) }
      .sortBy { case (dp, l) => (-dp, -l) }.take(3).map(_._2).toSet
    got.map(_.getInt(1)).toSet.subsetOf(probed) shouldBe true
    // members of probed cells by the same argmax
    val members = emb.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").collect().flatMap { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val cell = cents.map { case (l, c) =>
          var s = 0.0; var i = 0
          while (i < c.length) { s += v(i) * c(i); i += 1 }
          (s, l)
        }.max._2
        if (probed(cell)) Some(r.getLong(0)) else None
      }.toSet
    val expect = ProductQuantizer.adcTopK(spark, emb, cb, queryId = 0,
      k = 500).collect()
      .filter(r => members(r.getLong(0)))
      .take(10).map(r => (r.getLong(0), r.getDouble(1)))
    got.map(r => (r.getLong(0), r.getDouble(2))).toSeq shouldBe
      expect.toSeq
  }

  test("ivfAdcRerank orders the shortlist by exact cosine") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val cb = ProductQuantizer.codebookFromCorpus(emb, numSub = 8,
      codesPerSub = 16)
    val cents = labelCentroids(emb)
    val short = ProductQuantizer.ivfAdcTopK(spark, emb, cents, cb,
      queryId = 0, k = 25, nProbe = 3).collect()
      .map(_.getLong(0)).toSet
    val got = ProductQuantizer.ivfAdcRerank(spark, emb, cents, cb,
      queryId = 0, shortlist = 25, k = 10, nProbe = 3).collect()
    got.length shouldBe 10
    got.map(_.getLong(0)).toSet.subsetOf(short) shouldBe true
    val sims = got.map(_.getDouble(1))
    sims.sorted.reverse.toSeq shouldBe sims.toSeq
    all(sims) should be <= 1.0 + 1e-12
  }

  test("a Lloyd refinement round does not worsen PQ distortion") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val rows = emb.select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def distortion(cb: Array[Array[Array[Double]]]): Double = {
      val sub = cb(0)(0).length
      rows.map { v =>
        cb.indices.map { m =>
          cb(m).map { c =>
            var d = 0.0; var i = 0
            while (i < sub) {
              val t = v(m * sub + i) - c(i); d += t * t; i += 1
            }
            d
          }.min
        }.sum
      }.sum
    }
    val cb0 = ProductQuantizer.codebookFromCorpus(emb, numSub = 8,
      codesPerSub = 16)
    val cb1 = ProductQuantizer.refineCodebook(emb, cb0, iterations = 1)
    distortion(cb1) should be <= distortion(cb0) + 1e-9
  }

  test("trainCodebook (maximin + Lloyd) beats the sampled codebook " +
      "on distortion and is deterministic") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val rows = emb.select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def distortion(cb: Array[Array[Array[Double]]]): Double = {
      val sub = cb(0)(0).length
      rows.map { v =>
        cb.indices.map { m =>
          cb(m).map { c =>
            var d = 0.0; var i = 0
            while (i < sub) {
              val t = v(m * sub + i) - c(i); d += t * t; i += 1
            }
            d
          }.min
        }.sum
      }.sum
    }
    val sampled = ProductQuantizer.codebookFromCorpus(emb, numSub = 8,
      codesPerSub = 16)
    val trained = ProductQuantizer.trainCodebook(emb, numSub = 8,
      codesPerSub = 16, iterations = 3)
    distortion(trained) should be < distortion(sampled)
    // exact-decimal Lloyd means -> bit-identical retrain
    val again = ProductQuantizer.trainCodebook(emb, numSub = 8,
      codesPerSub = 16, iterations = 3)
    trained.flatten.flatten.toSeq shouldBe again.flatten.flatten.toSeq
  }

  test("trained-path encode parity: every code is the argmin of " +
      "driver-recomputed subspace distances") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val trained = ProductQuantizer.trainCodebook(emb, numSub = 8,
      codesPerSub = 16, iterations = 3)
    val sub = trained(0)(0).length
    val vecs = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val codes = ProductQuantizer.encode(
      emb.filter(col("vec_id") < 10), trained)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    for ((vid, v) <- vecs; m <- trained.indices) {
      // same fold order as the in-plan subDist expression:
      // (norm - 2*dot) + cnorm, ties to the smaller k
      val expected = trained(m).zipWithIndex.map { case (c, k) =>
        val vs = v.slice(m * sub, (m + 1) * sub)
        var nv = 0.0; var dp = 0.0; var nc = 0.0; var i = 0
        while (i < sub) {
          nv += vs(i) * vs(i); dp += vs(i) * c(i); nc += c(i) * c(i)
          i += 1
        }
        ((nv - dp * 2.0) + nc, k)
      }.minBy { case (dd, k) => (dd, k) }._2
      codes((vid, m)) shouldBe expected
    }
  }

  test("numSub=1 trainCodebook is a plain vector quantizer: full-dim " +
      "centroids, deterministic, beats sampled cells on distortion") {
    // the unsupervised IVF coarse quantizer (q317): one subspace =
    // k-means over whole vectors, same init + exact-decimal Lloyd
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .cache()
    val rows = emb.select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    def distortion1(cb: Array[Array[Double]]): Double =
      rows.map(v => cb.map(c => sq(v, c)).min).sum
    val trained = ProductQuantizer.trainCodebook(emb, numSub = 1,
      codesPerSub = 8, iterations = 3)
    trained.length shouldBe 1
    trained(0).length shouldBe 8
    all(trained(0).map(_.length).toSeq) shouldBe rows.head.length
    val sampled = ProductQuantizer.codebookFromCorpus(emb, numSub = 1,
      codesPerSub = 8)
    distortion1(trained(0)) should be < distortion1(sampled(0))
    // exact-decimal Lloyd means -> bit-identical retrain
    val again = ProductQuantizer.trainCodebook(emb, numSub = 1,
      codesPerSub = 8, iterations = 3)
    trained.flatten.flatten.toSeq shouldBe again.flatten.flatten.toSeq
  }
}
