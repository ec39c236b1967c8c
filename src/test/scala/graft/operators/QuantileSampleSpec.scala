package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contracts for the bottom-k-hash quantile sketch: shard merge is
  * EXACTLY a fresh build (the mergeability claim), small groups are
  * exact, and estimates on a big skewed group land within the
  * expected sampling error of the true quantile.
  */
class QuantileSampleSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def mkDf(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "id", "v")
  }

  test("merge of disjoint shard sketches equals the fresh build of " +
      "the union") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map(i =>
      (s"g${i % 3}", i.toLong, rnd.nextInt(100000).toLong))
    val (a, b) = rows.splitAt(1200)
    val k = 64
    val full = QuantileSample
      .build(mkDf(rows), "g", "id", "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    val merged = QuantileSample.merge(k,
        QuantileSample.build(mkDf(a), "g", "id", "v", k),
        QuantileSample.build(mkDf(b), "g", "id", "v", k))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    merged shouldBe full
  }

  test("groups smaller than k are exact (nearest-rank over the " +
      "whole group)") {
    val rows = Seq.tabulate(9)(i => ("g", i.toLong, (i + 1) * 10L))
    val sk = QuantileSample.build(mkDf(rows), "g", "id", "v", 128)
    val est = QuantileSample.quantiles(sk, "g",
      Seq((1, 2, "p50"), (9, 10, "p90"))).collect().head
    // nearest-rank on 10..90: p50 = ceil(4.5)=5th -> 50,
    // p90 = ceil(8.1)=9th -> 90
    est.getLong(1) shouldBe 50L
    est.getLong(2) shouldBe 90L
  }

  test("estimates are deterministic across rebuilds and within " +
      "sampling error on a skewed 20k-row group") {
    // lognormal-ish skew: v = floor(exp(gaussian))
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(20000)(
      math.exp(rnd.nextGaussian() * 1.5 + 6).toLong)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("g", i.toLong, v)
    }
    val df = mkDf(rows)
    val k = 512
    def estOnce(): (Long, Long) = {
      val sk = QuantileSample.build(df, "g", "id", "v", k)
      val r = QuantileSample.quantiles(sk, "g",
        Seq((1, 2, "p50"), (9, 10, "p90"))).collect().head
      (r.getLong(1), r.getLong(2))
    }
    val (p50a, p90a) = estOnce()
    estOnce() shouldBe ((p50a, p90a))
    val sorted = vals.sorted
    def trueRankVal(num: Int, den: Int): Long =
      sorted((num * sorted.size + den - 1) / den - 1)
    // rank error of a k-uniform sample ~ n/sqrt(k); compare by the
    // RANK of the estimate in the true distribution, not the value
    def rankOf(v: Long): Int = sorted.count(_ <= v)
    val n = sorted.size
    math.abs(rankOf(p50a) - n / 2) should be < (3 * n /
      math.sqrt(k.toDouble)).toInt
    math.abs(rankOf(p90a) - 9 * n / 10) should be < (3 * n /
      math.sqrt(k.toDouble)).toInt
    // sanity on the actual values too: same order of magnitude
    p50a should be > 0L
    p90a should be >= trueRankVal(1, 2)
  }

  test("quantile requests outside 1 <= num <= den are rejected up " +
      "front (a 0th percentile would index element 0 of a SQL array)") {
    val s = spark
    import s.implicits._
    val sk = QuantileSample.build(
      (1 to 10).map(i => ("g", i.toLong, i.toLong))
        .toDF("grp", "k", "x"), "grp", "k", "x", 5)
    an[IllegalArgumentException] should be thrownBy
      QuantileSample.quantiles(sk, "grp", Seq((0, 100, "p0")))
    an[IllegalArgumentException] should be thrownBy
      QuantileSample.quantiles(sk, "grp", Seq((3, 2, "p150")))
    an[IllegalArgumentException] should be thrownBy
      QuantileSample.quantiles(sk, "grp", Seq((1, 0, "bad")))
    noException should be thrownBy
      QuantileSample.quantiles(sk, "grp",
        Seq((1, 100, "p1"), (100, 100, "p100"))).collect()
  }

  test("null values are excluded and a null-free group is unaffected") {
    val s = spark
    import s.implicits._
    val rows = Seq(("g", 1L, Some(10L)), ("g", 2L, None),
      ("g", 3L, Some(30L)), ("g", 4L, Some(20L)))
    val df = rows.toDF("g", "id", "v")
    val sk = QuantileSample.build(df, "g", "id", "v", 16)
    sk.count() shouldBe 3L
    val est = QuantileSample.quantiles(sk, "g", Seq((1, 2, "p50")))
      .collect().head
    est.getLong(1) shouldBe 20L
  }
}
