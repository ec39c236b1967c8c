package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** KMV theta-sketch invariants: exactness below k, shard mergeability
  * (the k smallest of a union are among each side's k smallest), and
  * bounded estimation error in the sampling regime — all
  * deterministic because the hash is salted md5, so the error
  * assertions are stable, not flaky.
  */
class KmvSketchSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def df(pairs: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    pairs.toDF("grp", "key")
  }

  test("below k the sketch is the whole hash set: estimates and " +
      "intersections are exact") {
    val a = (1 to 40).map(i => "A" -> s"k$i")
    val b = (30 to 60).map(i => "B" -> s"k$i") // overlap 30..40 = 11
    val sk = KmvSketch.build(df(a ++ b), "grp", "key", 256)
    val est = KmvSketch.estimate(sk, "grp", 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    est("A") shouldBe 40.0
    est("B") shouldBe 31.0
    val inter = KmvSketch
      .intersectEstimate(sk, "grp", 256, lit("A"), lit("B"))
      .head().getDouble(0)
    inter shouldBe 11.0
  }

  test("zero overlap estimates zero") {
    val a = (1 to 20).map(i => "A" -> s"x$i")
    val b = (1 to 20).map(i => "B" -> s"y$i")
    val sk = KmvSketch.build(df(a ++ b), "grp", "key", 64)
    KmvSketch.intersectEstimate(sk, "grp", 64, lit("A"), lit("B"))
      .head().getDouble(0) shouldBe 0.0
  }

  test("merge of shard sketches equals the sketch of the union") {
    val s1 = (1 to 500).map(i => "G" -> s"k$i")
    val s2 = (400 to 900).map(i => "G" -> s"k$i")
    val merged = KmvSketch.merge(64,
      KmvSketch.build(df(s1), "grp", "key", 64),
      KmvSketch.build(df(s2), "grp", "key", 64))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val whole = KmvSketch.build(df(s1 ++ s2), "grp", "key", 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    merged shouldBe whole
  }

  test("sampling-regime estimates land within 20% of truth " +
      "(deterministic md5 sample, k=256)") {
    val a = (1 to 5000).map(i => "A" -> s"k$i")
    val b = (3000 to 8000).map(i => "B" -> s"k$i") // overlap 2001
    val sk = KmvSketch.build(df(a ++ b), "grp", "key", 256)
    val est = KmvSketch.estimate(sk, "grp", 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    math.abs(est("A") - 5000) / 5000.0 should be < 0.2
    math.abs(est("B") - 5001) / 5001.0 should be < 0.2
    val inter = KmvSketch
      .intersectEstimate(sk, "grp", 256, lit("A"), lit("B"))
      .head().getDouble(0)
    math.abs(inter - 2001) / 2001.0 should be < 0.35
  }

  test("typed Kmv overloads are k-mismatch-proof and match raw forms") {
    val a = (1 to 400).map(i => "A" -> s"k$i")
    val b = (200 to 600).map(i => "B" -> s"k$i")
    val sk = KmvSketch.sketchOf(df(a ++ b), "grp", "key", 64)
    val typed = KmvSketch.estimate(sk, "grp")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val raw = KmvSketch.estimate(sk.sample, "grp", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    typed shouldBe raw
    val merged = KmvSketch.merge(sk, sk)
    merged.k shouldBe 64
    an[IllegalArgumentException] should be thrownBy
      KmvSketch.merge(sk, KmvSketch.sketchOf(df(a), "grp", "key", 32))
  }
}
