package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** CMS invariants: sharded-build mergeability (the reason the sketch
  * exists), the one-sided error guarantee, and exactness when the
  * width eliminates collisions.
  */
class CountMinSketchSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def df(keys: Seq[String]) = {
    val s = spark
    import s.implicits._
    keys.toDF("k")
  }

  private val keysA = Seq("a", "b", "a", "c", "a", "b")
  private val keysB = Seq("b", "d", "d", "a")

  private def cells(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("build over the union equals the cell-wise merge of shard builds") {
    val whole = cells(CountMinSketch.build(df(keysA ++ keysB), "k", 4, 32))
    val merged = cells(CountMinSketch.merge(
      CountMinSketch.build(df(keysA), "k", 4, 32),
      CountMinSketch.build(df(keysB), "k", 4, 32)))
    merged shouldBe whole
  }

  test("estimates never undershoot, and are exact at collision-free width") {
    val data = keysA ++ keysB
    val truth = data.groupBy(identity).map { case (k, o) =>
      k -> o.size.toLong
    }
    val keys = df(truth.keys.toSeq)
    // narrow sketch: collisions possible, but est >= true always
    val narrow = CountMinSketch.estimate(keys,
      CountMinSketch.build(df(data), "k", 4, 4), "k", 4, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) => narrow(k) should be >= n }
    // wide sketch: 4 distinct keys into width 4096 — exact with
    // near-certainty under 4 independent hash rows
    val wide = CountMinSketch.estimate(keys,
      CountMinSketch.build(df(data), "k", 4, 4096), "k", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    wide shouldBe truth
  }

  test("a key absent from every cell estimates zero") {
    val sketch = CountMinSketch.build(df(Seq.empty), "k", 4, 32)
    val est = CountMinSketch.estimate(df(Seq("ghost")), sketch, "k", 4, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est("ghost") shouldBe 0L
  }

  test("typed Sketch carries its shape: estimate needs no d/w and matches") {
    val data = keysA ++ keysB
    val truth = data.groupBy(identity).map { case (k, o) =>
      k -> o.size.toLong
    }
    val sk = CountMinSketch.sketch(df(data), "k", 4, 4096)
    val est = CountMinSketch.estimate(df(truth.keys.toSeq), sk, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est shouldBe truth
  }

  test("typed merge rejects shape mismatch loudly") {
    val a = CountMinSketch.sketch(df(keysA), "k", 4, 32)
    val b = CountMinSketch.sketch(df(keysB), "k", 2, 32)
    val e = intercept[IllegalArgumentException] {
      CountMinSketch.merge(a, b)
    }
    e.getMessage should include("shape mismatch")
  }

  test("raw estimate against a DEEPER sketch fails loudly, not silently") {
    // sketch built at depth 4; raw estimate claims depth 2 — the
    // depth-2..3 cells are outside the claimed shape and must trip
    // the raise_error guard instead of quietly skewing the min
    val deep = CountMinSketch.build(df(keysA), "k", 4, 32)
    val ex = intercept[Exception] {
      CountMinSketch.estimate(df(Seq("a")), deep, "k", 2, 32).collect()
    }
    ex.getMessage should include("different shape")
  }

  test("buildPair is cell-equivalent to two separate builds") {
    val s = spark
    import s.implicits._
    val tagged = (keysA.map(_ -> true) ++ keysB.map(_ -> false))
      .toDF("k", "t")
    val pair = tagged.transform(d =>
      CountMinSketch.buildPair(d, "k", "t", 4, 32))
    val full = cells(pair.select(col("row"), col("bucket"), col("cnt")))
    val tag = cells(pair.filter(col("cnt_tag") > 0)
      .select(col("row"), col("bucket"), col("cnt_tag")))
    full shouldBe cells(
      CountMinSketch.build(df(keysA ++ keysB), "k", 4, 32))
    tag shouldBe cells(CountMinSketch.build(df(keysA), "k", 4, 32))
  }

  test("bucket hashing is stable and within [0, width)") {
    val b = df(Seq("x", "y", "z"))
      .select(CountMinSketch.bucket(col("k"), 1, 64).as("b"))
      .collect().map(_.getLong(0))
    all(b) should be >= 0L
    all(b) should be < 64L
    // deterministic across invocations
    val b2 = df(Seq("x", "y", "z"))
      .select(CountMinSketch.bucket(col("k"), 1, 64).as("b"))
      .collect().map(_.getLong(0))
    b2 shouldBe b
  }
}
