package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class HeavyHittersSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  /** Zipf-ish stream: item i appears ~n/i times — few heavy items,
    * long tail of distincts. Deterministic.
    */
  private def zipfish(nItems: Int, base: Int): Seq[String] =
    (1 to nItems).flatMap(i => Seq.fill(base / i)(s"item$i"))

  test("estimates bound true counts and heavy items are present, " +
      "on every partitioning") {
    val s = spark
    import s.implicits._
    val data = zipfish(400, 2000)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size }
    val n = data.size
    val capacity = 64

    for (parts <- Seq(1, 4, 13)) {
      val df = s.sparkContext.parallelize(data, parts).toDF("tok")
      val out = HeavyHitters.topK(df, "tok", k = 10, capacity = capacity)
        .collect()
      out.length shouldBe 10

      // overestimate-with-bounded-error: true <= est <= true + err
      out.foreach { r =>
        val (item, est, err) =
          (r.getString(0), r.getLong(1), r.getLong(2))
        val t = truth.getOrElse(item, 0)
        est should be >= t.toLong
        (est - err) should be <= t.toLong
      }

      // detection: every item heavier than n/capacity must be found
      val summaryItems = HeavyHitters
        .topK(df, "tok", k = capacity, capacity = capacity)
        .collect().map(_.getString(0)).toSet
      truth.filter(_._2 > n / capacity).keys.foreach { heavy =>
        summaryItems should contain(heavy)
      }

      // the unambiguous top item surfaces first
      out.head.getString(0) shouldBe "item1"
    }
  }

  test("distincts fewer than capacity are exact (zero error)") {
    val s = spark
    import s.implicits._
    val df = s.sparkContext
      .parallelize(Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq("c"), 3)
      .toDF("tok")
    val out = HeavyHitters.topK(df, "tok", k = 3, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.toList shouldBe List(("a", 30L, 0L), ("b", 20L, 0L), ("c", 1L, 0L))
  }
}
