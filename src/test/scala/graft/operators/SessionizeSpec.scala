package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Sessionize must equal the obvious sequential definition on random
  * event streams — including the max-duration split, which is the
  * part a window cumsum cannot express — and be invariant to input
  * partitioning (the secondary sort owns the order).
  */
class SessionizeSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def naive(
      events: Seq[(Long, Long, Long)], gap: Long, maxLen: Long)
      : Map[(Long, Long, Long), Long] =
    events.groupBy(_._1).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var seq = -1L; var start = 0L; var last = 0L
      sorted.zipWithIndex.map { case (e, i) =>
        if (i == 0 || e._2 - last > gap || e._2 - start > maxLen) {
          seq += 1; start = e._2
        }
        last = e._2
        e -> seq
      }
    }

  test("matches the sequential definition on random streams " +
      "(gap + max-duration splits)") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val events = (1L to 400L).map { id =>
        (rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong * 10, id)
      }
      val gap = 100L
      val maxLen = 500L
      val got = Sessionize
        .assign(events.toDF("k", "ts", "id"), "k", "ts", "id", gap, maxLen)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      withClue(s"seed=$seed:") { got shouldBe naive(events, gap, maxLen) }
    }
  }

  test("a session never exceeds maxLen and gaps never exceed gap " +
      "within a session") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42)
    val events = (1L to 600L).map { id =>
      (rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong, id)
    }
    val gap = 50L
    val maxLen = 300L
    val rows = Sessionize
      .assign(events.toDF("k", "ts", "id"), "k", "ts", "id", gap, maxLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
      .groupBy(t => (t._1, t._2))
    rows.values.foreach { es =>
      val ts = es.map(_._3).sorted
      (ts.last - ts.head) should be <= maxLen
      ts.sliding(2).foreach {
        case Array(a, b) => (b - a) should be <= gap
        case _           =>
      }
    }
  }

  test("result is invariant to input partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new Random(9)
    val events = (1L to 300L).map { id =>
      (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong * 7, id)
    }
    def run(parts: Int) = Sessionize
      .assign(events.toDF("k", "ts", "id").repartition(parts),
        "k", "ts", "id", 80L, 400L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toList
    run(1) shouldBe run(13)
  }

  test("boundary validation: null timestamps fail loudly, non-atomic " +
      "and binary keys are rejected up front") {
    val s = spark
    import s.implicits._
    // null ts: clear message instead of an NPE mid-scan
    val withNull = Seq((1L, Some(10L), 1L), (1L, None, 2L))
      .toDF("k", "ts", "id")
    val ex = intercept[Exception] {
      Sessionize.assign(withNull, "k", "ts", "id", 10L, 100L).collect()
    }
    ex.getMessage should include("null timestamp")

    // binary key: Any != is reference equality on Array[Byte] —
    // rejected at the API boundary, not silently wrong
    val binKey = Seq((Array[Byte](1), 10L, 1L)).toDF("k", "ts", "id")
    val ex2 = intercept[IllegalArgumentException] {
      Sessionize.assign(binKey, "k", "ts", "id", 10L, 100L)
    }
    ex2.getMessage should include("atomic non-binary")

    // array key: same rejection
    val arrKey = Seq((Seq(1L), 10L, 1L)).toDF("k", "ts", "id")
    an[IllegalArgumentException] should be thrownBy
      Sessionize.assign(arrKey, "k", "ts", "id", 10L, 100L)

    // non-long ts type: rejected with the schema message
    val strTs = Seq((1L, "x", 1L)).toDF("k", "ts", "id")
    val ex3 = intercept[IllegalArgumentException] {
      Sessionize.assign(strTs, "k", "ts", "id", 10L, 100L)
    }
    ex3.getMessage should include("LONG epoch micros")
  }
}
