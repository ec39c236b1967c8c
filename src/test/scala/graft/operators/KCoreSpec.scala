package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class KCoreSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("u", "v")
  }

  test("2-core strips pendant chains, keeps the cycle") {
    // triangle 1-2-3 with a pendant path 3-4-5
    val (core, counts) = KCore.peelWithCounts(
      edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)),
      k = 2, rounds = 3)
    val got = core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 2L), (2L, 3L), (1L, 3L))
    counts shouldBe Seq(4, 3, 3) // pendant edge 4-5 dies in round 1,
                                 // 3-4 in round 2, then converged
  }

  test("cascade: a k-core survivor must survive ALL rounds, not round 1") {
    // path 1-2-3-4: every interior node has degree 2 initially, but
    // peeling the endpoints cascades the whole path away at k = 2
    val (core, counts) = KCore.peelWithCounts(
      edges((1L, 2L), (2L, 3L), (3L, 4L)), k = 2, rounds = 4)
    core.count() shouldBe 0
    counts.last shouldBe 0
  }

  test("k=1 keeps everything with at least one neighbor") {
    val (core, counts) = KCore.peelWithCounts(
      edges((1L, 2L), (3L, 4L)), k = 1, rounds = 2)
    core.count() shouldBe 2
    counts shouldBe Seq(2, 2)
  }
}
