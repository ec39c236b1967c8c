package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Brute-force parity for the degree-oriented triangle machinery: on
  * random graphs (fixed seeds) the per-node counts must equal the
  * naive all-triples enumeration — covering ties in degree, hubs,
  * isolated edges, and the once-per-triangle guarantee the wedge
  * rank-order relies on.
  */
class TrianglesSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def randomGraph(seed: Long, n: Int, p: Double): Set[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      u <- 0L until n.toLong
      v <- (u + 1) until n.toLong
      if rnd.nextDouble() < p
    } yield (u, v)).toSet
  }

  private def naivePerNode(es: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = es.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val nodes = adj.keys.toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && adj(a).contains(b)
      c <- nodes if b < c && adj(a).contains(c) && adj(b).contains(c)
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
  }

  test("per-node counts match naive enumeration on random graphs") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1L, 7L, 42L)) {
      val es = randomGraph(seed, n = 14, p = 0.35)
      es should not be empty
      val got = Triangles.perNode(es.toSeq.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe naivePerNode(es)
    }
  }

  test("triangle-free graph yields no rows; K4 yields 3 per node") {
    val s = spark
    import s.implicits._
    // 4-cycle: no triangles
    val c4 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("u", "v")
    Triangles.perNode(c4).count() shouldBe 0
    // complete graph K4: C(3,2)=3 triangles through each node
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)).toDF("u", "v")
    Triangles.perNode(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L)
  }
}
