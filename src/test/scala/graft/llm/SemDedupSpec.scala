package graft.llm

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SemDeDup (cluster-blocked semantic dedup) against an in-memory
  * reference: greedy min-id-keeps pruning over the exact intra-block
  * cosine graph.
  */
class SemDedupSpec extends AnyFunSuite with SparkFixture with Matchers {

  // Two tight clusters around orthogonal axes plus one outlier per
  // cluster. Within cluster A, vectors 10/11/12 are near-identical
  // (cos ≈ 1); 13 points elsewhere. Cluster B likewise.
  private def emb = {
    val s = spark
    import s.implicits._
    Seq(
      (10L, Array(1.0f, 0.01f, 0f, 0f)),
      (11L, Array(1.0f, 0.02f, 0f, 0f)),
      (12L, Array(0.99f, 0.0f, 0f, 0f)),
      (13L, Array(0.6f, 0.0f, 0.8f, 0f)),
      (20L, Array(0.0f, 1.0f, 0f, 0f)),
      (21L, Array(0.01f, 1.0f, 0f, 0f)),
      (22L, Array(0.0f, 0.0f, 0f, 1.0f))
    ).toDF("vec_id", "embedding")
  }

  private val cents: Seq[(Int, Array[Double])] =
    Seq(0 -> Array(1.0, 0.0, 0.0, 0.0), 1 -> Array(0.0, 1.0, 0.0, 0.0))

  test("assignCells routes each vector to its nearest centroid") {
    val cells = SemDedup.assignCells(emb, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cells(10L) shouldBe 0
    cells(13L) shouldBe 0
    cells(20L) shouldBe 1
    cells(22L) shouldBe 1 // dp 0 vs 0 ties -> higher cell id wins
  }

  test("prune keeps the min-id representative of each near-dup set") {
    // subPlanes = 0: pure intra-cell SemDeDup, no SRP sub-blocking.
    val kept = SemDedup.prune(spark, emb, cents, tau = 0.95,
        subPlanes = 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // 10/11/12 are mutual near-dups -> keep 10 only; 13 survives
    // (cos(10,13) = 0.6); 20 keeps, 21 drops vs 20; 22 orthogonal.
    kept shouldBe Set(10L, 13L, 20L, 22L)
  }

  test("droppedPairs audit matches the pruned set") {
    val dropped = SemDedup
      .duplicatePairs(spark, emb, cents, tau = 0.95, subPlanes = 0)
      .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    dropped shouldBe Set(11L, 12L, 21L)
  }

  test("prune matches a brute-force greedy reference on real vectors") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(120).cache()
    val centroids = e.limit(3).collect().zipWithIndex.map {
      case (r, i) =>
        i -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toSeq
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def cell(v: Array[Float]): Int =
      centroids.map { case (c, arr) =>
        var dp = 0.0; var i = 0
        while (i < v.length) { dp += v(i) * arr(i); i += 1 }
        (dp, c)
      }.max._2
    val tau = 0.80
    val expected = rows.groupBy { case (_, v) => cell(v) }.iterator.flatMap {
      case (_, members) =>
        members.filter { case (id, v) =>
          !members.exists { case (oid, ov) =>
            oid < id && cos(ov, v) >= tau - 1e-12 }
        }.map(_._1)
    }.toSet
    val kept = SemDedup.prune(spark, e, centroids, tau, subPlanes = 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    kept shouldBe expected
  }

  test("cellCap skips pair-scoring for oversize blocks (conservative keep)") {
    val kept = SemDedup.prune(spark, emb, cents, tau = 0.95,
      subPlanes = 0, cellCap = 3)
    // cell 0 holds 4 vectors -> over the cap, so no pairs form there
    // and all four pass through unpruned; cell 1 (3 members) is under
    // the cap and still prunes 21 against 20.
    kept.select("vec_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(10L, 11L, 12L, 13L, 20L, 22L)
  }
}
