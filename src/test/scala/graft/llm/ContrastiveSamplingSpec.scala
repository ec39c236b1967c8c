package graft.llm

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The ANN-routed triplet miner against the q236 exact oracle form:
  * with an exhaustive probe (nProbe = K) the positives are the exact
  * cosine top-k, so the whole triplet output must match the declared
  * query row-for-row; the bucketed-negatives scale path must stay
  * deterministic, pool-pure, and full-width.
  */
class ContrastiveSamplingSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  test("exhaustive-probe triplets equal the q236 exact form " +
      "row-for-row") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Centroids.byLabel(spark, emb)
    val got = ContrastiveSampling.triplets(spark, emb, cents,
        col("vec_id") % 100 === 7, kPos = 3, kNeg = 3,
        nProbe = 10) // = K cells: ANN recall 1 -> exact positives
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = graft.SparkEntry.queries("q236_negative_sampling")(
        spark, sfDir)
      .select("anchor", "role", "rank", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    got shouldBe want
    got should not be empty
  }

  test("exhaustive-probe semi-hard negatives equal the q245 exact band") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Centroids.byLabel(spark, emb)
    val got = ContrastiveSampling.mineSemiHardNegatives(spark, emb,
        cents, col("vec_id") % 100 === 7, kPos = 3, kNeg = 3,
        nProbe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = graft.SparkEntry.queries("q245_semihard_negatives")(
        spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    got shouldBe want
    got should not be empty
  }

  test("bucketed negatives: deterministic, pool-pure, full-width") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Centroids.byLabel(spark, emb)
    def run() = ContrastiveSampling.triplets(spark, emb, cents,
        col("vec_id") % 100 === 7, kPos = 3, kNeg = 3, nProbe = 2,
        negBuckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val rows = run()
    rows.toSeq shouldBe run().toSeq // deterministic, no RNG
    val byAnchor = rows.groupBy(_._1)
    byAnchor.keySet shouldBe Set(7L, 107L, 207L, 307L, 407L)
    byAnchor.values.foreach { ts =>
      val negs = ts.filter(_._2 == "neg").map(_._4).toSet
      val poss = ts.filter(_._2 == "pos").map(_._4).toSet
      negs.size shouldBe 3 // the 1/B pool still fills kNeg
      negs.intersect(poss) shouldBe empty
      negs should not contain ts.head._1
    }
  }
}
