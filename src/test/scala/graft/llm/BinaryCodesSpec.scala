package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Gate for the binary-quantization rung (q260–q262's production
  * API): the packed-word Hamming distance must equal the directly
  * counted number of dimensions whose signs differ — over randomized
  * vectors (fixed seed), exact zeros, and sign patterns that set the
  * top bit of a 32-bit word.
  */
class BinaryCodesSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def signBit(x: Float): Int = if (x >= 0) 1 else 0

  test("hamming distance equals per-dimension sign disagreement count") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // vec 0 is the query; 1..32 randomized (zeros forced in to probe
    // the >= 0 boundary), 33 all-negative, 34 = query (distance 0)
    val vecs: Seq[(Long, Array[Float])] =
      (0L to 32L).map { id =>
        id -> Array.tabulate(64) { i =>
          if ((i + id) % 7 == 0) 0.0f else rnd.nextFloat() * 8f - 4f
        }
      } ++ Seq(33L -> Array.fill(64)(-1.0f))
    val all = vecs :+ (34L -> vecs.head._2.clone)
    val emb = all.toDF("vec_id", "embedding")
    val got = EmbeddingSearch.hammingTopK(s, emb, queryId = 0L, k = 40)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val q = all.head._2
    all.drop(1).foreach { case (id, v) =>
      val want = q.zip(v).count { case (x, y) => signBit(x) != signBit(y) }
      withClue(s"vec $id:") { got(id) shouldBe want }
    }
    got(34L) shouldBe 0
  }

  test("binaryRerankTopK with a full-corpus shortlist equals brute force") {
    val s = spark
    val emb = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
    val got = EmbeddingSearch
      .binaryRerankTopK(s, emb, queryId = 0L, k = 5, shortlist = 10000)
      .collect().map(_.getLong(0))
    val want = EmbeddingSearch.bruteForceTopK(s, emb, queryId = 0L, k = 5)
      .collect().map(_.getLong(0))
    got shouldBe want
  }

  test("codes pack 64 dims into two words; full flip lands at 64") {
    val s = spark
    import s.implicits._
    val v = Array.tabulate(64)(i => if (i % 3 == 0) -1.0f else 1.0f)
    val emb = Seq((0L, v), (1L, v), (2L, v.map(x => -x)))
      .toDF("vec_id", "embedding")
    val codes = EmbeddingSearch.binaryCodes(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    codes(0L) shouldBe codes(1L)
    val top = EmbeddingSearch.hammingTopK(s, emb, queryId = 0L, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    top shouldBe Array((1L, 0), (2L, 64))
  }
}
