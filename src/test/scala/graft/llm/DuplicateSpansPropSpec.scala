package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Randomized parity for duplicate-span detection: the distributed
  * gram-hash + gaps-and-islands pipeline must equal a brute-force
  * in-memory reference that literally collects k-gram strings,
  * counts them corpus-wide, and merges duplicated positions — the
  * reference reproduces the span SEMANTICS (maximal
  * overlap-or-adjacent merge), so any divergence in hashing,
  * position arithmetic, or island breaks fails exactly.
  */
class DuplicateSpansPropSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  /** Reference: spans of doc as (start, end) 1-based inclusive. */
  private def refSpans(docs: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val ws = text.split(" ")
      (0 to ws.length - k).map(i =>
        (id, i + 1L, ws.slice(i, i + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    grams.filter(g => counts(g._3) >= 2)
      .groupBy(_._1)
      .flatMap { case (id, gs) =>
        val pos = gs.map(_._2).sorted
        // merge overlapping-or-adjacent ranges [p, p+k-1]
        val spans = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long)]
        pos.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.length - 1) =
              (spans.last._1, math.max(spans.last._2, p + k - 1))
          else spans += ((p, p + k - 1))
        }
        spans.map { case (s, e) => (id, s, e) }
      }
      .toSet
  }

  test("spans equal the brute-force reference on random corpora") {
    val s = spark
    import s.implicits._
    // small vocabulary forces plenty of incidental duplication
    val vocab = Vector("a", "b", "c", "d", "e")
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val docs = (1L to 12L).map { id =>
        val n = 4 + rnd.nextInt(20)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = DuplicateSpans
        .spans(docs.toDF("doc_id", "text").repartition(4), 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      withClue(s"seed $seed:") {
        got shouldBe refSpans(docs, 3)
      }
    }
  }
}
