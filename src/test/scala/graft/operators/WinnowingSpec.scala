package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Winnowing operator: parity with an independent in-memory reference
  * (paper semantics written directly: per-window min, ties →
  * rightmost) on random word sequences, plus the paper's two
  * guarantees — selection density and shared-run detection.
  */
class WinnowingSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private lazy val s0 = spark
  import s0.implicits._

  private val W = 4

  /** First 13 md5 hex chars of the gram → long, exactly as the Spark
    * side (md5 of UTF-8, lowercase hex) computes it.
    */
  private def h13(gram: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  /** Reference winnow: for every window of W consecutive trigram
    * hashes pick the min, rightmost on ties; return the distinct
    * (pos, hash) selection.
    */
  private def reference(ws: Seq[String]): Set[(Long, Long)] = {
    if (ws.size < 3) return Set.empty
    val hs = ws.sliding(3).map(g => h13(g.mkString(" "))).toVector
    (W - 1 until hs.size).flatMap { end =>
      val win = ((end - W + 1) to end).map(p => (hs(p), p))
      val minH = win.map(_._1).min
      val pos = win.filter(_._1 == minH).map(_._2).max
      Some((pos.toLong, hs(pos)))
    }.toSet
  }

  private def vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  test("equals the in-memory reference on random documents") {
    val rnd = new Random(7)
    val docs = (0L until 12L).map { id =>
      val n = 3 + rnd.nextInt(60)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = Winnowing.fingerprints(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
    docs.foreach { case (id, text) =>
      withClue(s"doc $id:") {
        got.getOrElse(id, Set.empty) shouldBe
          reference(text.split(" ").toSeq)
      }
    }
  }

  test("density stays within the paper's bounds on long documents") {
    val rnd = new Random(11)
    val n = 400
    val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val sel = Winnowing.fingerprints(Seq((1L, text)).toDF("doc_id", "text"))
      .collect()
    val positions = n - 2 // trigram count
    // selected DISTINCT positions out of `positions`: between 1/w
    // (a monotone run selects each min once) and 2/(w+1) expected —
    // allow slack above the expectation but enforce the hard floor
    sel.length should be >= (positions / W - 1)
    sel.length should be <= positions
  }

  test("any shared run of >= w+k-1 words yields a shared fingerprint") {
    val rnd = new Random(13)
    (1 to 5).foreach { seed =>
      val r2 = new Random(seed * 31)
      // a shared run of exactly w+k-1 = 6 words, embedded at random
      // offsets inside otherwise-unrelated noise
      val run = Seq.fill(W + 2)(vocab(r2.nextInt(vocab.size)))
      // DISJOINT noise vocabularies: the run is the only possible
      // source of shared trigrams, so a shared fingerprint proves
      // the run was detected, not a vocabulary coincidence
      val va = Vector("p", "q", "r", "s", "t")
      val vb = Vector("u", "v", "w", "x", "y")
      def noise(v: Vector[String], n: Int) =
        Seq.fill(n)(v(rnd.nextInt(v.size)))
      val a = (noise(va, 5 + r2.nextInt(20)) ++ run ++
        noise(va, 10)).mkString(" ")
      val b = (noise(vb, 3 + r2.nextInt(25)) ++ run ++
        noise(vb, 7)).mkString(" ")
      val fps = Winnowing.fingerprints(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      val fa = fps.filter(_._1 == 1L).map(_._2).toSet
      val fb = fps.filter(_._1 == 2L).map(_._2).toSet
      withClue(s"seed $seed: shared run $run:") {
        fa.intersect(fb) should not be empty
      }
    }
  }
}
