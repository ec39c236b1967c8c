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

  /** First 12 md5 hex chars of the gram → long, exactly as the Spark
    * side (md5 of UTF-8, lowercase hex, [[Winnowing.HashHexChars]])
    * computes it.
    */
  private def h12(gram: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, Winnowing.HashHexChars), 16)
  }

  /** Reference winnow: for every window of W consecutive trigram
    * hashes pick the min, rightmost on ties; return the distinct
    * (pos, hash) selection.
    */
  private def reference(ws: Seq[String]): Set[(Long, Long)] = {
    if (ws.size < 3) return Set.empty
    val hs = ws.sliding(3).map(g => h12(g.mkString(" "))).toVector
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

  test("selects correctly past the old 2048-position boundary") {
    // 2100 words -> 2098 trigram positions: in the pre-widened 11-bit
    // encoding (32767 - pos) would have stayed positive but the old
    // (2047 - pos) underflowed into the hash field and corrupted the
    // argmin silently. The widened 15-bit field must match the
    // in-memory reference across the boundary.
    val rnd = new Random(17)
    val ws = Seq.fill(2100)(vocab(rnd.nextInt(vocab.size)))
    val got = Winnowing.fingerprints(
        Seq((1L, ws.mkString(" "))).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .toSet
    got shouldBe reference(ws)
    got.map(_._1).max should be > 2047L
  }

  test("raises loudly when a position reaches MaxPos") {
    // Guard contract: pos >= 32768 must FAIL the job (raise_error),
    // not silently borrow bits from the hash field. Feed the packer a
    // synthetic hash sequence directly so the test doesn't need a
    // 32k-word document.
    val hashed = Seq((1L, 0, 42L), (1L, Winnowing.MaxPos.toInt, 7L))
      .toDF("doc_id", "pos", "h")
    val ex = intercept[Exception] {
      Winnowing.fingerprintsFromHashes(hashed, w = 2).collect()
    }
    // the raise_error surfaces wrapped in a task-failure chain
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    chain should include("MaxPos")
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
