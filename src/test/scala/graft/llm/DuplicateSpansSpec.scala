package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Duplicate-span detection (ExactSubstr-style) on hand-built corpora
  * where the maximal spans are known by construction.
  */
class DuplicateSpansSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // "a b c d e f" shared verbatim between docs 1 and 2, embedded in
  // otherwise-unique text. k=3: duplicated grams are every 3-gram of
  // the shared run -> one maximal span each covering exactly it.
  private val shared = "a b c d e f"
  private def corpus = docs(
    1L -> s"u1 u2 u3 $shared v1 v2 v3",
    2L -> s"w1 $shared x1 x2 x3 x4 x5",
    3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9")

  test("spans finds exactly the shared run in both docs") {
    val sp = DuplicateSpans.spans(corpus, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // doc 1: shared run is tokens 4..9; doc 2: tokens 2..7.
    sp shouldBe Array((1L, 4L, 9L), (2L, 2L, 7L))
  }

  test("coverage reports exact token counts and ratio") {
    val row = DuplicateSpans.coverage(corpus, 3)
      .filter("doc_id = 1").collect().head
    row.getLong(1) shouldBe 12L // n_tokens
    row.getLong(2) shouldBe 1L // n_spans
    row.getLong(3) shouldBe 6L // dup_tokens
    row.getLong(4) shouldBe 6L // max_span
    row.getDouble(5) shouldBe 0.5
  }

  test("within-document repetition is found too") {
    // "p q r" occurs twice inside one doc; k=3 -> both occurrences
    // are duplicated positions, two disjoint spans (gap > k).
    val d = docs(7L -> "p q r m1 m2 m3 m4 m5 p q r")
    val sp = DuplicateSpans.spans(d, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    sp shouldBe Array((1L, 3L), (9L, 11L))
  }

  test("overlapping duplicated grams merge into one maximal span") {
    // docs share "a b c d" AND "c d e f" (overlapping in doc 1's
    // "a b c d e f" region): islands merge into a single span.
    val d = docs(
      1L -> "a b c d e f t1 t2 t3",
      2L -> "s1 a b c d s2 s3 s4 s5",
      3L -> "r1 r2 c d e f r3 r4 r5")
    val sp = DuplicateSpans.spans(d, 3)
      .filter("doc_id = 1")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    sp shouldBe Array((1L, 6L))
  }

  test("docs shorter than k or with no duplicated grams emit nothing") {
    val d = docs(1L -> "a b", 2L -> "x y z w", 3L -> "q r s t")
    DuplicateSpans.spans(d, 3).count() shouldBe 0L
  }

  test("keep-first spans exempt the canonical copy of an exact pair") {
    // docs 1 and 2 are identical: symmetric spans cover BOTH fully;
    // keep-first covers only doc 2 (doc 1 holds every gram's first
    // occurrence), so a removal decision always keeps one copy
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c d e f",
      3L -> "z1 z2 z3 z4 z5")
    DuplicateSpans.spans(d, 3)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    val kf = DuplicateSpans.spansKeepFirst(d, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    kf.toSeq shouldBe Seq((2L, 1L, 6L))
  }

  test("within-doc repetition keeps its first occurrence too") {
    val d = docs(7L -> "p q r m1 m2 m3 m4 m5 p q r")
    val kf = DuplicateSpans.spansKeepFirst(d, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    kf.toSeq shouldBe Seq((9L, 11L)) // second occurrence only
  }
}
