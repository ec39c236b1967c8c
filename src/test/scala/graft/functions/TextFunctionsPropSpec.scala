package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for the text-pipeline primitives: the invariants a
  * dedup/fingerprint pass relies on, checked over generated corpora
  * (one Spark job per property, all samples in one DataFrame).
  */
class TextFunctionsPropSpec extends AnyFunSuite with SparkFixture
    with Matchers {
  import TextFunctions._

  private val token: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val sentence: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  /** Fixed-seed sampling: any failure reproduces on every run instead
    * of flaking (one full-suite run failed here nondeterministically;
    * a seeded stream makes the corpus identical across runs).
    */
  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(org.scalacheck.rng.Seed(42L))(_.next)
      .map(seed => g.apply(params, seed))
      .flatten.take(n).toSeq
  }

  test("property: trigram count is max(0, tokens - 2), every gram 3-token") {
    val s = spark
    import s.implicits._
    val texts = sample(sentence, 300).filter(_.nonEmpty)
    val rows = texts.toDF("text")
      .select(col("text"),
        org.apache.spark.sql.functions.size(words(col("text"))).as("n_tok"),
        trigrams(words(col("text"))).as("grams"))
      .collect()
    rows.foreach { r =>
      val nTok = r.getInt(1)
      val grams = r.getSeq[String](2)
      grams.length shouldBe math.max(0, nTok - 2)
      grams.foreach(g => g.split(" ", -1).length shouldBe 3)
    }
  }

  test("property: fingerprint is whitespace- and case-insensitive") {
    val s = spark
    import s.implicits._
    val pairs = sample(sentence, 200).filter(_.trim.nonEmpty).map { t =>
      val mangled = "  " + t.toUpperCase.replace(" ", "   ") + " "
      (t, mangled)
    }
    val rows = pairs.toDF("a", "b")
      .select(fingerprint(col("a")).as("fa"), fingerprint(col("b")).as("fb"))
      .collect()
    rows.foreach(r => r.getString(0) shouldBe r.getString(1))
  }

  test("property: redactPii is idempotent and preserves clean text") {
    val s = spark
    import s.implicits._
    val user = Gen.stringOfN(5, Gen.alphaNumChar)
    val withEmail = for {
      pre <- sentence; u <- user; post <- sentence
    } yield s"$pre $u@example.com $post"
    val texts = sample(Gen.oneOf(withEmail, sentence), 200)
    val rows = texts.toDF("t")
      .select(col("t"), redactPii(col("t")).as("r1"),
        redactPii(redactPii(col("t"))).as("r2"))
      .collect()
    rows.foreach { r =>
      r.getString(1) shouldBe r.getString(2) // idempotent
      if (!r.getString(0).contains("@"))
        r.getString(1) shouldBe r.getString(0) // clean text untouched
      else r.getString(1) should include("[EMAIL]")
    }
  }

  test("property: simhash fingerprints stay in range (16-bit and 60-bit)") {
    val s = spark
    import s.implicits._
    val texts = sample(sentence, 200).filter(_.trim.nonEmpty)
    val toks = texts.toDF("text")
      .select(monotonically_increasing_id().as("id"),
        explode(words(col("text"))).as("tok"))
    val a16 = simhashBitAggs(col("tok"))
    val r16 = toks.groupBy("id").agg(a16.head, a16.tail: _*)
      .select(simhashCombine((1 to 16).map(j => col(s"b$j"))).as("sh"))
      .collect().map(_.getLong(0))
    r16.foreach { v => v should be >= 0L; v should be <= 65535L }
    val a60 = simhashBitAggs60(col("tok"))
    val r60 = toks.groupBy("id").agg(a60.head, a60.tail: _*)
      .select(simhashCombine((1 to 60).map(j => col(s"b$j"))).as("sh"))
      .collect().map(_.getLong(0))
    r60.foreach { v => v should be >= 0L; v should be < (1L << 60) }
  }
}
