package graft.ingest

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for header normalization (SURVEY.md §5 test plan:
  * "schema inference (header row → all-string schema, 'Unnamed: 0'
  * rename)").
  */
class SchemaInferencePropSpec extends AnyFunSuite with Matchers {

  private val headerGen: Gen[List[String]] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.const("Unnamed: 0"),
    Gen.const("_c0"),
    Gen.const(""),
    Gen.const("   ")))

  test("property: normalization is idempotent and total") {
    val prop = Prop.forAll(headerGen) { cols =>
      val once = SchemaInference.normalizeHeader(cols)
      val twice = SchemaInference.normalizeHeader(once)
      once == twice &&                       // idempotent
        once.length == cols.length &&        // length-preserving
        !once.exists(_.trim.isEmpty) &&      // no empty names survive
        !once.contains("Unnamed: 0") && !once.contains("_c0")
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
      .passed shouldBe true
  }

  test("property: named columns pass through untouched") {
    val named = Gen.nonEmptyListOf(
      Gen.identifier.map(_.take(15)).suchThat(c =>
        c.nonEmpty && c != "Unnamed: 0" && c != "_c0"))
    val prop = Prop.forAll(named) { cols =>
      SchemaInference.normalizeHeader(cols) == cols
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
      .passed shouldBe true
  }
}
