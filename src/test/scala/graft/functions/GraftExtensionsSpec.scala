package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("extension registers cosine_fast with a 2-arg builder") {
    // apply to a fresh extensions container (what the session builder
    // does with spark.sql.extensions at startup)
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)

    val (ident, _, builder) = GraftExtensions.cosineFastDescriptor
    ident.funcName shouldBe "cosine_fast"
    an[IllegalArgumentException] should be thrownBy builder(Seq.empty)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = builder(Seq(Literal(1), Literal(2)))
    e shouldBe a[CosineSimilarityExpr]
  }
}
