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

  test("extension-built SQL functions equal their Column forms") {
    val spark = graft.SparkFixture.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftExtensions.registerAll(spark)
    val df = Seq("  Hello   World ", "mail me: a.b@x.io today")
      .toDF("t")
    df.createOrReplaceTempView("ext_t")
    val viaSql = spark
      .sql("SELECT fingerprint(t) f, redact_pii(t) r FROM ext_t")
      .collect()
    val viaCol = df.select(TextFunctions.fingerprint(col("t")).as("f"),
      TextFunctions.redactPii(col("t")).as("r")).collect()
    viaSql.map(_.getString(0)) shouldBe viaCol.map(_.getString(0))
    viaSql.map(_.getString(1)) shouldBe viaCol.map(_.getString(1))
    viaSql(1).getString(1) should include("[EMAIL]")
  }

  test("extension registers dot_double and bloom_might_contain, " +
      "drivable from pure SQL") {
    val spark = graft.SparkFixture.session
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    // dot_double via SQL
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("ext_v")
    spark.sql("SELECT dot_double(a, b) d FROM ext_v")
      .head().getDouble(0) shouldBe 11.0
    // bloom_might_contain via SQL: build a filter, splice its bytes in
    // as a literal (what BloomJoin does through the Column API)
    val dim = Seq(5L, 6L).toDF("dk")
    val filter = graft.operators.BloomJoin.buildFilter(dim, "dk")
    val bytes = BloomMightContainExpr.serialize(filter)
    import org.apache.spark.sql.functions.{col, lit, call_function}
    val probed = (1L to 10L).toDF("k")
      .filter(call_function("bloom_might_contain", lit(bytes), col("k")))
      .collect().map(_.getLong(0)).toSet
    probed should contain allOf (5L, 6L) // never a false negative
  }
}
