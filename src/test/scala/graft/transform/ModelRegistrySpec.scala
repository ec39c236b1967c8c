package graft.transform

import graft.SparkFixture
import graft.check.{NotNull, Unique}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Replicates the reference's dbt example project exactly:
  * my_first_dbt_model = `select 1 as id union all select null as id`,
  * materialized table (my_first_dbt_model.sql:10-18);
  * my_second_dbt_model = `select * from ref(first) where id = 1`, view
  * (my_second_dbt_model.sql:4-6); tests unique+not_null on both ids
  * (schema.yml:10-21) — not_null FAILS on the first model by design
  * until the commented filter is applied (my_first_dbt_model.sql:27).
  */
class ModelRegistrySpec extends AnyFunSuite with SparkFixture with Matchers {

  private def registry() = new ModelRegistry(spark)
    .register(Model("my_first_dbt_model", Table,
      _ => {
        val s = spark
        import s.implicits._
        Seq(Some(1), None).toDF("id")
      },
      tests = Seq(Unique(Seq("id")), NotNull("id"))))
    .register(Model("my_second_dbt_model", View,
      ref => ref("my_first_dbt_model").filter(col("id") === 1),
      tests = Seq(Unique(Seq("id")), NotNull("id"))))

  test("ref() resolves lineage; table and view materializations work") {
    val built = registry().run()
    built("my_first_dbt_model").count() shouldBe 2
    built("my_second_dbt_model").count() shouldBe 1
    // table is in the catalog, view is a temp view
    spark.catalog.tableExists("my_first_dbt_model") shouldBe true
    spark.sql("SELECT id FROM my_second_dbt_model").head().getInt(0) shouldBe 1
  }

  test("dbt-test semantics: first model's not_null fails by design, " +
      "second model passes (schema.yml:10-21)") {
    val results = registry().test()
    val first = results("my_first_dbt_model").map(r => r.check -> r.passed).toMap
    first("unique_id") shouldBe true
    first("notnull_id") shouldBe false // the reference's known-failing test
    results("my_second_dbt_model").forall(_.passed) shouldBe true
  }

  test("cycle detection") {
    val r = new ModelRegistry(spark)
      .register(Model("a", View, ref => ref("b")))
      .register(Model("b", View, ref => ref("a")))
    an[IllegalArgumentException] should be thrownBy r.run()
  }

  test("unknown ref") {
    val r = new ModelRegistry(spark)
      .register(Model("a", View, ref => ref("ghost")))
    an[IllegalArgumentException] should be thrownBy r.run()
  }
}
