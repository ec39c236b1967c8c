package graft.plans

import graft.SparkFixture
import graft.operators.VersionedStore
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL time travel sugar: `VERSION AS OF` / `TIMESTAMP AS OF` over
  * store views registered with `registerTable`, resolved by the
  * injected [[StoreTimeTravelRule]] (the fixture session is built
  * with `spark.sql.extensions = graft.functions.GraftExtensions`).
  */
class StoreTimeTravelSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-ttsql").toString +
      "/store"

  test("VERSION AS OF pins a commit version through plain SQL, " +
      "the bare name serves latest, and TIMESTAMP AS OF resolves " +
      "through persisted commit timestamps") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    def b(r: Range) = r.map(i => (i.toLong, s"d$i")).toDF("id", "body")
    VersionedStore.append(b(0 until 10), p)                     // v1
    VersionedStore.append(b(10 until 30), p)                    // v2
    VersionedStore.deleteKeys(spark, p,
      Seq(5L).toDF("id"), Seq("id"))                            // v3
    VersionedStore.registerTable(spark, p, "tt_store")
    spark.sql("SELECT COUNT(*) AS n FROM tt_store")
      .head.getLong(0) shouldBe 29L
    spark.sql(
      "SELECT COUNT(*) AS n FROM tt_store VERSION AS OF 1")
      .head.getLong(0) shouldBe 10L
    spark.sql(
      "SELECT COUNT(*) AS n FROM tt_store VERSION AS OF 2")
      .head.getLong(0) shouldBe 30L
    // joins across two pinned versions of ONE name
    spark.sql("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT id FROM tt_store VERSION AS OF 2) two
      LEFT ANTI JOIN (SELECT id FROM tt_store VERSION AS OF 1) one
        ON two.id = one.id""").head.getLong(0) shouldBe 20L
    // TIMESTAMP AS OF: between v1 and v2 commit instants → v1
    val hist = VersionedStore.commitTimestamps(spark, p)
    val t1 = hist(1L)
    val iso = java.time.Instant.ofEpochMilli(t1)
      .toString.replace("T", " ").stripSuffix("Z")
    spark.sql("SELECT COUNT(*) AS n FROM tt_store " +
      s"TIMESTAMP AS OF '$iso'").head.getLong(0) shouldBe 10L
    // an unregistered name still fails analysis normally
    intercept[Exception] {
      spark.sql("SELECT * FROM not_a_store VERSION AS OF 1").collect()
    }
    // a non-numeric version on a store view fails loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM tt_store VERSION AS OF 'abc'").collect()
    }
    e.getMessage should include("numeric commit version")
  }

  test("two-part (db.table) names resolve through the registry: " +
      "reads, time travel, DML, and TVFs all accept lake.docs") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    def b(r: Range) = r.map(i => (i.toLong, s"d$i")).toDF("id", "body")
    VersionedStore.append(b(0 until 10), p)                     // v1
    VersionedStore.append(b(10 until 30), p)                    // v2
    VersionedStore.registerTable(spark, p, "lake.docs")
    spark.sql("SELECT COUNT(*) AS n FROM lake.docs")
      .head.getLong(0) shouldBe 30L
    spark.sql(
      "SELECT COUNT(*) AS n FROM lake.docs VERSION AS OF 1")
      .head.getLong(0) shouldBe 10L
    spark.sql("DELETE FROM lake.docs WHERE id = 5")             // v3
    spark.sql("SELECT COUNT(*) AS n FROM lake.docs")
      .head.getLong(0) shouldBe 29L
    spark.sql("UPDATE lake.docs SET body = 'patched' WHERE id = 6")
    spark.sql("SELECT body FROM lake.docs WHERE id = 6")
      .head.getString(0) shouldBe "patched"
    // TVF args are plain strings — the same registry key works
    spark.sql("SELECT MAX(version) AS v FROM " +
      "store_history('lake.docs')").head.getLong(0) shouldBe 4L
    // MERGE with the two-part target (alias-qualified ON)
    Seq((6L, "merged"), (999L, "fresh")).toDF("id", "body")
      .createOrReplaceTempView("lake_docs_src")
    spark.sql(
      """MERGE INTO lake.docs AS t USING lake_docs_src AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("SELECT COUNT(*) AS n FROM lake.docs")
      .head.getLong(0) shouldBe 30L
    // three or more parts are rejected at registration
    intercept[Exception] {
      VersionedStore.registerTable(spark, p, "a.b.c")
    }.getMessage should include("two name parts")
  }
}
