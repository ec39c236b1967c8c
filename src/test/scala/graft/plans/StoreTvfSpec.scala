package graft.plans

import graft.SparkFixture
import graft.operators.VersionedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Table-valued functions over store tables: `store_history`,
  * `store_describe`, `store_changes` — SQL observability with plain
  * composable relations (WHERE/GROUP BY/JOIN all work on them).
  */
class StoreTvfSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-tvf").toString +
      "/store"

  private def build(name: String): String = {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(
      (0 until 10).map(i => (i.toLong, s"d$i")).toDF("id", "body"),
      p)                                                     // v1
    VersionedStore.deleteWhere(spark, p, col("id") >= 8)     // v2
    VersionedStore.append(
      (100 until 103).map(i => (i.toLong, s"d$i"))
        .toDF("id", "body"), p)                              // v3
    VersionedStore.registerTable(spark, p, name)
    p
  }

  test("store_history is the commit log as a composable relation") {
    build("tvf_h")
    spark.sql(
      "SELECT count(*) AS n FROM store_history('tvf_h') " +
        "WHERE action = 'add'").head.getLong(0) shouldBe 3L
    // composability: aggregate over versions
    spark.sql(
      "SELECT CAST(max(version) AS BIGINT) AS v " +
        "FROM store_history('tvf_h')").head.getLong(0) shouldBe 3L
  }

  test("store_describe serves the table detail row") {
    build("tvf_d")
    val r = spark.sql(
      "SELECT n_live_groups, n_rows FROM store_describe('tvf_d')")
      .head
    r.getLong(0) shouldBe 2L // f2 (rewrite of f1) + f3
    r.getLong(1) shouldBe 11L // 8 survivors + 3 late
  }

  test("store_changes_keyed pairs rewritten keys into update " +
      "pre/post-images (the CDF vocabulary), straight from SQL") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(
      (0 until 6).map(i => (i.toLong, s"d$i")).toDF("id", "body"),
      p)                                                     // v1
    VersionedStore.merge(spark, p,
      Seq((2L, "updated"), (100L, "fresh")).toDF("id", "body"),
      Seq("id"))                                             // v2
    VersionedStore.registerTable(spark, p, "tvf_ck")
    val rows = spark.sql(
      "SELECT _change, CAST(count(*) AS BIGINT) AS n " +
        "FROM store_changes_keyed('tvf_ck', 1, 2, 'id') " +
        "GROUP BY _change ORDER BY _change").collect()
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("insert", 1L), ("update_postimage", 1L),
        ("update_preimage", 1L))
    spark.sql(
      "SELECT body FROM store_changes_keyed('tvf_ck', 1, 2, 'id') " +
        "WHERE _change = 'update_postimage'")
      .head.getString(0) shouldBe "updated"
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM store_changes_keyed('tvf_ck', 1, 2, '')")
    }
  }

  test("store_changes is the CDC window as a relation — filterable " +
      "and aggregatable like any table") {
    build("tvf_c")
    val rows = spark.sql(
      "SELECT _change, CAST(count(*) AS BIGINT) AS n " +
        "FROM store_changes('tvf_c', 1, 3) " +
        "GROUP BY _change ORDER BY _change").collect()
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("delete", 2L), ("insert", 3L))
    // a raw path works where no registration exists
    val p2 = build("tvf_c2")
    spark.sql(
      s"SELECT count(*) AS n FROM store_changes('$p2', 2, 3)")
      .head.getLong(0) shouldBe 3L
    // non-literal argument is rejected with a clear message
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM store_changes('tvf_c', 1, (SELECT 3))")
    }
  }
}
