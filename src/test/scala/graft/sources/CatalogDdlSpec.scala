package graft.sources

import graft.SparkFixture
import graft.operators.VersionedStore
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Standard-DDL coverage over catalog tables beyond the main
  * GraftStoreCatalogSpec: `TRUNCATE TABLE` (one O(metadata)
  * retire-all commit — schema/properties/history stay) and
  * `CREATE OR REPLACE TABLE … AS SELECT` (Spark's non-staging
  * drop+create path — works end-to-end; atomic staged replace is
  * a recorded backlog item, not a silent approximation).
  */
class CatalogDdlSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private lazy val root: String = {
    val r = java.nio.file.Files
      .createTempDirectory("graft-ddl").toString + "/wh"
    spark.conf.set("spark.sql.catalog.ddlake",
      "graft.sources.GraftStoreCatalog")
    spark.conf.set("spark.sql.catalog.ddlake.root", r)
    r
  }

  test("TRUNCATE TABLE is one retire-all commit: rows go, schema " +
      "and properties stay, time travel still serves the old " +
      "content, the empty table accepts new inserts") {
    root
    spark.sql("CREATE TABLE ddlake.tr (id BIGINT, body STRING) " +
      "USING `graft-store` TBLPROPERTIES ('team'='search')")
    spark.sql("INSERT INTO ddlake.tr VALUES (1, 'a'), (2, 'b')")
    val p = s"$root/tr"
    val vBefore = VersionedStore.latestVersion(spark, p)
    spark.sql("TRUNCATE TABLE ddlake.tr")
    spark.table("ddlake.tr").count() shouldBe 0L
    // ONE commit, nothing rewritten
    VersionedStore.latestVersion(spark, p) shouldBe vBefore + 1
    // schema and properties survive
    spark.table("ddlake.tr").columns.toSeq shouldBe Seq("id", "body")
    VersionedStore.propertiesOf(spark, p)("team") shouldBe "search"
    // time travel below the truncate serves the old content
    spark.sql(s"SELECT count(*) FROM ddlake.tr VERSION AS OF " +
      s"$vBefore").head.getLong(0) shouldBe 2L
    // truncating the already-empty table is a no-op (no commit)
    spark.sql("TRUNCATE TABLE ddlake.tr")
    VersionedStore.latestVersion(spark, p) shouldBe vBefore + 1
    // the table lives on
    spark.sql("INSERT INTO ddlake.tr VALUES (3, 'c')")
    spark.table("ddlake.tr").collect().map(_.getLong(0))
      .toSeq shouldBe Seq(3L)
    // the DSv2 TruncatableTable interface directly — the path a
    // bare no-extensions session reaches (with extensions installed
    // the SQL verb above intercepts before TruncateTableExec)
    GraftStoreTable(p, None).truncateTable() shouldBe true
    spark.table("ddlake.tr").count() shouldBe 0L
  }

  test("CREATE OR REPLACE TABLE AS SELECT replaces schema and " +
      "content through the catalog (drop+create route)") {
    root
    spark.sql("CREATE TABLE ddlake.cr (id BIGINT) USING `graft-store`")
    spark.sql("INSERT INTO ddlake.cr VALUES (1)")
    spark.sql("CREATE OR REPLACE TABLE ddlake.cr USING " +
      "`graft-store` AS SELECT CAST(7 AS BIGINT) AS k")
    spark.table("ddlake.cr").columns.toSeq shouldBe Seq("k")
    spark.table("ddlake.cr").collect().map(_.getLong(0))
      .toSeq shouldBe Seq(7L)
  }
}
