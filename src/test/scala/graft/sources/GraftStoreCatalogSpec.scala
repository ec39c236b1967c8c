package graft.sources

import graft.SparkFixture
import graft.operators.VersionedStore
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Stores as REAL catalog tables ([[GraftStoreCatalog]]): CREATE /
  * SHOW / SELECT / INSERT / writeTo / time travel / DROP all route
  * through the DSv2 catalog with the store's full write discipline,
  * commit counts pinned — and catalog reads get the store's NATIVE
  * parquet plan (the [[graft.plans.GraftCatalogRule]] swap), not an
  * opaque RDD fallback.
  */
class GraftStoreCatalogSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private lazy val root: String = {
    val r = java.nio.file.Files
      .createTempDirectory("graft-catalog-wh").toString
    spark.conf.set("spark.sql.catalog.lake",
      "graft.sources.GraftStoreCatalog")
    spark.conf.set("spark.sql.catalog.lake.root", r)
    r
  }

  test("CREATE TABLE ... USING `graft-store` declares the schema as " +
      "the empty store's first commit; SHOW TABLES lists it; the " +
      "first INSERT must MATCH the declared schema (one commit)") {
    root
    spark.sql("CREATE TABLE lake.docs (id BIGINT, body STRING, " +
      "g BIGINT) USING `graft-store`")
    spark.sql("SHOW TABLES IN lake").collect()
      .map(_.getString(1)) should contain("docs")
    // v1 = the schema anchor; the empty table serves its shape
    VersionedStore.latestVersion(spark, s"$root/docs") shouldBe 1L
    val empty = spark.table("lake.docs")
    empty.schema.fieldNames.toSeq shouldBe Seq("id", "body", "g")
    empty.count() shouldBe 0L
    // CREATE over an existing table is loud
    intercept[Exception] {
      spark.sql("CREATE TABLE lake.docs (x INT) USING `graft-store`")
    }
    spark.sql(
      "INSERT INTO lake.docs VALUES (0, 'a', 10), (1, 'b', 20)")
    VersionedStore.latestVersion(spark, s"$root/docs") shouldBe 2L
    spark.sql("SELECT sum(g) FROM lake.docs").head.getLong(0)
      .shouldBe(30L)
    // a wrong-shape insert is rejected by the declared schema
    intercept[Exception] {
      spark.sql("INSERT INTO lake.docs VALUES (2, 'c')")
    }
    VersionedStore.latestVersion(spark, s"$root/docs") shouldBe 2L
  }

  test("namespaces are directory levels: CREATE NAMESPACE / " +
      "qualified tables / SHOW TABLES IN lake.ns / DROP NAMESPACE") {
    root
    spark.sql("CREATE NAMESPACE lake.ns1")
    spark.sql(
      "CREATE TABLE lake.ns1.t1 (id BIGINT) USING `graft-store`")
    spark.sql("SHOW TABLES IN lake.ns1").collect()
      .map(_.getString(1)).toSeq shouldBe Seq("t1")
    spark.sql("INSERT INTO lake.ns1.t1 VALUES (7)")
    spark.table("lake.ns1.t1").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(7L)
    intercept[Exception] { // non-empty namespace needs CASCADE
      spark.sql("DROP NAMESPACE lake.ns1")
    }
    spark.sql("DROP NAMESPACE lake.ns1 CASCADE")
    spark.sql("SHOW TABLES IN lake").collect()
      .map(_.getString(1)) should not contain "t1"
  }

  test("df.writeTo(...).append() and INSERT OVERWRITE route " +
      "through the store's write discipline — ONE commit each, " +
      "overwrite atomic, ANSI-aligned by Spark's v2 resolution") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE lake.wt (id BIGINT, body STRING) " +
      "USING `graft-store`")
    val p = s"$root/wt"
    Seq((1L, "x"), (2L, "y")).toDF("id", "body")
      .writeTo("lake.wt").append()
    VersionedStore.latestVersion(spark, p) shouldBe 2L // anchor + 1
    // v2 writes resolve BY NAME: reordered columns land correctly
    Seq(("z", 3L)).toDF("body", "id").writeTo("lake.wt").append()
    VersionedStore.latestVersion(spark, p) shouldBe 3L
    spark.table("lake.wt").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(1L -> "x", 2L -> "y", 3L -> "z")
    // INSERT OVERWRITE: ONE atomic commit replaces the content
    spark.sql("INSERT OVERWRITE lake.wt VALUES (9, 'only')")
    VersionedStore.latestVersion(spark, p) shouldBe 4L
    spark.table("lake.wt").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((9L, "only"))
    // time travel below the overwrite serves the old rows
    spark.sql("SELECT count(*) FROM lake.wt VERSION AS OF 3")
      .head.getLong(0) shouldBe 3L
  }

  test("the store's constraint gate holds through the catalog " +
      "write path: a violating INSERT aborts with nothing " +
      "committed") {
    root
    spark.sql("CREATE TABLE lake.con (id BIGINT, g BIGINT) " +
      "USING `graft-store`")
    val p = s"$root/con"
    VersionedStore.setConstraints(spark, p,
      Seq(graft.check.NonNegative("g")))
    spark.sql("INSERT INTO lake.con VALUES (1, 5)")
    val before = VersionedStore.latestVersion(spark, p)
    intercept[Exception] {
      spark.sql("INSERT INTO lake.con VALUES (2, -3)")
    }.getMessage.toLowerCase should include("constraint")
    VersionedStore.latestVersion(spark, p) shouldBe before
    spark.table("lake.con").count() shouldBe 1L
  }

  test("catalog reads run the store's NATIVE parquet plan (the " +
      "analyzer swap), not the V1Scan RDD fallback") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE lake.planned (id BIGINT, g BIGINT) " +
      "USING `graft-store`")
    Seq((1L, 2L), (3L, 4L)).toDF("id", "g")
      .writeTo("lake.planned").append()
    val df = spark.table("lake.planned").where("g > 2").select("id")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("parquet")       // native file scan
    (plan should not).include("RowDataSourceScan") // the V1 fallback
    df.collect().map(_.getLong(0)).toSeq shouldBe Seq(3L)
  }

  test("CTAS: CREATE TABLE ... USING `graft-store` AS SELECT lands " +
      "as a store with the query's rows and ONE data commit") {
    root
    spark.sql("CREATE TABLE lake.ctas USING `graft-store` AS " +
      "SELECT id, id * 2 AS dbl FROM range(5)")
    spark.table("lake.ctas").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq shouldBe
      (0L until 5L).map(i => (i, i * 2))
    VersionedStore.latestVersion(spark, s"$root/ctas") should be <= 2L
  }

  test("DROP TABLE refuses while a sibling is cloned from it; " +
      "dropping the clone first releases the source") {
    root
    spark.sql("CREATE TABLE lake.src (id BIGINT) USING `graft-store`")
    spark.sql("INSERT INTO lake.src VALUES (1), (2), (3)")
    VersionedStore.cloneTo(spark, s"$root/src", s"$root/cl")
    spark.sql("SHOW TABLES IN lake").collect()
      .map(_.getString(1)) should contain("cl")
    intercept[Exception] {
      spark.sql("DROP TABLE lake.src")
    }.getMessage should include("cloned")
    spark.table("lake.src").count() shouldBe 3L // refusal = no-op
    spark.sql("DROP TABLE lake.cl")
    spark.sql("DROP TABLE lake.src")
    spark.sql("SHOW TABLES IN lake").collect()
      .map(_.getString(1)) should contain noneOf ("src", "cl")
  }

  test("time travel through the catalog's versioned loadTable: " +
      "VERSION AS OF and TIMESTAMP AS OF resolve store versions") {
    root
    spark.sql("CREATE TABLE lake.tt (id BIGINT) USING `graft-store`")
    spark.sql("INSERT INTO lake.tt VALUES (1)")   // v2
    spark.sql("INSERT INTO lake.tt VALUES (2)")   // v3
    spark.sql("SELECT count(*) FROM lake.tt VERSION AS OF 2")
      .head.getLong(0) shouldBe 1L
    spark.sql("SELECT count(*) FROM lake.tt VERSION AS OF 3")
      .head.getLong(0) shouldBe 2L
    // TIMESTAMP AS OF now = latest
    spark.sql("SELECT count(*) FROM lake.tt TIMESTAMP AS OF " +
      "current_timestamp()").head.getLong(0) shouldBe 2L
  }
}
