package graft.plans

import graft.SparkFixture
import graft.operators.VersionedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL maintenance verbs ([[GraftSqlParser]] via `injectParser`):
  * OPTIMIZE / VACUUM / RESTORE over registered store tables route
  * to the lifecycle APIs with their exact semantics; unregistered
  * names and all other SQL fall through to Spark's parser verbatim.
  */
class StoreMaintenanceSqlSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-maint").toString +
      "/store"

  private def mk(name: String, batches: Int = 3): String = {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    (0 until batches).foreach { b =>
      VersionedStore.append(
        (0 until 10).map(i => (b * 100L + i, (i % 4).toLong))
          .toDF("id", "g"), p, statsCol = Some("id"))
    }
    VersionedStore.registerTable(spark, p, name)
    p
  }

  test("OPTIMIZE folds the store to one group in one commit; " +
      "ZORDER BY runs the clustered compaction; content identical") {
    val p = mk("maint_opt")
    val before = spark.sql(
      "SELECT * FROM maint_opt ORDER BY id").collect().toSeq
    val out = spark.sql("OPTIMIZE maint_opt").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(4L) // 3 appends + 1
    val h = VersionedStore.history(spark, p)
      .where(col("version") === 4)
    h.where(col("action") === "add").count() shouldBe 1L
    h.where(col("action") === "remove").count() shouldBe 3L
    spark.sql("SELECT * FROM maint_opt ORDER BY id")
      .collect().toSeq shouldBe before
    // z-order form: clustered multi-group compaction, one commit
    spark.sql("OPTIMIZE maint_opt ZORDER BY (id, g)")
      .head.getLong(0) shouldBe 5L
    spark.sql("SELECT * FROM maint_opt ORDER BY id")
      .collect().toSeq shouldBe before
    val h5 = VersionedStore.history(spark, p)
      .where(col("version") === 5 && col("action") === "add")
    h5.count() should be >= 1L
  }

  test("VACUUM RETAIN reclaims groups behind the age horizon; a " +
      "bare VACUUM without a retention policy reclaims NOTHING") {
    val p = mk("maint_vac")
    // no policy, no RETAIN: refuses to guess — zero reclaimed
    spark.sql("VACUUM maint_vac").head.getLong(0) shouldBe 0L
    spark.sql("OPTIMIZE maint_vac")
    // RETAIN 0 HOURS: everything behind the latest version goes
    val reclaimed = spark.sql("VACUUM maint_vac RETAIN 0 HOURS")
      .head.getLong(0)
    reclaimed shouldBe 3L // the three pre-compaction groups
    spark.sql("SELECT COUNT(*) AS n FROM maint_vac")
      .head.getLong(0) shouldBe 30L
  }

  test("TRUNCATE TABLE over a registered name is ONE retire-all " +
      "commit; schema survives, time travel serves the old rows") {
    val p = mk("maint_trunc")
    val vBefore = VersionedStore.latestVersion(spark, p)
    spark.sql("TRUNCATE TABLE maint_trunc")
      .head.getLong(0) shouldBe vBefore + 1
    spark.sql("SELECT COUNT(*) AS n FROM maint_trunc")
      .head.getLong(0) shouldBe 0L
    VersionedStore.readAt(spark, p, vBefore).count() shouldBe 30L
    // idempotent on the empty table: no new commit
    spark.sql("TRUNCATE TABLE maint_trunc")
      .head.getLong(0) shouldBe vBefore + 1
    // the table accepts fresh appends under the surviving schema
    val s2 = spark
    import s2.implicits._
    VersionedStore.append(Seq((900L, 1L)).toDF("id", "g"), p,
      statsCol = Some("id"))
    spark.sql("SELECT COUNT(*) AS n FROM maint_trunc")
      .head.getLong(0) shouldBe 1L
  }

  test("RESTORE TO VERSION AS OF rolls the table back as a NEW " +
      "commit — history is never rewritten") {
    val p = mk("maint_res")
    spark.sql("DELETE FROM maint_res WHERE id < 100")     // v4
    spark.sql("SELECT COUNT(*) AS n FROM maint_res")
      .head.getLong(0) shouldBe 20L
    val v = spark.sql("RESTORE maint_res TO VERSION AS OF 3")
      .head.getLong(0)
    v shouldBe 5L
    spark.sql("SELECT COUNT(*) AS n FROM maint_res")
      .head.getLong(0) shouldBe 30L
    // the bad version is still inspectable below the restore
    spark.sql(
      "SELECT COUNT(*) AS n FROM maint_res VERSION AS OF 4")
      .head.getLong(0) shouldBe 20L
    val _ = p
  }

  test("unregistered names and ordinary SQL fall through to " +
      "Spark's parser verbatim") {
    // ordinary SQL is untouched
    spark.sql("SELECT 1 AS one").head.getInt(0) shouldBe 1
    // the verb over an unregistered name reaches Spark's parser,
    // which rejects it as the unknown syntax it is there
    intercept[Exception] {
      spark.sql("OPTIMIZE not_a_registered_store")
    }
    intercept[Exception] {
      spark.sql("RESTORE not_a_registered_store TO VERSION AS OF 1")
    }
  }

  test("SHOW CREATE TABLE / DESCRIBE DETAIL / DESCRIBE HISTORY " +
      "over a registered store serve the DDL and the TVF surfaces; " +
      "the verbs over other names fall through to Spark") {
    val p = mk("maint_ddl")
    VersionedStore.setProperties(spark, p,
      Map("retention.ms" -> "86400000"))
    val stmt = spark.sql("SHOW CREATE TABLE maint_ddl")
      .head.getString(0)
    stmt should include("CREATE TABLE maint_ddl")
    stmt should include("`id` BIGINT")
    stmt should include("`g` BIGINT")
    stmt should include("USING graft-store")
    stmt should include("'retention.ms' = '86400000'")
    stmt should not include "PARTITIONED BY" // none declared
    // DESCRIBE DETAIL = store_describe's one-row summary
    val detail = spark.sql("DESCRIBE DETAIL maint_ddl")
    detail.columns.toSeq should contain allOf
      ("latest_version", "n_live_groups", "n_rows")
    detail.head.getAs[Long]("n_rows") shouldBe 30L
    detail.collect() shouldBe
      spark.sql("SELECT * FROM store_describe('maint_ddl')").collect()
    // DESCRIBE HISTORY = store_history's commit log
    val hist = spark.sql("DESCRIBE HISTORY maint_ddl")
    hist.count() shouldBe
      spark.sql("SELECT count(*) FROM store_history('maint_ddl')")
        .head.getLong(0)
    hist.columns should contain("version")
    // over a non-store name the verbs reach Spark's own parser
    intercept[Exception] {
      spark.sql("DESCRIBE DETAIL not_a_registered_store")
    }
    intercept[Exception] {
      spark.sql("SHOW CREATE TABLE not_a_registered_store")
    }
    // plain DESCRIBE of ordinary relations is untouched
    spark.sql("SELECT 1 AS one").createOrReplaceTempView("plain_v")
    spark.sql("DESCRIBE plain_v").count() should be >= 1L
  }

  test("a malformed verb over a REGISTERED name fails loudly with " +
      "the supported grammar, not a confusing catalog error") {
    mk("maint_mal")
    intercept[Exception] {
      spark.sql("OPTIMIZE maint_mal ZORDER BY id") // missing parens
    }.getMessage should include("supported forms")
    intercept[Exception] {
      spark.sql("RESTORE maint_mal TO VERSION 3") // missing AS OF
    }.getMessage should include("supported forms")
    intercept[Exception] {
      spark.sql("VACUUM maint_mal RETAIN 2 DAYS") // HOURS only
    }.getMessage should include("supported forms")
  }
}
