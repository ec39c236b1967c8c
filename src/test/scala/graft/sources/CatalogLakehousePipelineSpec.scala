package graft.sources

import graft.SparkFixture
import graft.operators.VersionedStore
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** End-to-end witness that a user can run a WHOLE lakehouse
  * pipeline on catalog tables alone — no registry calls, no store
  * API, only the standard Spark surfaces: CREATE TABLE →
  * writeStream.toTable ingestion → MERGE corrections → OPTIMIZE →
  * time travel → CTAS rollup → readStream.table tailing →
  * store_changes audit → DROP. Every mutation is ONE commit
  * (counts pinned), and the whole flow is the reference pipeline's
  * ingest→transform→serve shape re-expressed on the commit log.
  */
class CatalogLakehousePipelineSpec extends AnyFunSuite
    with SparkFixture with Matchers {

  test("the full pipeline runs on catalog tables alone: stream " +
      "ingest, MERGE, OPTIMIZE, time travel, CTAS, change tailing, " +
      "DROP — with commit counts pinned at every step") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-plake-wh").toString
    spark.conf.set("spark.sql.catalog.plake",
      "graft.sources.GraftStoreCatalog")
    spark.conf.set("spark.sql.catalog.plake.root", root)
    val s = spark
    import s.implicits._

    // 1. declare the table (v1 = schema anchor) with properties
    spark.sql("CREATE TABLE plake.events (id BIGINT, body STRING, " +
      "score BIGINT) USING `graft-store` " +
      "TBLPROPERTIES ('team'='ingest')")
    val p = s"$root/events"
    VersionedStore.latestVersion(spark, p) shouldBe 1L

    // 2. streaming ingest through the standard sink — each drained
    // window is ONE txn-tagged commit
    val in = java.nio.file.Files
      .createTempDirectory("graft-plake-in").toString
    val ck = java.nio.file.Files
      .createTempDirectory("graft-plake-ck").toString
    def drop(r: Range): Unit =
      r.map(i => (i.toLong, s"doc-$i", (i % 7).toLong))
        .toDF("id", "body", "score")
        .coalesce(1).write.mode("append").parquet(in)
    def ingest(): Unit = {
      val q = spark.readStream
        .schema("id BIGINT, body STRING, score BIGINT").parquet(in)
        .writeStream.option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger
          .AvailableNow())
        .toTable("plake.events")
      q.awaitTermination(60000) shouldBe true
    }
    drop(0 until 40); ingest()                               // v2
    drop(40 until 60); ingest()                              // v3
    VersionedStore.latestVersion(spark, p) shouldBe 3L
    spark.table("plake.events").count() shouldBe 60L

    // 3. a corrections MERGE — conditional per-column, ONE commit
    Seq((3L, 100L), (7L, 0L), (900L, 5L)).toDF("id", "new_score")
      .createOrReplaceTempView("plake_fix")
    spark.sql(
      """MERGE INTO plake.events t USING plake_fix s ON t.id = s.id
        |WHEN MATCHED AND s.new_score > t.score
        |  THEN UPDATE SET score = s.new_score
        |WHEN NOT MATCHED THEN
        |  INSERT (id, body, score) VALUES (s.id, 'late', s.new_score)
        |""".stripMargin)                                    // v4
    VersionedStore.latestVersion(spark, p) shouldBe 4L
    val byId = spark.table("plake.events")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    byId(3L) shouldBe 100L
    byId(7L) shouldBe 0L   // condition false → untouched
    byId(900L) shouldBe 5L
    byId.size shouldBe 61

    // 4. OPTIMIZE folds the ingest fragments — one commit
    spark.sql("OPTIMIZE plake.events")                       // v5
    VersionedStore.latestVersion(spark, p) shouldBe 5L

    // 5. time travel reproduces every stage
    spark.sql("SELECT count(*) FROM plake.events VERSION AS OF 2")
      .head.getLong(0) shouldBe 40L
    spark.sql("SELECT score FROM plake.events VERSION AS OF 3 " +
      "WHERE id = 3").head.getLong(0) shouldBe 3L

    // 6. CTAS rollup — a second catalog table born from the first
    spark.sql("CREATE TABLE plake.by_score USING `graft-store` AS " +
      "SELECT score, count(*) AS n FROM plake.events GROUP BY score")
    spark.sql("SELECT sum(n) FROM plake.by_score")
      .head.getLong(0) shouldBe 61L

    // 7. the audit trail and the downstream tail both come from
    // the same commit log: store_changes for the merge window,
    // readStream.table for the append feed
    spark.sql("SELECT _change, count(*) AS n FROM " +
      "store_changes('plake.events', 3, 4) GROUP BY _change")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      // id 3 updated (delete old + insert new) + id 900 inserted;
      // id 7's condition was false, so its carried-through row NETS
      // OUT of the feed even though its group was rewritten
      .toMap shouldBe Map("insert" -> 2L, "delete" -> 1L)
    val tail = spark.readStream
      .option("skipChangeCommits", "true").table("plake.events")
      .writeStream.format("memory").queryName("plake_tail")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-plake-ck2").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(100L))
      .start()
    try {
      val t0 = System.currentTimeMillis()
      // the fresh tail's first batch is the CURRENT snapshot (61
      // live rows — vacuum-safe, no history replay), then appends
      while (spark.table("plake_tail").count() < 61L &&
        System.currentTimeMillis() - t0 < 60000) Thread.sleep(100)
      spark.table("plake_tail").count() shouldBe 61L
      spark.sql("INSERT INTO plake.events VALUES (901, 'fresh', 9)")
      val t1 = System.currentTimeMillis()
      while (spark.table("plake_tail").count() < 62L &&
        System.currentTimeMillis() - t1 < 60000) Thread.sleep(100)
      spark.table("plake_tail").count() shouldBe 62L
    } finally if (tail.isActive) tail.stop()

    // 8. teardown through the catalog
    spark.sql("DROP TABLE plake.by_score")
    spark.sql("DROP TABLE plake.events")
    spark.sql("SHOW TABLES IN plake").collect() shouldBe empty
  }
}
