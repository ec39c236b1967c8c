package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Column rename as log-carried column mapping: one metadata commit
  * re-points the logical name while every file-group keeps its
  * physical name — old groups stay readable, new groups stay
  * physically uniform, time travel serves the old name at old
  * versions, and the zone/bloom pruning discipline survives the
  * rename untouched.
  */
class RenameEvolutionSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-ren").toString +
      "/store"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", i % 5)).toDF("id", "body", "g")
  }

  test("rename is ONE metadata commit: old groups readable under " +
      "the new name, later writes compose, time travel serves the " +
      "OLD name at old versions, and restore crosses it cleanly") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 20), p)                 // v1
    val v2 = VersionedStore.renameColumn(spark, p, "g", "grp")  // v2
    v2 shouldBe 2L
    // a rename adds NO file-group — pure metadata
    VersionedStore.history(spark, p)
      .where(col("action") === "rename").count() shouldBe 1L
    VersionedStore.history(spark, p)
      .where(col("action") === "add").count() shouldBe 1L
    // latest serves the new name over the OLD bytes
    val cur = VersionedStore.read(spark, p)
    cur.columns.toSeq shouldBe Seq("id", "body", "grp")
    cur.where(col("grp") === 2).count() shouldBe 4L
    // writes AFTER the rename use the new logical name and join the
    // same physical namespace
    VersionedStore.append(
      (100 until 110).map(i => (i.toLong, s"doc-$i", 9))
        .toDF("id", "body", "grp"), p)                          // v3
    val all = VersionedStore.read(spark, p)
    all.count() shouldBe 30L
    all.where(col("grp") === 9).count() shouldBe 10L
    all.where(col("grp") === 2).count() shouldBe 4L
    // time travel BELOW the rename serves the old name
    val v1 = VersionedStore.readAt(spark, p, 1L)
    v1.columns.toSeq shouldBe Seq("id", "body", "g")
    v1.where(col("g") === 2).count() shouldBe 4L
    // a keyed mutation on the renamed column's table still works
    VersionedStore.merge(spark, p,
      Seq((5L, "upd", 7)).toDF("id", "body", "grp"), Seq("id"))  // v4
    VersionedStore.read(spark, p)
      .where(col("id") === 5).select("grp")
      .head.getInt(0) shouldBe 7
    // restore to the PRE-rename version brings the old name back —
    // schema and mapping both resolve at the read version
    VersionedStore.restore(spark, p, 1L)
    val back = VersionedStore.read(spark, p)
    back.columns.toSeq shouldBe Seq("id", "body", "g")
    back.count() shouldBe 20L
  }

  test("pruning metadata survives the rename: zones and bloom " +
      "sidecars armed under the OLD name keep pruning reads keyed " +
      "on the NEW name") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    (0 until 4).foreach { i =>
      VersionedStore.append(
        batch(i * 100 until i * 100 + 100), p,
        zoneCols = Seq("id"), bloomCols = Seq("id"))
    }
    VersionedStore.renameColumn(spark, p, "id", "doc_id")
    val v = VersionedStore.latestVersion(spark, p)
    val nLive = VersionedStore.describe(spark, p)
      .head.getAs[Long]("n_live_groups").toInt
    // zone pruning through the new name
    VersionedStore.candidateFids(spark, p, v, "doc_id",
      0L, 50L).size should be < nLive
    // bloom point probe through the new name
    VersionedStore.pointCandidates(spark, p, v, "doc_id",
      123L).size should be <= 2
    VersionedStore.readPoint(spark, p, "doc_id", 123L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(123L)
    // range read through the new name
    VersionedStore.readRange(spark, p, "doc_id", 10L, 20L)
      .count() shouldBe 11L
  }

  test("deletion vectors cross the rename in both directions") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 20), p)
    // DV written BEFORE the rename masks reads AFTER it
    VersionedStore.deleteKeysDeferred(spark, p,
      Seq(3L).toDF("id"), Seq("id"))
    VersionedStore.renameColumn(spark, p, "id", "doc_id")
    VersionedStore.read(spark, p)
      .where(col("doc_id") === 3).count() shouldBe 0L
    // DV written AFTER the rename (new logical key name) masks too
    VersionedStore.deleteKeysDeferred(spark, p,
      Seq(4L).toDF("doc_id"), Seq("doc_id"))
    VersionedStore.read(spark, p).count() shouldBe 18L
    // and compaction folds both DVs without resurrecting anything
    VersionedStore.compact(spark, p)
    VersionedStore.read(spark, p).count() shouldBe 18L
  }

  test("name reuse is rejected: renaming TO any name the table " +
      "ever carried, and evolving-in a retired physical name, both " +
      "fail loudly") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    VersionedStore.renameColumn(spark, p, "g", "grp")
    // back to the retired name
    intercept[Exception] {
      VersionedStore.renameColumn(spark, p, "grp", "g")
    }.getMessage should include("already used")
    // renaming a column that does not exist
    intercept[Exception] {
      VersionedStore.renameColumn(spark, p, "nope", "x")
    }
    // evolving-in a column named like the retired physical name
    intercept[Exception] {
      VersionedStore.append(
        (5 until 6).map(i => (i.toLong, "b", 1, 0))
          .toDF("id", "body", "grp", "g"), p, evolve = true)
    }.getMessage should include("renamed-away or dropped")
    // a GENUINELY fresh evolved column still works
    VersionedStore.append(
      (5 until 6).map(i => (i.toLong, "b", 1, 0))
        .toDF("id", "body", "grp", "extra"), p, evolve = true)
    val r = VersionedStore.read(spark, p)
    r.columns.toSeq shouldBe Seq("id", "body", "grp", "extra")
    r.where(col("extra").isNull).count() shouldBe 5L
  }

  test("restore to a POST-rename version carries the mapping: the " +
      "renamed column serves every value, never NULLs (the restore " +
      "commit re-publishes the version's physical→logical pairs)") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)                 // v1
    VersionedStore.renameColumn(spark, p, "g", "grp")           // v2
    VersionedStore.append(batch(10 until 20)
      .withColumnRenamed("g", "grp"), p)                        // v3
    VersionedStore.renameColumn(spark, p, "grp", "bucket")      // v4
    VersionedStore.restore(spark, p, 3L)                        // v5
    val r = VersionedStore.read(spark, p)
    r.columns.toSeq shouldBe Seq("id", "body", "grp")
    r.count() shouldBe 20L
    // the bug this pins: a restore that ignored the mapping read
    // physical column `g` under logical `grp` as all-NULL
    r.where(col("grp").isNull).count() shouldBe 0L
    r.where(col("grp") === 1).count() shouldBe 4L
    // the store stays fully writable under the restored name
    VersionedStore.merge(spark, p,
      { val s = spark; import s.implicits._
        Seq((3L, "u", 8)).toDF("id", "body", "grp") }, Seq("id"))
    VersionedStore.read(spark, p)
      .where(col("id") === 3).select("grp").head.getInt(0) shouldBe 8
  }

  test("a clone of a renamed store carries the source's mapping: " +
      "cloned-in groups (physical names) serve the logical schema, " +
      "and copy-on-write writes compose") {
    val src = freshPath(); val dst = freshPath()
    VersionedStore.create(spark, src)
    VersionedStore.append(batch(0 until 10), src)
    VersionedStore.renameColumn(spark, src, "g", "grp")
    VersionedStore.append(batch(10 until 20)
      .withColumnRenamed("g", "grp"), src)
    VersionedStore.cloneTo(spark, src, dst)
    val r = VersionedStore.read(spark, dst)
    r.columns.toSeq shouldBe Seq("id", "body", "grp")
    r.count() shouldBe 20L
    r.where(col("grp").isNull).count() shouldBe 0L
    // clone diverges copy-on-write without touching the source
    VersionedStore.merge(spark, dst,
      { val s = spark; import s.implicits._
        Seq((0L, "clone-only", 9)).toDF("id", "body", "grp") },
      Seq("id"))
    VersionedStore.read(spark, dst)
      .where(col("id") === 0).select("grp").head.getInt(0) shouldBe 9
    VersionedStore.read(spark, src)
      .where(col("id") === 0).select("grp").head.getInt(0) shouldBe 0
  }

  test("OCC: an append rebasing over a WINNING rename aborts " +
      "loudly instead of silently reverting the rename's schema") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)                  // v1
    // writer A stages a group under v1's schema (still names `g`)…
    val oldSchema = batch(0 until 1).schema.json
    batch(5 until 10).write.parquet(s"$p/data/f50")
    // …and a rename WINS version 2 first
    VersionedStore.renameColumn(spark, p, "g", "grp")           // v2
    // A's stale attempt at v2 must abort on the schema guard during
    // its rebase — not land schema (…, g) over the rename
    val e = intercept[Exception] {
      VersionedStore.commitRetrying(spark, p,
        Seq(VersionedStore.GroupAdd(50L, 5L,
          schemaJson = Some(oldSchema))), Seq.empty, firstV = 2L)
    }
    e.getMessage should include("concurrent schema change")
    VersionedStore.read(spark, p).columns
      .toSeq shouldBe Seq("id", "body", "grp")
  }

  test("renames chain: two successive renames keep ONE physical " +
      "lineage, and every epoch's time travel serves its own name") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)                 // v1
    VersionedStore.renameColumn(spark, p, "g", "grp")           // v2
    VersionedStore.append(batch(10 until 20)
      .withColumnRenamed("g", "grp"), p)                        // v3
    VersionedStore.renameColumn(spark, p, "grp", "bucket")      // v4
    val cur = VersionedStore.read(spark, p)
    cur.columns.toSeq shouldBe Seq("id", "body", "bucket")
    cur.where(col("bucket") === 1).count() shouldBe 4L
    VersionedStore.readAt(spark, p, 1L).columns
      .toSeq shouldBe Seq("id", "body", "g")
    VersionedStore.readAt(spark, p, 3L).columns
      .toSeq shouldBe Seq("id", "body", "grp")
    // SQL time travel sees the same three epochs
    VersionedStore.registerTable(spark, p, "ren_store")
    spark.sql("SELECT bucket FROM ren_store WHERE id = 6")
      .head.getInt(0) shouldBe 1
    spark.sql("SELECT g FROM ren_store VERSION AS OF 1 WHERE id = 6")
      .head.getInt(0) shouldBe 1
  }
}
