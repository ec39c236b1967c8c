package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Column drop as log-carried column mapping — the dual of
  * [[RenameEvolutionSpec]]: one metadata commit shrinks the table
  * schema, no file-group is read or rewritten, old groups keep their
  * physical bytes (time travel still serves them), and the dropped
  * name can never be reused. Also pins the SCHEMA ANCHOR that
  * restore/clone commits carry: without it, a restore to a version
  * whose newest schema-bearing commit was a pure-metadata
  * rename/drop resurrected the pre-rename name / pre-drop column.
  */
class DropEvolutionSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-drop").toString +
      "/store"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", i % 5)).toDF("id", "body", "g")
  }

  test("drop is ONE metadata commit: the column vanishes from " +
      "latest reads, old groups stay readable, time travel serves " +
      "it pre-drop, and later writes compose without it") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 20), p)              // v1
    val v2 = VersionedStore.dropColumn(spark, p, "g")        // v2
    v2 shouldBe 2L
    // a drop adds NO file-group — pure metadata
    VersionedStore.history(spark, p)
      .where(col("action") === "drop").count() shouldBe 1L
    VersionedStore.history(spark, p)
      .where(col("action") === "add").count() shouldBe 1L
    // latest serves the shrunk schema over the OLD bytes
    val cur = VersionedStore.read(spark, p)
    cur.columns.toSeq shouldBe Seq("id", "body")
    cur.count() shouldBe 20L
    // time travel BELOW the drop still serves the column
    val v1 = VersionedStore.readAt(spark, p, 1L)
    v1.columns.toSeq shouldBe Seq("id", "body", "g")
    v1.where(col("g") === 2).count() shouldBe 4L
    // post-drop writes carry the shrunk schema
    VersionedStore.append(
      (100 until 110).map(i => (i.toLong, s"doc-$i"))
        .toDF("id", "body"), p)                              // v3
    VersionedStore.read(spark, p).count() shouldBe 30L
    // a batch still carrying the dropped column is rejected as a
    // retired-name reuse, never silently projected away
    intercept[Exception] {
      VersionedStore.append(batch(200 until 205), p, evolve = true)
    }.getMessage should include("renamed-away or dropped")
    // keyed mutations compose on the shrunk schema
    VersionedStore.merge(spark, p,
      Seq((5L, "upd")).toDF("id", "body"), Seq("id"))        // v4+
    VersionedStore.read(spark, p)
      .where(col("id") === 5).select("body")
      .head.getString(0) shouldBe "upd"
  }

  test("drop of a RENAMED column retires both names; compaction " +
      "after the drop rewrites cleanly with propagated metadata " +
      "naming the retired lineage") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    // zones armed on the column that will be dropped AND on the key
    VersionedStore.append(batch(0 until 10), p,
      zoneCols = Seq("id", "g"))                             // v1
    VersionedStore.renameColumn(spark, p, "g", "grp")        // v2
    VersionedStore.dropColumn(spark, p, "grp")               // v3
    VersionedStore.read(spark, p).columns.toSeq shouldBe
      Seq("id", "body")
    // propagation now carries zone col `g` (physical, retired) —
    // an append and a compaction must skip it, not crash on it
    VersionedStore.append(
      (10 until 20).map(i => (i.toLong, s"doc-$i"))
        .toDF("id", "body"), p)                              // v4
    VersionedStore.compact(spark, p)                         // v5
    val r = VersionedStore.read(spark, p)
    r.columns.toSeq shouldBe Seq("id", "body")
    r.count() shouldBe 20L
    // neither retired name can come back, under either operation
    intercept[Exception] {
      VersionedStore.renameColumn(spark, p, "body", "grp")
    }.getMessage should include("already used")
    intercept[Exception] {
      VersionedStore.renameColumn(spark, p, "body", "g")
    }.getMessage should include("already used")
    intercept[Exception] {
      VersionedStore.append(
        Seq((99L, "x", 1)).toDF("id", "body", "g"), p,
        evolve = true)
    }.getMessage should include("renamed-away or dropped")
  }

  test("restore ACROSS a drop resurrects the column, and restore " +
      "TO the drop version keeps it dropped — the schema anchor " +
      "pins the restored version's exact schema even when the " +
      "newest schema-bearing commit there was pure metadata") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)              // v1
    VersionedStore.dropColumn(spark, p, "g")                 // v2
    VersionedStore.append(batch(10 until 20).drop("g"), p)   // v3
    // restore to the PRE-drop version: column back, values intact
    VersionedStore.restore(spark, p, 1L)                     // v4
    val back = VersionedStore.read(spark, p)
    back.columns.toSeq shouldBe Seq("id", "body", "g")
    back.count() shouldBe 10L
    back.where(col("g") === 1).count() shouldBe 2L
    // restore FORWARD to v2 (the drop version, whose only schema
    // carrier is the drop record itself): without the anchor the
    // restore commit's republished add records (pre-drop schemas)
    // would resurrect `g`
    VersionedStore.restore(spark, p, 2L)                     // v5
    val fwd = VersionedStore.read(spark, p)
    fwd.columns.toSeq shouldBe Seq("id", "body")
    fwd.count() shouldBe 10L
  }

  test("restore to a version whose newest schema commit is a " +
      "pure-metadata RENAME serves the renamed schema (the anchor's " +
      "rename-side case)") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)              // v1
    VersionedStore.renameColumn(spark, p, "g", "grp")        // v2
    VersionedStore.append(batch(10 until 20)
      .withColumnRenamed("g", "grp"), p)                     // v3
    // restore to v2: rename is v2's newest schema-bearing record —
    // the republished v1 add records carry the OLD name
    VersionedStore.restore(spark, p, 2L)                     // v4
    val r = VersionedStore.read(spark, p)
    r.columns.toSeq shouldBe Seq("id", "body", "grp")
    r.count() shouldBe 10L
    r.where(col("grp").isNull).count() shouldBe 0L
  }

  test("a clone of a version whose newest schema commit is a drop " +
      "serves the dropped schema (the anchor travels with clones)") {
    val src = freshPath(); val dst = freshPath()
    VersionedStore.create(spark, src)
    VersionedStore.append(batch(0 until 10), src)            // v1
    VersionedStore.dropColumn(spark, src, "g")               // v2
    VersionedStore.cloneTo(spark, src, dst)
    val r = VersionedStore.read(spark, dst)
    r.columns.toSeq shouldBe Seq("id", "body")
    r.count() shouldBe 10L
    // and the clone's own writes carry the shrunk schema
    val s = spark
    import s.implicits._
    VersionedStore.append(
      Seq((100L, "clone-only")).toDF("id", "body"), dst)
    VersionedStore.read(spark, dst).count() shouldBe 11L
  }

  test("a constraint referencing the column gates the drop until " +
      "released; guard-rail rejections stay loud") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    VersionedStore.setConstraints(spark, p,
      Seq(graft.check.NonNegative("g")))
    intercept[Exception] {
      VersionedStore.dropColumn(spark, p, "g")
    }.getMessage should include("constraint")
    VersionedStore.setConstraints(spark, p, Seq.empty)
    VersionedStore.dropColumn(spark, p, "g")
    VersionedStore.read(spark, p).columns.toSeq shouldBe
      Seq("id", "body")
    // dropping a column that does not exist
    intercept[Exception] {
      VersionedStore.dropColumn(spark, p, "nope")
    }
    // a table cannot drop to zero columns
    VersionedStore.dropColumn(spark, p, "body")
    intercept[Exception] {
      VersionedStore.dropColumn(spark, p, "id")
    }.getMessage should include("only column")
  }

  test("CDC across a drop window compares like with like under the " +
      "post-drop schema: rows whose only difference was the dropped " +
      "column cancel, true inserts travel") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)              // v1
    VersionedStore.dropColumn(spark, p, "g")                 // v2
    VersionedStore.append(
      Seq((100L, "new")).toDF("id", "body"), p)              // v3
    val feed = VersionedStore.changes(spark, p, 1L, 3L)
    // the carried group's 10 rows cancel (same id/body both sides);
    // only the genuine insert travels — and under the v3 schema
    feed.columns.toSet shouldBe Set("id", "body", "_change")
    feed.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("_change"))).toSeq shouldBe
      Seq((100L, "insert"))
  }
}
