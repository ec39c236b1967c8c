package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Merge-on-read deletion vectors: a point delete commits a KB-scale
  * key list and rewrites NOTHING; reads apply the mask; compaction
  * folds it away; CDC still emits the deletes row-for-row; vacuum
  * never reclaims a live DV (that would resurrect its rows); and the
  * fid-precedence rule makes re-insertion of a deleted key just work
  * through append or merge.
  */
class DeletionVectorSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-dv").toString +
      "/store"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", i % 5)).toDF("id", "body", "g")
  }

  private def keyDf(ks: Long*) = {
    val s = spark
    import s.implicits._
    ks.toSeq.toDF("id")
  }

  private def ids(path: String): Seq[Long] =
    VersionedStore.read(spark, path)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("a 3-key delete on a large group rewrites nothing: the " +
      "commit is one dv record, content masks the keys, history " +
      "shows zero group rewrites") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5000), p) // v1, f1
    val v = VersionedStore.deleteKeysDeferred(spark, p,
      keyDf(10L, 20L, 30L), Seq("id"))
    v shouldBe 2L
    ids(p) shouldBe (0L until 5000L).filterNot(Set(10L, 20L, 30L))
    // the commit added ONE dv record and removed nothing — the data
    // group was not touched
    val h = VersionedStore.history(spark, p)
      .filter(col("version") === 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    h.toSeq shouldBe Seq(("dv", 2L, 3L))
    // time travel: the pre-delete version still serves all rows
    VersionedStore.readAt(spark, p, 1L).count() shouldBe 5000L
    // describe: masked rows subtracted, dv group counted
    val d = VersionedStore.describe(spark, p).head
    d.getLong(d.fieldIndex("n_rows")) shouldBe 4997L
    d.getLong(d.fieldIndex("n_dv_groups")) shouldBe 1L
    d.getLong(d.fieldIndex("n_live_groups")) shouldBe 1L
  }

  test("re-deleting masked or absent keys is a no-op commit-wise") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 100), p)
    VersionedStore.deleteKeysDeferred(spark, p, keyDf(5L), Seq("id"))
    val v = VersionedStore.latestVersion(spark, p)
    // 5 already masked; 9999 never existed
    VersionedStore.deleteKeysDeferred(spark, p,
      keyDf(5L, 9999L), Seq("id")) shouldBe v
    VersionedStore.latestVersion(spark, p) shouldBe v
  }

  test("compaction FOLDS deletion vectors: one physical group, no " +
      "dv groups, content unchanged, and the masked rows are gone " +
      "from the new group's parquet") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 50), p)
    VersionedStore.append(batch(50 until 100), p)
    VersionedStore.deleteKeysDeferred(spark, p,
      keyDf(7L, 77L), Seq("id"))
    val before = ids(p)
    VersionedStore.compact(spark, p)
    ids(p) shouldBe before
    val d = VersionedStore.describe(spark, p).head
    d.getLong(d.fieldIndex("n_dv_groups")) shouldBe 0L
    d.getLong(d.fieldIndex("n_live_groups")) shouldBe 1L
    d.getLong(d.fieldIndex("n_rows")) shouldBe 98L
  }

  test("CDC: a dv-only window emits exactly the masked rows as " +
      "deletes; applyChanges keeps a replica in lockstep") {
    val p = freshPath()
    val replica = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.create(spark, replica)
    VersionedStore.append(batch(0 until 40), p)        // v1
    VersionedStore.applyChanges(spark,
      VersionedStore.changes(spark, p, 0L, 1L), replica, Seq("id"))
    VersionedStore.deleteKeysDeferred(spark, p,
      keyDf(3L, 13L, 23L), Seq("id"))                  // v2 (dv)
    val feed = VersionedStore.changes(spark, p, 1L, 2L)
    feed.filter(col("_change") === "insert").count() shouldBe 0L
    feed.filter(col("_change") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(3L, 13L, 23L)
    VersionedStore.applyChanges(spark, feed, replica, Seq("id"))
    VersionedStore.read(spark, replica).select("id").collect()
      .map(_.getLong(0)).toSeq.sorted shouldBe ids(p)
    // a mixed window (append + dv + compact) also replicates exactly
    VersionedStore.append(batch(40 until 60), p)       // v3
    VersionedStore.deleteKeysDeferred(spark, p,
      keyDf(41L), Seq("id"))                           // v4
    VersionedStore.compact(spark, p)                   // v5 (folds)
    val feed2 = VersionedStore.changes(spark, p, 2L, 5L)
    VersionedStore.applyChanges(spark, feed2, replica, Seq("id"))
    VersionedStore.read(spark, replica).select("id").collect()
      .map(_.getLong(0)).toSeq.sorted shouldBe ids(p)
  }

  test("fid precedence: a later append or merge re-inserting a " +
      "deleted key is visible — the old physical row stays masked, " +
      "the new one is not") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    VersionedStore.deleteKeysDeferred(spark, p, keyDf(4L), Seq("id"))
    ids(p) should not contain 4L
    // re-insert via append
    VersionedStore.append(
      Seq((4L, "doc-4-new", 9)).toDF("id", "body", "g"), p)
    val row4 = VersionedStore.read(spark, p)
      .filter(col("id") === 4L).collect()
    row4.length shouldBe 1
    row4.head.getString(1) shouldBe "doc-4-new"
    // delete again, then re-insert via merge — still exactly one
    VersionedStore.deleteKeysDeferred(spark, p, keyDf(4L), Seq("id"))
    ids(p) should not contain 4L
    VersionedStore.merge(spark, p,
      Seq((4L, "doc-4-merge", 1)).toDF("id", "body", "g"), Seq("id"))
    val row4b = VersionedStore.read(spark, p)
      .filter(col("id") === 4L).collect()
    row4b.length shouldBe 1
    row4b.head.getString(1) shouldBe "doc-4-merge"
  }

  test("vacuum never reclaims a live dv group; copy-on-write " +
      "deletes and dv deletes compose") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 30), p)        // v1 f1
    VersionedStore.deleteKeysDeferred(spark, p,
      keyDf(1L, 2L), Seq("id"))                        // v2 dv f2
    VersionedStore.append(batch(30 until 40), p)       // v3 f3
    // vacuum to the latest horizon: f1/f3 live, f2 is the dv — all
    // must survive
    VersionedStore.vacuum(spark, p,
      VersionedStore.latestVersion(spark, p)) shouldBe empty
    ids(p) shouldBe ((0L until 30L).filterNot(Set(1L, 2L)) ++
      (30L until 40L))
    // a copy-on-write delete over a dv'd store: rewritten groups
    // come out purged, the mask still covers untouched groups
    VersionedStore.deleteWhere(spark, p, col("id") % 10 === 5)
    ids(p) shouldBe ((0L until 40L)
      .filterNot(Set(1L, 2L)).filterNot(_ % 10 == 5))
  }

  test("erase reaches THROUGH deletion vectors: a row that was " +
      "DV-masked before the removal request leaves no bytes on " +
      "disk — not in any data group, not in a DV key frame") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 50), p)
    // the row is first deferred-deleted (logically gone, bytes kept)
    VersionedStore.deleteKeysDeferred(spark, p, keyDf(5L), Seq("id"))
    ids(p) should not contain 5L
    // then the removal REQUEST arrives
    VersionedStore.erase(spark, p, col("id") === 5L)
    ids(p) shouldBe (0L until 50L).filterNot(_ == 5L)
    // byte-level sweep: no parquet file anywhere under data/ still
    // carries id 5 — neither a data group (deleteWhere alone would
    // have skipped it: the DV hid the row from its detection scan)
    // nor the DV key frame itself (its key VALUES are also erasure
    // surface); pre-erase versions are vacuumed, so this listing IS
    // the store's entire byte footprint
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val dirs = f.listStatus(new org.apache.hadoop.fs.Path(s"$p/data"))
      .map(_.getPath).filter(_.getName.matches("f\\d+"))
    dirs should not be empty
    dirs.foreach { d =>
      val rows = spark.read.parquet(d.toString)
      if (rows.columns.contains("id"))
        rows.filter(col("id") === 5L).count() shouldBe 0L
    }
  }
}
