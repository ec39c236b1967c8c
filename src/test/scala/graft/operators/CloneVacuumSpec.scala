package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The clone/vacuum borrow contract: a zero-copy clone's data
  * lives in the SOURCE's tree, so the source's vacuum must not
  * reclaim group dirs a live clone still references. `cloneTo`
  * writes borrow markers into the owner's `data/.borrows`; vacuum
  * spares marked groups while the borrower exists and still
  * live-references them, and GCs stale markers (borrower dropped,
  * or compacted onto its own bytes) on contact.
  */
class CloneVacuumSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def tmp(name: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-clnvac-$name").toString

  test("source vacuum SPARES groups a live clone borrows; " +
      "deleting the borrower releases them and GCs the markers") {
    val s = spark
    import s.implicits._
    val base = tmp("spare")
    val src = s"$base/src"
    val dst = s"$base/dst"
    VersionedStore.create(spark, src)
    VersionedStore.append(Seq((1L, "a")).toDF("k", "body"), src)
    VersionedStore.append(Seq((2L, "b")).toDF("k", "body"), src)
    VersionedStore.cloneTo(spark, src, dst)
    // markers landed in the OWNER's tree, one per borrowed group
    // (filter out the local filesystem's .crc sidecars)
    val borrows = new java.io.File(s"$src/data/.borrows")
    def markers(): Seq[String] =
      Option(borrows.list()).toSeq.flatten.toSeq
        .filter(_.matches("f\\d+-\\w+"))
    markers().length shouldBe 2
    // the source moves on: compaction retires the borrowed groups
    VersionedStore.compact(spark, src)
    val latest = VersionedStore.latestVersion(spark, src)
    // vacuum to the latest version — the retired groups are the
    // natural victims, but the clone still reads them: SPARED
    VersionedStore.vacuum(spark, src, latest) shouldBe Seq.empty
    VersionedStore.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b"))
    VersionedStore.read(spark, src).count() shouldBe 2L
    // the borrower is deleted wholesale (the API-level analog of
    // DROP TABLE — no notification to the source): the next vacuum
    // detects the dead borrower, GCs the markers, reclaims the dirs
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dst), true)
    VersionedStore.vacuum(spark, src, latest)
      .length shouldBe 2
    markers().length shouldBe 0
    VersionedStore.read(spark, src).count() shouldBe 2L
  }

  test("a borrower that compacted onto its OWN bytes no longer " +
      "pins the source: vacuum reclaims and GCs the stale markers") {
    val s = spark
    import s.implicits._
    val base = tmp("compacted")
    val src = s"$base/src"
    val dst = s"$base/dst"
    VersionedStore.create(spark, src)
    VersionedStore.append(Seq((1L, "a")).toDF("k", "body"), src)
    VersionedStore.cloneTo(spark, src, dst)
    // the borrower materializes its content into its own tree
    VersionedStore.compact(spark, dst)
    // the source compacts too, then vacuums: the borrowed group is
    // no longer live-referenced by the (existing!) borrower —
    // reclaimed, marker GC'd
    VersionedStore.compact(spark, src)
    val latest = VersionedStore.latestVersion(spark, src)
    VersionedStore.vacuum(spark, src, latest).length shouldBe 1
    Option(new java.io.File(s"$src/data/.borrows").list())
      .toSeq.flatten.count(_.matches("f\\d+-\\w+")) shouldBe 0
    VersionedStore.read(spark, dst).count() shouldBe 1L
    VersionedStore.read(spark, src).count() shouldBe 1L
  }
}
