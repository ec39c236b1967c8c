package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The round-15 scale hardening of the commit-log store:
  * checkpointed cold reads (no O(commits) small-file replay),
  * optimistic concurrent-writer retry (append races land BOTH
  * commits; conflicting rewrites abort), multi-column + string zone
  * stats in commit records (string-key range reads prune, and a
  * delta append can never leave the pruning stale or over-pruned —
  * the log IS the manifest), and age-based vacuum retention from
  * persisted commit timestamps.
  */
class VersionedStoreScaleSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-vsscale").toString +
      "/store"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", i % 5)).toDF("id", "body", "g")
  }

  private def ids(path: String): Seq[Long] =
    VersionedStore.read(spark, path)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  // ---------------------------------------------------------- ckpt

  test("checkpoint: a cold read resolves from checkpoint + suffix " +
      "only — pre-checkpoint commit dirs are never opened (proven " +
      "by corrupting them) — and time travel below the checkpoint " +
      "still works from the snapshot") {
    val p = freshPath()
    spark.conf.set("graft.store.checkpointInterval", "4")
    try {
      VersionedStore.create(spark, p)
      (0 until 6).foreach(i =>
        VersionedStore.append(batch(i * 10 until i * 10 + 10), p))
      // interval 4 → checkpoints at v4 (and the pointer exists)
      VersionedStore.checkpointVersions(spark, p) shouldBe Seq(4L)
      val f = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      f.exists(new org.apache.hadoop.fs.Path(
        s"$p/_last_checkpoint")) shouldBe true
      // corrupt every pre-checkpoint commit record: overwrite its
      // parquet files with garbage — any attempt to read them fails
      (1 to 4).foreach { v =>
        val dir = new java.io.File(f"$p/log/v$v%09d")
        dir.listFiles().filter(_.getName.endsWith(".parquet"))
          .foreach { pf =>
            val w = new java.io.FileOutputStream(pf)
            w.write("garbage".getBytes); w.close()
          }
      }
      // cold resolution (cache dropped) must come from ckpt + v5/v6
      VersionedStore.dropLogCache(p)
      ids(p) shouldBe (0L until 60L)
      // time travel BELOW the checkpoint works from the snapshot too
      VersionedStore.readAt(spark, p, 2L)
        .select("id").collect().map(_.getLong(0)).toSeq.sorted shouldBe
        (0L until 20L)
      // and the control: WITHOUT a checkpoint the same corruption is
      // fatal on a cold read — the checkpoint is what saved us above
      val p2 = freshPath()
      spark.conf.set("graft.store.checkpointInterval", "0")
      VersionedStore.create(spark, p2)
      (0 until 2).foreach(i =>
        VersionedStore.append(batch(i * 10 until i * 10 + 10), p2))
      val dir2 = new java.io.File(f"$p2/log/v${1}%09d")
      dir2.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach { pf =>
          val w = new java.io.FileOutputStream(pf)
          w.write("garbage".getBytes); w.close()
        }
      VersionedStore.dropLogCache(p2)
      an[Exception] should be thrownBy ids(p2)
    } finally spark.conf.unset("graft.store.checkpointInterval")
  }

  test("checkpoint: warm incremental access never re-reads the " +
      "checkpoint, and explicit checkpoint() at any version is " +
      "read-equivalent") {
    val p = freshPath()
    spark.conf.set("graft.store.checkpointInterval", "0")
    try {
      VersionedStore.create(spark, p)
      (0 until 3).foreach(i =>
        VersionedStore.append(batch(i * 5 until i * 5 + 5), p))
      VersionedStore.checkpoint(spark, p, 2L)
      VersionedStore.checkpointVersions(spark, p) shouldBe Seq(2L)
      VersionedStore.dropLogCache(p)
      ids(p) shouldBe (0L until 15L)
      VersionedStore.history(spark, p).count() shouldBe 3L
      // a later append on the warm cache only reads its own dir
      VersionedStore.append(batch(15 until 20), p)
      ids(p) shouldBe (0L until 20L)
    } finally spark.conf.unset("graft.store.checkpointInterval")
  }

  // ----------------------------------------------------------- occ

  test("optimistic retry: two racing appends BOTH land — the loser " +
      "rebases onto the winner's version instead of erroring") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p) // v1
    // writer A stages its group and computes next version = 2 ...
    val aRows = Seq((100L, "a", 0)).toDF("id", "body", "g")
    aRows.write.parquet(s"$p/data/f50")
    // ... but writer B wins version 2 first
    val bRows = Seq((200L, "b", 0)).toDF("id", "body", "g")
    bRows.write.parquet(s"$p/data/f60")
    VersionedStore.commitAt(spark, p, 2L,
      Seq(VersionedStore.GroupAdd(60L, 1L)), Seq.empty)
    // A's stale attempt at v2 must rebase to v3 — both rows visible
    val landed = VersionedStore.commitRetrying(spark, p,
      Seq(VersionedStore.GroupAdd(50L, 1L)), Seq.empty,
      firstV = 2L)
    landed shouldBe 3L
    ids(p) should contain allOf (100L, 200L)
    VersionedStore.latestVersion(spark, p) shouldBe 3L
  }

  test("optimistic retry: a rewrite whose removed group was touched " +
      "by the winning commit ABORTS loudly (no silent lost update)") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p) // v1, f1
    // writer B wins v2 with a compaction-style rewrite of f1
    val bRows = batch(0 until 10)
    bRows.write.parquet(s"$p/data/f70")
    VersionedStore.commitAt(spark, p, 2L,
      Seq(VersionedStore.GroupAdd(70L, 10L)), Seq(1L))
    // writer A staged its own rewrite of f1 — rebase must refuse
    val aRows = Seq((999L, "x", 0)).toDF("id", "body", "g")
    aRows.write.parquet(s"$p/data/f80")
    val e = intercept[RuntimeException] {
      VersionedStore.commitRetrying(spark, p,
        Seq(VersionedStore.GroupAdd(80L, 1L)), Seq(1L), firstV = 2L)
    }
    e.getMessage should include("conflicting rewrite")
    // the winner's state is intact
    ids(p) shouldBe (0L until 10L)
  }

  test("optimistic retry: a fid claimed by the winner aborts the " +
      "rebase (the loser's data dir may be clobbered)") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p) // v1, f1
    val rows = Seq((300L, "c", 0)).toDF("id", "body", "g")
    rows.write.parquet(s"$p/data/f90")
    VersionedStore.commitAt(spark, p, 2L,
      Seq(VersionedStore.GroupAdd(90L, 1L)), Seq.empty)
    val e = intercept[RuntimeException] {
      VersionedStore.commitRetrying(spark, p,
        Seq(VersionedStore.GroupAdd(90L, 1L)), Seq.empty,
        firstV = 2L)
    }
    e.getMessage should include("claimed file-group")
  }

  // --------------------------------------------------- multi zones

  test("string + multi-column zones: commit records carry per-column " +
      "hulls, readRangeStr scans only overlapping groups, and the " +
      "residual filter settles exactness") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    def named(lo: Char, hi: Char, base: Long) =
      (lo to hi).zipWithIndex.map { case (c, i) =>
        (base + i, s"$c-name", (c - 'a').toLong) }
        .toDF("id", "name", "rank")
    VersionedStore.append(named('a', 'f', 0), p,
      zoneCols = Seq("name", "id"))
    VersionedStore.append(named('g', 'm', 100), p,
      zoneCols = Seq("name", "id"))
    VersionedStore.append(named('n', 'z', 200), p,
      zoneCols = Seq("name", "id"))
    VersionedStore.storeZoneCols(spark, p) shouldBe Seq("id", "name")
    // the pruning decision itself: a range inside the second batch
    val v = VersionedStore.latestVersion(spark, p)
    VersionedStore.candidateFidsStr(spark, p, v, "name",
      "h-", "k-zzz") shouldBe Seq(2L)
    // served content is exact (residual filter inside the survivor)
    VersionedStore.readRangeStr(spark, p, "name", "h-", "k-zzz")
      .select("name").collect().map(_.getString(0)).sorted shouldBe
      Array("h-name", "i-name", "j-name", "k-name")
    // numeric zones prune via the same records (no legacy statsCol)
    VersionedStore.candidateFids(spark, p, v, "id", 150L,
      250L) shouldBe Seq(3L)
    VersionedStore.readRange(spark, p, "id", 150L, 250L)
      .count() shouldBe named('n', 'z', 200)
      .filter(col("id") <= 250).count()
  }

  test("no over-prune after a delta: an append that widens a " +
      "column's hull is immediately visible to range reads — the " +
      "log is the manifest, freshness is automatic") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    (0 until 3).foreach { i =>
      VersionedStore.append(
        (i * 10 until i * 10 + 10).map(j =>
          (j.toLong, f"k$j%03d")).toDF("id", "key"), p,
        zoneCols = Seq("key"))
    }
    // the delta lands OUTSIDE every existing hull
    VersionedStore.append(
      Seq((900L, "z900"), (901L, "z901")).toDF("id", "key"), p,
      zoneCols = Seq("key"))
    VersionedStore.readRangeStr(spark, p, "key", "z", "zzzz")
      .select("key").collect().map(_.getString(0)).sorted shouldBe
      Array("z900", "z901")
    // and after a keyed rewrite the hulls are recomputed per group
    VersionedStore.deleteWhere(spark, p, col("key") === "z900")
    VersionedStore.readRangeStr(spark, p, "key", "z", "zzzz")
      .select("key").collect().map(_.getString(0)) shouldBe
      Array("z901")
    // merge on the zone-armed STRING key prunes its scan and stays
    // exact: the matched key is REPLACED (new id), nothing else moves
    VersionedStore.merge(spark, p,
      Seq((999L, "z901")).toDF("id", "key"), Seq("key"))
    val z = VersionedStore.read(spark, p)
      .filter(col("key") === "z901").collect()
    z.map(_.getLong(0)).toSeq shouldBe Seq(999L)
  }

  // -------------------------------------------------- age vacuum

  test("vacuumOlderThan: reclaims only file-groups invisible at " +
      "every version younger than the cutoff; the latest version " +
      "survives regardless of age") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    val day = 86400000L
    def commitBatch(ids: Range, fid: Long, ts: Long): Unit = {
      ids.map(i => (i.toLong, s"d$i", 0)).toDF("id", "body", "g")
        .write.parquet(s"$p/data/f$fid")
      VersionedStore.commitAt(spark, p,
        VersionedStore.latestVersion(spark, p) + 1,
        Seq(VersionedStore.GroupAdd(fid,
          ids.size.toLong)), Seq.empty, ts = ts)
    }
    commitBatch(0 until 5, 1L, ts = 1 * day)    // v1 (old)
    commitBatch(5 until 10, 2L, ts = 2 * day)   // v2 (old)
    // v3: compaction-style rewrite, recent
    (0 until 10).map(i => (i.toLong, s"d$i", 0))
      .toDF("id", "body", "g").write.parquet(s"$p/data/f3")
    VersionedStore.commitAt(spark, p, 3L,
      Seq(VersionedStore.GroupAdd(3L, 10L)), Seq(1L, 2L),
      ts = 10 * day)
    commitBatch(10 until 12, 4L, ts = 11 * day) // v4 (recent)
    // cutoff at day 9: v1/v2 age out; f1/f2 are visible ONLY there
    val victims = VersionedStore.vacuumOlderThan(spark, p, 9 * day)
    victims shouldBe Seq(1L, 2L)
    ids(p) shouldBe (0L until 12L)
    VersionedStore.readAt(spark, p, 3L).count() shouldBe 10L
    an[Exception] should be thrownBy
      VersionedStore.readAt(spark, p, 1L).count()
    // cutoff far in the future: everything old ages out but the
    // latest version's groups are untouchable
    VersionedStore.vacuumOlderThan(spark, p, 100 * day) shouldBe empty
    ids(p) shouldBe (0L until 12L)
  }
}
