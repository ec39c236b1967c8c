package graft.pipeline

import graft.SparkFixture
import graft.check.{NonNegative, NotNull}
import graft.operators.{IncrementalAgg, StoreManifest, VersionedStore}
import graft.streaming.{EventStream, VersionedStoreSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The reference's ingest DAG (sensor → copy → validate → publish →
  * transform) recomposed on the lakehouse substrate, end to end in
  * one flow: files arrive, the exactly-once streaming sink commits
  * them under table constraints with zone stats, a rollup advances
  * from the change feed, a training manifest pins the state, a
  * replica syncs via CDC, a removal request erases rows — and every
  * piece's guarantee holds in COMPOSITION: the rejected batch leaves
  * no trace anywhere downstream, the manifest survives drift but
  * fails loudly past the erasure horizon, the replica re-syncs to
  * the post-erase state.
  */
class LakehousePipelineSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("arrive → constrained exactly-once ingest → rollup → pin → " +
      "replicate → erase, with guarantees preserved in composition") {
    val s = spark
    import s.implicits._
    val src = tmp("lh-src")
    val store = tmp("lh-store") + "/docs"
    val snap = tmp("lh-snap") + "/rollup"
    val rep = tmp("lh-rep") + "/replica"
    val man = tmp("lh-man") + "/manifest"
    val ckpt = tmp("lh-ckpt")

    VersionedStore.create(spark, store)
    VersionedStore.setConstraints(spark, store,
      Seq(NotNull("grp"), NonNegative("v")))
    VersionedStore.create(spark, snap)
    VersionedStore.create(spark, rep)

    // wave 1 arrives; sink commits it exactly once with stats,
    // rollup advances in the same micro-batch
    Seq((0L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L), (3L, "b", 7L))
      .toDF("id", "grp", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    VersionedStoreSink.runAvailableNowWithRollup(
      EventStream.fileStream(spark, src, schema), store, snap, ckpt,
      Seq("grp"), Seq("v"), statsCol = Some("id")).awaitTermination()
    VersionedStore.read(spark, store).count() shouldBe 4
    IncrementalAgg.read(spark, snap).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap shouldBe
      Map("a" -> 15L, "b" -> 27L)

    // a violating batch (negative v) is rejected by the table
    // constraints and leaves NO trace in store, rollup, or stats
    val vBefore = VersionedStore.latestVersion(spark, store)
    intercept[RuntimeException] {
      VersionedStore.append(
        Seq((9L, "c", -1L)).toDF("id", "grp", "v"), store)
    }.getMessage should include("rejected by table constraints")
    VersionedStore.latestVersion(spark, store) shouldBe vBefore
    VersionedStore.storeStatsCol(spark, store) shouldBe Some("id")

    // pin the training manifest, then replicate the full feed
    StoreManifest.pin(spark, Seq(store), man)
    VersionedStore.applyChanges(spark,
      VersionedStore.changes(spark, store, 0L, vBefore), rep,
      Seq("id"))
    VersionedStore.read(spark, rep).count() shouldBe 4

    // removal request: erase grp 'a'; the pin now points below the
    // erasure horizon and must fail LOUDLY, never serve erased rows
    val (ev, _) = VersionedStore.erase(spark, store,
      col("grp") === "a")
    intercept[RuntimeException] {
      StoreManifest.readAll(spark, man)(store).count()
    }.getMessage should include("vacuumed")

    // the ERASED rows cannot travel through the change feed — erase
    // destroyed exactly the data a row-level delete feed would need
    // to carry (that is the point of erasure). The feed across the
    // erase window fails loudly rather than silently dropping the
    // deletes; consumers replay the removal REQUEST instead.
    intercept[RuntimeException] {
      VersionedStore.changes(spark, store, vBefore, ev).count()
    }.getMessage should include("vacuumed")

    // replica and rollup apply the same removal request directly
    VersionedStore.erase(spark, rep, col("grp") === "a")
    VersionedStore.read(spark, rep)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 3L)
    IncrementalAgg.init(spark, store, snap, ev, Seq("grp"), Seq("v"))
    IncrementalAgg.read(spark, snap).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap shouldBe
      Map("b" -> 27L)
  }

  test("clone for experimentation, restore after a bad batch, " +
      "auto-clustered maintenance — and a change-feed replica that " +
      "converges through all of it") {
    val s = spark
    import s.implicits._
    import graft.streaming.StoreChangeFeed
    val store = tmp("lh2-store") + "/docs"
    val sandbox = tmp("lh2-clone") + "/sandbox"
    val rep = tmp("lh2-rep") + "/replica"
    val cur = tmp("lh2-cur") + "/cursor"
    def rows(p: String): Map[Long, (String, Long)] =
      VersionedStore.read(spark, p).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    VersionedStore.create(spark, store)
    VersionedStore.append(
      Seq((0L, "a", 10L), (1L, "b", 20L)).toDF("id", "grp", "v"),
      store, zoneCols = Seq("id"))                          // v1
    VersionedStore.append(
      Seq((2L, "a", 5L), (3L, "b", 7L)).toDF("id", "grp", "v"),
      store)                                                // v2
    StoreChangeFeed.replicateAll(spark, store, rep, cur,
      Seq("id")) shouldBe 2L
    rows(rep) shouldBe rows(store)

    // a data scientist experiments on a ZERO-COPY clone; the source
    // never notices
    VersionedStore.cloneTo(spark, store, sandbox)
    VersionedStore.deleteWhere(spark, sandbox, col("grp") === "a")
    VersionedStore.read(spark, sandbox).count() shouldBe 2
    VersionedStore.read(spark, store).count() shouldBe 4
    VersionedStore.latestVersion(spark, store) shouldBe 2L

    // a BAD batch lands on the source and even reaches the replica —
    // then ops roll the source back with one metadata RESTORE
    val good = VersionedStore.latestVersion(spark, store)
    VersionedStore.append(
      Seq((99L, "zz", 1L)).toDF("id", "grp", "v"), store)   // v3 bad
    StoreChangeFeed.replicateAll(spark, store, rep, cur, Seq("id"))
    rows(rep).keySet should contain(99L)
    VersionedStore.restore(spark, store, good)              // v4
    // the change feed across the restore window emits exactly the
    // bad rows as deletes; the replica CONVERGES to the rollback
    StoreChangeFeed.replicateAll(spark, store, rep, cur,
      Seq("id")) shouldBe 4L
    rows(rep) shouldBe rows(store)
    rows(rep).keySet should not contain 99L

    // growth triggers the self-maintenance policy: a clustered
    // multi-group compaction folds the fragmented store. In the
    // replica's next window the compaction NETS OUT row-for-row —
    // only the appended rows travel the feed, never the rewritten
    // table
    VersionedStore.append(
      Seq((4L, "a", 1L), (5L, "b", 2L)).toDF("id", "grp", "v"), store)
    VersionedStore.maintain(spark, store, maxLiveGroups = 2,
      clusterBy = Seq("id"), numGroups = 2) shouldBe true
    StoreChangeFeed.replicateAll(spark, store, rep, cur, Seq("id"))
    rows(rep) shouldBe rows(store)
    // the sandbox survived everything, still serving its experiment
    VersionedStore.read(spark, sandbox).count() shouldBe 2
  }
}
