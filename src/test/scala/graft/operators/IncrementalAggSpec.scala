package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Snapshot ≡ full recompute at every store version: the incremental
  * advance over the change feed must reproduce the from-scratch
  * aggregate after appends, targeted deletes, merges, and a
  * compaction (whose feed nets to nothing), including a group whose
  * count reaches zero and must leave the snapshot.
  */
class IncrementalAggSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/x"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"g${i % 3}", (i * 7L) % 100)).toDF(
      "id", "grp", "v")
  }

  private def snapMap(snap: String): Map[String, (Long, Long)] =
    IncrementalAgg.read(spark, snap).collect()
      .map(r => r.getString(r.fieldIndex("grp")) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("v"))))
      .toMap

  private def fullMap(store: String): Map[String, (Long, Long)] =
    IncrementalAgg.aggregate(VersionedStore.read(spark, store),
      Seq("grp"), Seq("v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("advance tracks appends, deletes, merges, and compaction; " +
      "a vanished group leaves the snapshot") {
    val store = tmp("iva-store")
    val snap = tmp("iva-snap")
    VersionedStore.create(spark, store)
    VersionedStore.append(batch(0 until 30), store)            // v1
    IncrementalAgg.init(spark, store, snap, 1L, Seq("grp"), Seq("v"))
    snapMap(snap) shouldBe fullMap(store)

    def step(commit: => Long): Unit = {
      val from = VersionedStore.latestVersion(spark, store)
      val to = commit
      IncrementalAgg.advance(spark, store, snap, from, to,
        Seq("grp"), Seq("v"))
      snapMap(snap) shouldBe fullMap(store)
    }

    step(VersionedStore.append(batch(30 until 50), store))     // v2
    step(VersionedStore.deleteWhere(spark, store,
      col("id") % 5 === 0))                                    // v3
    step(VersionedStore.compact(spark, store))                 // v4: no-op feed
    val s = spark
    import s.implicits._
    step(VersionedStore.merge(spark, store,
      Seq((3L, "g0", 999L), (100L, "gNEW", 5L))
        .toDF("id", "grp", "v"), Seq("id")))                   // v5
    snapMap(snap).keySet should contain("gNEW")

    // vanish g2 entirely: its snapshot row must be deleted, not
    // left as a zero
    step(VersionedStore.deleteWhere(spark, store, col("grp") === "g2"))
    snapMap(snap).keySet should not contain "g2"
    VersionedStore.read(spark, snap).filter(col("n") === 0)
      .count() shouldBe 0L
  }

  test("advance through a RESTORE window: the rollup follows the " +
      "rollback (the bad batch's rows travel as feed deletes) and " +
      "stays identical to a full recompute") {
    val store = tmp("ivr-store")
    val snap = tmp("ivr-snap")
    val s = spark
    import s.implicits._
    VersionedStore.create(spark, store)
    VersionedStore.append(batch(0 until 30), store)            // v1
    IncrementalAgg.init(spark, store, snap, 1L, Seq("grp"), Seq("v"))
    // a bad batch lands AND reaches the rollup (a new group too)
    VersionedStore.append(
      Seq((500L, "gBAD", 7L), (501L, "g0", 1000L))
        .toDF("id", "grp", "v"), store)                        // v2
    IncrementalAgg.advance(spark, store, snap, 1L, 2L,
      Seq("grp"), Seq("v"))
    snapMap(snap).keySet should contain("gBAD")
    // ops restore; the rollup advances over the restore window and
    // converges — gBAD's count hits zero and leaves the snapshot
    val rv = VersionedStore.restore(spark, store, 1L)          // v3
    IncrementalAgg.advance(spark, store, snap, 2L, rv,
      Seq("grp"), Seq("v"))
    snapMap(snap) shouldBe fullMap(store)
    snapMap(snap).keySet should not contain "gBAD"
  }

  test("idempotent advance: a crash-replay (same txn) never " +
      "double-applies the delta, from an empty or a primed snapshot") {
    val store = tmp("ivc-store")
    val snap = tmp("ivc-snap")
    VersionedStore.create(spark, store)
    VersionedStore.create(spark, snap)
    // batch 0 lands; the rollup advances from an EMPTY snapshot
    VersionedStore.append(batch(0 until 20), store)            // v1
    IncrementalAgg.advance(spark, store, snap, 0L, 1L,
      Seq("grp"), Seq("v"), txn = 0L)
    snapMap(snap) shouldBe fullMap(store)
    // the replay: identical window, identical txn — a no-op
    IncrementalAgg.advance(spark, store, snap, 0L, 1L,
      Seq("grp"), Seq("v"), txn = 0L)
    snapMap(snap) shouldBe fullMap(store)
    // next batch under the next txn advances normally
    VersionedStore.append(batch(20 until 30), store)           // v2
    IncrementalAgg.advance(spark, store, snap, 1L, 2L,
      Seq("grp"), Seq("v"), txn = 1L)
    IncrementalAgg.advance(spark, store, snap, 1L, 2L,
      Seq("grp"), Seq("v"), txn = 1L)
    snapMap(snap) shouldBe fullMap(store)
  }

  test("NULL measures: an all-NULL change window contributes +0, " +
      "never poisons a running sum, and an all-NULL new group sums " +
      "to 0 — snapshot ≡ recompute throughout") {
    val store = tmp("ivn-store")
    val snap = tmp("ivn-snap")
    val s = spark
    import s.implicits._
    VersionedStore.create(spark, store)
    VersionedStore.append(
      Seq((1L, "g0", Some(10L)), (2L, "g0", Some(5L)),
        (3L, "g1", Some(7L))).toDF("id", "grp", "v"), store)   // v1
    IncrementalAgg.init(spark, store, snap, 1L, Seq("grp"), Seq("v"))

    def step(commit: => Long): Unit = {
      val from = VersionedStore.latestVersion(spark, store)
      val to = commit
      IncrementalAgg.advance(spark, store, snap, from, to,
        Seq("grp"), Seq("v"))
      snapMap(snap) shouldBe fullMap(store)
    }

    // a window whose every row carries NULL in the measure: the
    // delta sum is NULL and must fold as +0 (the pre-fix plan turned
    // g0's running 15 into NULL here)
    step(VersionedStore.append(
      Seq((4L, "g0", None: Option[Long]),
        (5L, "g2", None: Option[Long]),
        (6L, "g1", None: Option[Long])).toDF("id", "grp", "v"), store))
    snapMap(snap)("g0") shouldBe ((3L, 15L))
    // the brand-new all-NULL group materializes as sum 0 (the
    // COALESCE(SUM, 0) convention), matching aggregate()
    snapMap(snap)("g2") shouldBe ((1L, 0L))
    // deleting a group's last non-NULL row: the maintained sum
    // returns to 0 (7 + (-7)) and the recompute witness — which
    // coalesces its empty SUM — agrees; the group survives (its
    // NULL-measure row keeps the count at 1)
    step(VersionedStore.deleteWhere(spark, store,
      col("id") === 3L))
    snapMap(snap)("g1") shouldBe ((1L, 0L))
  }

  test("a no-change window is a no-op advance") {
    val store = tmp("ivb-store")
    val snap = tmp("ivb-snap")
    VersionedStore.create(spark, store)
    VersionedStore.append(batch(0 until 10), store)
    IncrementalAgg.init(spark, store, snap, 1L, Seq("grp"), Seq("v"))
    val before = VersionedStore.latestVersion(spark, snap)
    IncrementalAgg.advance(spark, store, snap, 1L, 1L,
      Seq("grp"), Seq("v"))
    VersionedStore.latestVersion(spark, snap) shouldBe before
    snapMap(snap) shouldBe fullMap(store)
  }
}
