package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Join-view snapshot ≡ full join recompute after every window: fact
  * appends/deletes, dim deletes and re-segmenting merges, and the
  * sign-product case — fact and dim rows of the same key deleted in
  * ONE window, where the first two delta terms subtract the joined
  * row twice and ΔA⋈ΔB must add it back once.
  */
class IncrementalJoinAggSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/x"

  private def factRows(ids: Range) = {
    val s = spark
    import s.implicits._
    // key space 0..9, measure = id*3
    ids.map(i => (i.toLong, i.toLong % 10, i * 3L))
      .toDF("fid_", "k", "m")
  }

  private def dimRows(keys: Seq[Long]) = {
    val s = spark
    import s.implicits._
    keys.map(k => (k, s"seg${k % 3}")).toDF("k", "seg")
  }

  private def snapMap(snap: String): Map[String, (Long, Long)] =
    IncrementalAgg.read(spark, snap).collect()
      .map(r => r.getString(r.fieldIndex("seg")) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("m"))))
      .toMap

  private def fullMap(fact: String, dim: String): Map[String, (Long, Long)] =
    IncrementalJoinAgg.aggregate(
      VersionedStore.read(spark, fact), VersionedStore.read(spark, dim),
      "k", Seq("seg"), Seq("m")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("join view tracks fact and dim churn, including same-window " +
      "both-side deletes (the sign-product term)") {
    val fact = tmp("ija-f")
    val dim = tmp("ija-d")
    val snap = tmp("ija-s")
    VersionedStore.create(spark, fact)
    VersionedStore.create(spark, dim)
    VersionedStore.create(spark, snap)

    VersionedStore.append(factRows(0 until 40), fact)     // f@1
    VersionedStore.append(dimRows(0L until 10L), dim)     // d@1
    var (fv, dv) = (0L, 0L)
    def step(): Unit = {
      val (tf, td) = (VersionedStore.latestVersion(spark, fact),
        VersionedStore.latestVersion(spark, dim))
      IncrementalJoinAgg.advance(spark, fact, dim, snap,
        fv, tf, dv, td, "k", Seq("seg"), Seq("m"))
      fv = tf; dv = td
      snapMap(snap) shouldBe fullMap(fact, dim)
    }
    step()                                                // init window

    VersionedStore.append(factRows(40 until 60), fact)    // fact growth
    step()
    VersionedStore.deleteWhere(spark, fact,
      col("fid_") % 4 === 1)                              // fact churn
    step()
    VersionedStore.deleteWhere(spark, dim, col("k") === 7L) // dim shrink
    step()
    val s = spark
    import s.implicits._
    VersionedStore.merge(spark, dim,
      Seq((4L, "segX")).toDF("k", "seg"), Seq("k"))       // re-segment
    step()
    // the sign-product window: drop key 5 from BOTH sides at once
    VersionedStore.deleteWhere(spark, fact, col("k") === 5L)
    VersionedStore.deleteWhere(spark, dim, col("k") === 5L)
    step()
    // compaction on either side nets out of the feed
    VersionedStore.compact(spark, fact)
    VersionedStore.compact(spark, dim)
    step()
    snapMap(snap).keySet should contain("segX")
    snapMap(snap) shouldBe fullMap(fact, dim)
  }

  test("idempotent advance: a replayed window (same txn) is a no-op") {
    val fact = tmp("ijb-f")
    val dim = tmp("ijb-d")
    val snap = tmp("ijb-s")
    VersionedStore.create(spark, fact)
    VersionedStore.create(spark, dim)
    VersionedStore.create(spark, snap)
    VersionedStore.append(factRows(0 until 20), fact)
    VersionedStore.append(dimRows(0L until 10L), dim)
    IncrementalJoinAgg.advance(spark, fact, dim, snap,
      0L, 1L, 0L, 1L, "k", Seq("seg"), Seq("m"), txn = 0L)
    val after = snapMap(snap)
    IncrementalJoinAgg.advance(spark, fact, dim, snap,
      0L, 1L, 0L, 1L, "k", Seq("seg"), Seq("m"), txn = 0L)
    snapMap(snap) shouldBe after
    snapMap(snap) shouldBe fullMap(fact, dim)
  }
}
