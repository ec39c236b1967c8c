package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Model-based randomized check: a random lifecycle of appends,
  * targeted deletes, keyed merges, deferred (DV) deletes,
  * copy-on-write predicate updates, column renames, compactions,
  * checkpoints, and restores is replayed against a pure
  * in-memory model; after EVERY op the store's latest content must
  * equal the model's, and at the end `readAt` must reproduce every
  * recorded version. Renames track the value column's CURRENT
  * logical name (content is compared positionally, so the model
  * stays a plain Map); a restore reverts the name to the restored
  * version's — exercising the schema anchor against arbitrary
  * later writes. This is the strongest form of the q328-family
  * gates: not one pinned lifecycle but arbitrary interleavings — an
  * op whose commit misaccounts a carried group, resurrects a
  * retired fid outside a restore, or breaks snapshot isolation fails
  * on some generated sequence.
  *
  * Append ids are globally fresh (a counter) and merge-insert ids
  * live in a disjoint high range, so content is always keyed by id
  * and a Map model is faithful; merges REPLACE existing rows by
  * sampling the already-allocated id space.
  */
class VersionedStoreModelSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private sealed trait Op
  private case class Append(n: Int) extends Op
  private case class Delete(mod: Int, rem: Int) extends Op
  private case class Merge(fracs: Seq[Double], fresh: Int) extends Op
  private case class DeleteKeys(fracs: Seq[Double]) extends Op
  private case class DvDelete(fracs: Seq[Double]) extends Op
  private case object Compact extends Op
  private case object Checkpoint extends Op
  private case class Restore(frac: Double) extends Op
  private case class UpdateWhere(mod: Int, rem: Int, delta: Long)
    extends Op
  private case object Rename extends Op

  private type Row3 = (Long, String, Long)

  private def df(rows: Seq[Row3]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "body", "v")
  }

  private def contentOf(path: String): Map[Long, Row3] =
    VersionedStore.read(spark, path).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(0), r.getString(1), r.getLong(2))).toMap

  private def contentAt(path: String, v: Long): Map[Long, Row3] =
    VersionedStore.readAt(spark, path, v).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(0), r.getString(1), r.getLong(2))).toMap

  test("random lifecycles: store == model after every op, and " +
      "readAt reproduces every recorded version") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genOp: Gen[Op] = Gen.frequency(
      4 -> Gen.choose(1, 40).map(Append(_)),
      3 -> (for {
        mod <- Gen.choose(2, 7)
        rem <- Gen.choose(0, 6)
      } yield Delete(mod, rem min (mod - 1))),
      3 -> (for {
        fracs <- Gen.listOfN(4, Gen.choose(0.0, 0.999))
        fresh <- Gen.choose(0, 3)
      } yield Merge(fracs, fresh)),
      2 -> Gen.listOfN(3, Gen.choose(0.0, 0.999)).map(DeleteKeys(_)),
      2 -> Gen.listOfN(3, Gen.choose(0.0, 0.999)).map(DvDelete(_)),
      1 -> Gen.const(Compact),
      1 -> Gen.const(Checkpoint),
      2 -> Gen.choose(0.0, 0.999).map(Restore(_)),
      2 -> (for {
        mod <- Gen.choose(2, 7)
        rem <- Gen.choose(0, 6)
        delta <- Gen.choose(1L, 9L)
      } yield UpdateWhere(mod, rem min (mod - 1), delta)),
      1 -> Gen.const(Rename))
    val genSeq = Gen.listOfN(7, genOp)

    var run = 0
    val prop = Prop.forAll(genSeq) { ops =>
      run += 1
      val p = java.nio.file.Files
        .createTempDirectory(s"vs-model-$run").toString + "/store"
      VersionedStore.create(spark, p)
      var nextId = 0L
      var nextHigh = 1000000L
      var cur = Map.empty[Long, Row3]
      var recorded = Map.empty[Long, Map[Long, Row3]]
      // the CURRENT logical name of the third column — renames
      // re-point it, and a restore reverts it to the restored
      // version's name (the schema anchor), so writes must always
      // speak the name of the version they land on
      var vName = "v"
      var renameK = run * 1000 // fresh names across runs AND restores
      var recordedName = Map.empty[Long, String]
      def wdf(rows: Seq[Row3]) =
        if (vName == "v") df(rows)
        else df(rows).withColumnRenamed("v", vName)
      ops.foreach { op =>
        op match {
          case Append(n) =>
            val rows = (nextId until nextId + n)
              .map(i => (i, s"a$i", i * 3))
            nextId += n
            VersionedStore.append(wdf(rows), p)
            cur = cur ++ rows.map(r => r._1 -> r)
          case Delete(mod, rem) =>
            VersionedStore.deleteWhere(spark, p,
              pmod(col("id"), lit(mod)) === rem)
            cur = cur.filterNot { case (id, _) =>
              ((id % mod) + mod) % mod == rem }
          case Merge(fracs, fresh) =>
            val existing =
              if (nextId == 0) Seq.empty[Long]
              else fracs.map(f => (f * nextId).toLong).distinct
            val freshIds = (nextHigh until nextHigh + fresh)
            nextHigh += fresh
            val ids = (existing ++ freshIds).distinct
            if (ids.nonEmpty) {
              val rows = ids.map(i => (i, s"m$i", i * 7))
              VersionedStore.merge(spark, p, wdf(rows), Seq("id"))
              cur = cur ++ rows.map(r => r._1 -> r)
            }
          case DeleteKeys(fracs) =>
            val ids =
              if (nextId == 0) Seq.empty[Long]
              else fracs.map(f => (f * nextId).toLong).distinct
            if (ids.nonEmpty) {
              val s = spark
              import s.implicits._
              VersionedStore.deleteKeys(spark, p,
                ids.toDF("id"), Seq("id"))
              cur = cur -- ids
            }
          case DvDelete(fracs) =>
            // merge-on-read point delete: semantically identical to
            // DeleteKeys on the VISIBLE view, physically a mask
            val ids =
              if (nextId == 0) Seq.empty[Long]
              else fracs.map(f => (f * nextId).toLong).distinct
            if (ids.nonEmpty) {
              val s = spark
              import s.implicits._
              VersionedStore.deleteKeysDeferred(spark, p,
                ids.toDF("id"), Seq("id"))
              cur = cur -- ids
            }
          case Compact =>
            if (!VersionedStore.isEmpty(spark, p))
              VersionedStore.compact(spark, p)
          case Checkpoint =>
            // checkpoint the log at the current version and FORGET
            // the warm cache: every later op (and the final
            // time-travel sweep) resolves cold through checkpoint +
            // suffix — the read path a restarted driver takes
            val v = VersionedStore.latestVersion(spark, p)
            if (v > 0) {
              VersionedStore.checkpoint(spark, p, v)
              VersionedStore.dropLogCache(p)
            }
          case Restore(frac) =>
            // roll back to any recorded non-empty version: the model
            // simply becomes that version's recorded state, and every
            // later op (incl. rewrites of re-published fids) must
            // keep working on the re-surfaced groups
            val targets = recorded.filter(_._2.nonEmpty).keys.toSeq.sorted
            if (targets.nonEmpty) {
              val tv = targets(
                ((frac * targets.size).toInt).min(targets.size - 1))
              VersionedStore.restore(spark, p, tv)
              cur = recorded(tv)
              // the restored version's schema (anchor) serves ITS
              // column name — later writes must speak it
              vName = recordedName(tv)
            }
          case UpdateWhere(mod, rem, delta) =>
            VersionedStore.updateWhere(spark, p,
              pmod(col("id"), lit(mod)) === rem,
              Seq(vName -> (col(vName) + delta)))
            cur = cur.map { case (id, r) =>
              if (((id % mod) + mod) % mod == rem)
                id -> (r._1, r._2, r._3 + delta)
              else id -> r
            }
          case Rename =>
            if (!VersionedStore.isEmpty(spark, p)) {
              renameK += 1
              val fresh = s"v$renameK"
              VersionedStore.renameColumn(spark, p, vName, fresh)
              vName = fresh // model content is positional: unchanged
            }
        }
        val v = VersionedStore.latestVersion(spark, p)
        if (v > 0) recorded = recorded + (v -> cur)
        if (v > 0) recordedName = recordedName + (v -> vName)
        if (v > 0) contentOf(p) shouldBe cur
      }
      // time travel: every recorded version replays its model state
      recorded.foreach { case (v, expected) =>
        if (expected.nonEmpty) contentAt(p, v) shouldBe expected
      }
      true
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop).passed shouldBe true
  }
}
