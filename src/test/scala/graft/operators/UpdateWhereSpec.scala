package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Copy-on-write UPDATE by predicate ([[VersionedStore.updateWhere]])
  * — one commit, only matching file-groups rewrite, every SET and
  * the predicate evaluate against the PRE-update row, types can
  * never drift, and deferred-deleted rows neither update nor
  * resurrect.
  */
class UpdateWhereSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-upd").toString +
      "/store"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", (i % 5).toLong))
      .toDF("id", "body", "g")
  }

  test("matching rows transform, others byte-identical; only " +
      "groups WITH matches rewrite; one commit; time travel serves " +
      "the pre-update rows") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p,
      statsCol = Some("id"))                                 // v1 f1
    VersionedStore.append(batch(100 until 110), p,
      statsCol = Some("id"))                                 // v2 f2
    val v = VersionedStore.updateWhere(spark, p,
      col("id") < 5, Seq("g" -> lit(99L)))
    v shouldBe 3L
    // only f1 contained matches: exactly one remove + one add
    val h = VersionedStore.history(spark, p)
      .where(col("version") === 3)
    h.where(col("action") === "remove").count() shouldBe 1L
    h.where(col("action") === "add").count() shouldBe 1L
    val r = VersionedStore.read(spark, p)
    r.count() shouldBe 20L
    r.where(col("g") === 99).count() shouldBe 5L
    r.where(col("id") === 7).select("g").head.getLong(0) shouldBe 2L
    r.where(col("id") === 107).select("g").head.getLong(0) shouldBe 2L
    // pre-update rows at v2
    VersionedStore.readAt(spark, p, 2L)
      .where(col("g") === 99).count() shouldBe 0L
    // keyRange pruning path returns the same result shape
    val v2 = VersionedStore.updateWhere(spark, p,
      col("id") === 105, Seq("body" -> lit("patched")),
      keyRange = Some((105L, 105L)))
    v2 shouldBe 4L
    VersionedStore.read(spark, p)
      .where(col("body") === "patched").count() shouldBe 1L
  }

  test("SETs and predicate all see the PRE-update row: a two-column " +
      "swap swaps, and a self-referencing SET cannot cascade " +
      "through its own predicate") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(
      Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b"), p)
    VersionedStore.updateWhere(spark, p, col("id") === 1,
      Seq("a" -> col("b"), "b" -> col("a")))
    val r1 = VersionedStore.read(spark, p)
      .where(col("id") === 1).head
    (r1.getAs[Long]("a"), r1.getAs[Long]("b")) shouldBe ((20L, 10L))
    // SET a = a + 1 WHERE a < 25: row 1 has a=20 (matches, becomes
    // 21); row 2 has a=30 (no match). The new value must come from
    // the OLD a, not re-trigger anything.
    VersionedStore.updateWhere(spark, p, col("a") < 25,
      Seq("a" -> (col("a") + 1)))
    VersionedStore.read(spark, p).orderBy("id")
      .select("a").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(21L, 30L)
  }

  test("SET results cast to the column's existing type — the schema " +
      "cannot drift through an update") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(Seq((1L, 5L)).toDF("id", "n"), p)
    // an int-literal SET on a LONG column stays LONG
    VersionedStore.updateWhere(spark, p, lit(true),
      Seq("n" -> lit(7)))
    val sch = VersionedStore.read(spark, p).schema
    sch("n").dataType shouldBe
      org.apache.spark.sql.types.LongType
    // unknown SET column is rejected before anything is written
    intercept[Exception] {
      VersionedStore.updateWhere(spark, p, lit(true),
        Seq("nope" -> lit(1)))
    }.getMessage should include("no column")
  }

  test("deferred-deleted rows neither update nor resurrect, and an " +
      "update on a RENAMED column binds through the mapping") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    VersionedStore.deleteKeysDeferred(spark, p,
      Seq(3L).toDF("id"), Seq("id"))
    VersionedStore.renameColumn(spark, p, "g", "grp")
    VersionedStore.updateWhere(spark, p, col("id") < 5,
      Seq("grp" -> lit(77L)))
    val r = VersionedStore.read(spark, p)
    r.count() shouldBe 9L                     // 3 stays deleted
    r.where(col("grp") === 77).count() shouldBe 4L  // 0,1,2,4
    r.where(col("id") === 3).count() shouldBe 0L
  }

  test("no matching rows = no commit, version unchanged") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    val v = VersionedStore.updateWhere(spark, p,
      col("id") > 1000, Seq("g" -> lit(1L)))
    v shouldBe 1L
    VersionedStore.latestVersion(spark, p) shouldBe 1L
  }

  test("updateWhere enforces table constraints like every other " +
      "mutator: a violating SET aborts before anything commits") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    VersionedStore.setConstraints(spark, p,
      Seq(graft.check.NonNegative("g")))
    intercept[Exception] {
      VersionedStore.updateWhere(spark, p, col("id") < 3,
        Seq("g" -> lit(-5L)))
    }.getMessage should include("constraint")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    VersionedStore.read(spark, p)
      .where(col("g") < 0).count() shouldBe 0L
    // carried-through rows in the rewritten groups do not trip the
    // gate; a compliant update still commits
    VersionedStore.updateWhere(spark, p, col("id") < 3,
      Seq("g" -> lit(5L)))
    VersionedStore.read(spark, p)
      .where(col("g") === 5).count() shouldBe 3L
  }

  test("a caller-supplied stats/zone column typo fails loudly at " +
      "the append boundary instead of silently disarming pruning") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    intercept[Exception] {
      VersionedStore.append(batch(0 until 5), p,
        statsCol = Some("idd"))
    }.getMessage should include("idd")
    intercept[Exception] {
      VersionedStore.append(batch(0 until 5), p,
        zoneCols = Seq("nope"))
    }.getMessage should include("nope")
    // nothing committed by either rejected append
    VersionedStore.latestVersion(spark, p) shouldBe 0L
  }
}
