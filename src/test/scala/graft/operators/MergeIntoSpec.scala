package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The general MERGE primitive ([[VersionedStore.mergeInto]]):
  * conditional + per-column WHEN clauses, first-match-wins, one
  * atomic commit, copy-on-write on only the groups containing a
  * fired row, pre-merge expression binding, and the same write
  * discipline (constraints, schema stability) as every mutator.
  */
class MergeIntoSpec extends AnyFunSuite with SparkFixture
    with Matchers {
  import VersionedStore.{MergeDelete, MergeInsert, MergeUpdate}

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-mrgi").toString +
      "/store"

  private def target(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", (i % 5).toLong))
      .toDF("id", "body", "g")
  }

  test("conditional per-column UPDATE + DELETE + conditional " +
      "INSERT: first-match-wins, one commit, untouched groups not " +
      "rewritten, unmatched-condition rows carry through") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(target(0 until 10), p,
      statsCol = Some("id"))                                 // f1
    VersionedStore.append(target(100 until 110), p,
      statsCol = Some("id"))                                 // f2
    // source touches only the first group's keys + fresh keys
    val src = Seq(
      (0L, 50L),   // matched, g=0: update fires (50 > 0)
      (1L, 0L),    // matched, g=1: update cond false, delete fires
      (2L, 1L),    // matched, g=2: update cond false, delete fires
      (3L, 100L),  // matched, g=3: update fires
      (500L, 4L),  // unmatched, even g: insert fires
      (501L, 3L))  // unmatched, odd g: no action
      .toDF("id", "sg")
    val v = VersionedStore.mergeInto(spark, p, src, Seq("id"),
      matched = Seq(
        MergeUpdate(Some(col("_src_sg") > col("g")),
          Seq("g" -> (col("_src_sg") + col("g")),
            "body" -> concat(col("body"), lit("+")))),
        MergeDelete(None)),
      notMatched = Seq(
        MergeInsert(Some(col("sg") % 2 === 0),
          Seq("id" -> col("id"), "g" -> (col("sg") * 10)))))
    v shouldBe 3L
    val r = VersionedStore.read(spark, p)
    r.count() shouldBe 19L // 20 - 2 deleted + 1 inserted
    // updates applied per-column with pre-merge binding
    r.where(col("id") === 0).select("g", "body").head match {
      case row => (row.getLong(0), row.getString(1)) shouldBe
        ((50L, "doc-0+"))
    }
    r.where(col("id") === 3).select("g").head.getLong(0) shouldBe 103L
    // first-match-wins: rows 1, 2 hit the DELETE (update cond false)
    r.where(col("id").isin(1L, 2L)).count() shouldBe 0L
    // conditional insert: 500 in (with NULL body), 501 out
    val ins = r.where(col("id") === 500).head
    ins.getAs[Long]("g") shouldBe 40L
    ins.isNullAt(ins.fieldIndex("body")) shouldBe true
    r.where(col("id") === 501).count() shouldBe 0L
    // ONE commit, and only the group with fired rows rewrote
    val h = VersionedStore.history(spark, p)
      .where(col("version") === 3)
    h.where(col("action") === "remove").count() shouldBe 1L
    h.where(col("action") === "add").count() shouldBe 2L // rewrite + insert group
    // the untouched second batch is byte-identical
    r.where(col("id") === 105).select("g").head.getLong(0) shouldBe 0L
  }

  test("SET * / INSERT * forms bind by name; pre-merge binding " +
      "lets SETs swap columns; no fired rows = no commit") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(
      Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b"), p)
    // swap via explicit sets referencing pre-merge values
    VersionedStore.mergeInto(spark, p,
      Seq(Tuple1(1L)).toDF("id"), Seq("id"),
      matched = Seq(MergeUpdate(None,
        Seq("a" -> col("b"), "b" -> col("a")))),
      notMatched = Nil)
    val r1 = VersionedStore.read(spark, p).where(col("id") === 1).head
    (r1.getAs[Long]("a"), r1.getAs[Long]("b")) shouldBe ((20L, 10L))
    // star forms: source carries the full schema
    VersionedStore.mergeInto(spark, p,
      Seq((2L, 0L, 0L), (3L, 7L, 8L)).toDF("id", "a", "b"),
      Seq("id"),
      matched = Seq(MergeUpdate(None, Nil)),
      notMatched = Seq(MergeInsert(None, Nil)))
    val r = VersionedStore.read(spark, p).orderBy("id").collect()
    r.map(_.getLong(1)).toSeq shouldBe Seq(20L, 0L, 7L)
    // a merge whose every condition is false commits nothing
    val before = VersionedStore.latestVersion(spark, p)
    VersionedStore.mergeInto(spark, p,
      Seq(Tuple1(999L)).toDF("id"), Seq("id"),
      matched = Seq(MergeDelete(None)), notMatched = Nil)
    VersionedStore.latestVersion(spark, p) shouldBe before
  }

  test("detection-scan pruning: with zone stats armed on the join " +
      "key, a narrow source key span rewrites ONLY the overlapping " +
      "group — merge's O(touched groups) contract holds for the " +
      "general form") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(target(0 until 10), p,
      statsCol = Some("id"))                                 // f1
    VersionedStore.append(target(100 until 110), p,
      statsCol = Some("id"))                                 // f2
    VersionedStore.append(target(200 until 210), p,
      statsCol = Some("id"))                                 // f3
    // source keys live entirely inside f2's hull
    VersionedStore.mergeInto(spark, p,
      Seq((103L, 1L), (105L, 2L)).toDF("id", "sg"), Seq("id"),
      matched = Seq(MergeUpdate(None, Seq("g" -> lit(77L)))),
      notMatched = Nil)
    val h = VersionedStore.history(spark, p)
      .where(col("version") === 4)
    h.where(col("action") === "remove").count() shouldBe 1L
    h.where(col("action") === "add").count() shouldBe 1L
    val r = VersionedStore.read(spark, p)
    r.where(col("g") === 77).count() shouldBe 2L
    r.count() shouldBe 30L
  }

  test("mergeInto binds through a column-mapping RENAME: logical " +
      "names in SETs/conds/inserts, physical bytes untouched") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(target(0 until 10), p)
    VersionedStore.renameColumn(spark, p, "g", "grp")
    VersionedStore.mergeInto(spark, p,
      Seq((1L, 100L), (999L, 7L)).toDF("id", "sg"), Seq("id"),
      matched = Seq(MergeUpdate(Some(col("_src_sg") > col("grp")),
        Seq("grp" -> (col("_src_sg") + col("grp"))))),
      notMatched = Seq(MergeInsert(None,
        Seq("id" -> col("id"), "grp" -> col("sg")))))
    val r = VersionedStore.read(spark, p)
    r.where(col("id") === 1).select("grp").head.getLong(0) shouldBe 101L
    r.where(col("id") === 999).select("grp").head.getLong(0) shouldBe 7L
    r.count() shouldBe 11L
    // pre-rename groups still serve under the new logical name
    r.where(col("id") === 5).select("grp").head.getLong(0) shouldBe 0L
  }

  test("discipline: duplicate source keys rejected with matched " +
      "actions; constraint-violating updates and inserts abort " +
      "with nothing committed; unknown SET/INSERT columns rejected") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(target(0 until 10), p)
    VersionedStore.setConstraints(spark, p,
      Seq(graft.check.NonNegative("g")))
    val before = VersionedStore.latestVersion(spark, p)
    intercept[Exception] {
      VersionedStore.mergeInto(spark, p,
        Seq((1L, 1L), (1L, 2L)).toDF("id", "sg"), Seq("id"),
        matched = Seq(MergeDelete(None)), notMatched = Nil)
    }.getMessage should include("duplicate keys")
    intercept[Exception] {
      VersionedStore.mergeInto(spark, p,
        Seq(Tuple1(1L)).toDF("id"), Seq("id"),
        matched = Seq(MergeUpdate(None, Seq("g" -> lit(-5L)))),
        notMatched = Nil)
    }.getMessage should include("constraint")
    intercept[Exception] {
      VersionedStore.mergeInto(spark, p,
        Seq(Tuple1(999L)).toDF("id"), Seq("id"),
        matched = Nil,
        notMatched = Seq(MergeInsert(None,
          Seq("id" -> col("id"), "g" -> lit(-1L)))))
    }.getMessage should include("constraint")
    intercept[Exception] {
      VersionedStore.mergeInto(spark, p,
        Seq(Tuple1(1L)).toDF("id"), Seq("id"),
        matched = Seq(MergeUpdate(None, Seq("nope" -> lit(1L)))),
        notMatched = Nil)
    }.getMessage should include("nope")
    // star forms never silently drop a source column
    intercept[Exception] {
      VersionedStore.mergeInto(spark, p,
        Seq((999L, "x", 1L, 7L)).toDF("id", "body", "g", "extra"),
        Seq("id"),
        matched = Nil, notMatched = Seq(MergeInsert(None, Nil)))
    }.getMessage should include("extra")
    VersionedStore.latestVersion(spark, p) shouldBe before
    VersionedStore.read(spark, p).count() shouldBe 10L
  }
}
