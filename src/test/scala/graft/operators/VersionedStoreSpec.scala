package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VersionedStoreSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-vstore").toString +
      "/store"

  private def batch(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc-$i", i % 5)).toDF("id", "body", "g")
  }

  private def idsAt(path: String, v: Long): Seq[Long] =
    VersionedStore.readAt(spark, path, v)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def ids(path: String): Seq[Long] =
    VersionedStore.read(spark, path)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("append/read parity: latest content is the union of appends") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p) shouldBe 1L
    VersionedStore.append(batch(10 until 25), p) shouldBe 2L
    ids(p) shouldBe (0L until 25L)
    VersionedStore.latestVersion(spark, p) shouldBe 2L
  }

  test("time travel: readAt reproduces every retained version") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    VersionedStore.append(batch(10 until 25), p)
    VersionedStore.deleteWhere(spark, p, col("id") % 7 === 0)
    idsAt(p, 1) shouldBe (0L until 10L)
    idsAt(p, 2) shouldBe (0L until 25L)
    idsAt(p, 3) shouldBe (0L until 25L).filter(_ % 7 != 0)
  }

  test("deleteWhere rewrites only affected file-groups and carries " +
      "the rest by reference") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)   // f1: has id 7
    VersionedStore.append(batch(20 until 30), p)  // f2: has 21,28
    VersionedStore.append(batch(40 until 45), p)  // f3: has 42
    VersionedStore.append(batch(50 until 55), p)  // f4: NO multiple of 7
    VersionedStore.deleteWhere(spark, p, col("id") % 7 === 0)
    ids(p) shouldBe
      ((0 until 10) ++ (20 until 30) ++ (40 until 45) ++ (50 until 55))
        .map(_.toLong).filter(_ % 7 != 0)
    // f4 contained no match → must still be live, NOT rewritten
    val hist = VersionedStore.history(spark, p)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    hist.filter(_._1 == 5L).filter(_._2 == "remove").map(_._3)
      .sorted shouldBe Seq(1L, 2L, 3L)
    hist.filter(_._2 == "remove").map(_._3) should not contain 4L
  }

  test("deleteWhere with no matches is a no-op commit-wise") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(1 until 5), p)
    VersionedStore.deleteWhere(spark, p, col("id") > 100) shouldBe 1L
    VersionedStore.latestVersion(spark, p) shouldBe 1L
  }

  test("compaction folds to one file-group in one commit and " +
      "preserves content and prior versions") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    VersionedStore.append(batch(10 until 20), p)
    val before = ids(p)
    VersionedStore.compact(spark, p) shouldBe 3L
    ids(p) shouldBe before
    // post-compaction live set is exactly one group
    val hist = VersionedStore.history(spark, p).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    hist.filter(_._1 == 3L).filter(_._2 == "add") should have size 1
    hist.filter(_._1 == 3L).filter(_._2 == "remove")
      .map(_._3).sorted shouldBe Seq(1L, 2L)
    // time travel across the compaction still works until vacuum
    idsAt(p, 1) shouldBe (0L until 10L)
  }

  test("crash robustness: an orphan data dir without a log record " +
      "is invisible, and the next append reclaims its fid") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    // simulate an append that crashed after writing data, before the
    // log commit: a full file-group at the next fid, no log record
    batch(900 until 999).write
      .parquet(s"$p/data/f2")
    ids(p) shouldBe (0L until 5L)
    // the next real append writes at fid 2 (overwrite reclaims the
    // orphan) and commits — the crashed batch's rows never surface
    VersionedStore.append(batch(5 until 9), p) shouldBe 2L
    ids(p) shouldBe (0L until 9L)
  }

  test("crash robustness: a stale .tmp log dir from a crashed " +
      "commit is ignored by readers and cleared by the next commit") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    val s = spark
    import s.implicits._
    Seq(("add", 99L, 1L)).toDF("action", "fid", "rows")
      .write.parquet(s"$p/log/.tmp-v000000002")
    VersionedStore.versions(spark, p) shouldBe Seq(1L)
    ids(p) shouldBe (0L until 5L)
    VersionedStore.append(batch(5 until 7), p) shouldBe 2L
    ids(p) shouldBe (0L until 7L)
  }

  test("concurrent-commit conflict fails loudly, never corrupts") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    // both writers computed next version = 2; the winner publishes
    val s = spark
    import s.implicits._
    Seq(("add", 77L, 3L)).toDF("action", "fid", "rows")
      .write.parquet(s"$p/log/v000000002")
    batch(100 until 103).write.parquet(s"$p/data/f77")
    val e = intercept[RuntimeException] {
      // the loser's commit at the same version must NOT clobber
      VersionedStore.commitAt(spark, p, 2L,
        Seq(VersionedStore.GroupAdd(78L, 0L)), Seq.empty)
    }
    e.getMessage should include("concurrent writer conflict")
    // the winner's commit is intact
    ids(p) shouldBe ((0L until 5L) ++ (100L until 103L))
  }

  test("vacuum reclaims groups behind the horizon and orphans; " +
      "readAt past the horizon fails loudly") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)   // v1, f1
    VersionedStore.append(batch(10 until 20), p)  // v2, f2
    VersionedStore.compact(spark, p)              // v3, f3 (removes f1,f2)
    batch(500 until 600).write.parquet(s"$p/data/f9") // orphan
    val victims = VersionedStore.vacuum(spark, p, retainFrom = 3L)
    victims shouldBe Seq(1L, 2L, 9L)
    ids(p) shouldBe (0L until 20L)
    val e = intercept[RuntimeException] {
      VersionedStore.readAt(spark, p, 1L)
    }
    e.getMessage should include("vacuumed")
    // retention keeps versions ≥ horizon readable
    idsAt(p, 3) shouldBe (0L until 20L)
  }

  test("merge upserts: matched rows replaced, unmatched inserted, " +
      "only affected file-groups rewritten") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)   // f1: ids 0-9
    VersionedStore.append(batch(10 until 20), p)  // f2: ids 10-19
    VersionedStore.append(batch(20 until 30), p)  // f3: ids 20-29
    val s = spark
    import s.implicits._
    // updates touch f1 (id 3) and f3 (id 25), plus a new id 100
    val upd = Seq((3L, "UPDATED-3", 99), (25L, "UPDATED-25", 99),
      (100L, "NEW-100", 99)).toDF("id", "body", "g")
    VersionedStore.merge(spark, p, upd, Seq("id")) shouldBe 4L
    val rows = VersionedStore.read(spark, p)
      .select("id", "body").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.keySet shouldBe ((0L until 30L).toSet + 100L)
    rows(3L) shouldBe "UPDATED-3"
    rows(25L) shouldBe "UPDATED-25"
    rows(100L) shouldBe "NEW-100"
    rows(4L) shouldBe "doc-4"
    // f2 untouched: v4 removes exactly f1 and f3
    val hist = VersionedStore.history(spark, p).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    hist.filter(_._1 == 4L).filter(_._2 == "remove").map(_._3)
      .sorted shouldBe Seq(1L, 3L)
  }

  test("merge enforces the append schema gate: retyped columns and " +
      "extra columns fail loudly before anything is written") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    val v1 = VersionedStore.latestVersion(spark, p)
    // a retyping update batch must not become the table schema
    val retyped = Seq((3L, "doc-3b", "oops")).toDF("id", "body", "g")
    val e1 = intercept[RuntimeException] {
      VersionedStore.merge(spark, p, retyped, Seq("id"))
    }
    e1.getMessage should include("drops or retypes")
    // extra columns are rejected, never silently projected away
    val extra = Seq((3L, "doc-3b", 1, 99L)).toDF("id", "body", "g", "x")
    val e2 = intercept[RuntimeException] {
      VersionedStore.merge(spark, p, extra, Seq("id"))
    }
    e2.getMessage should include("adds columns")
    // nothing committed, content intact, old groups still readable
    VersionedStore.latestVersion(spark, p) shouldBe v1
    ids(p) shouldBe (0L until 10L)
  }

  test("merge rejects duplicate-key updates") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 5), p)
    val s = spark
    import s.implicits._
    val dup = Seq((1L, "a", 0), (1L, "b", 0)).toDF("id", "body", "g")
    val e = intercept[RuntimeException] {
      VersionedStore.merge(spark, p, dup, Seq("id"))
    }
    e.getMessage should include("duplicate keys")
  }

  test("changes: row-level feed between versions nets out " +
      "compactions and decomposes merges into delete+insert") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)           // v1
    VersionedStore.append(batch(10 until 20), p)          // v2
    VersionedStore.deleteWhere(spark, p, col("id") < 3)   // v3
    VersionedStore.compact(spark, p)                      // v4
    VersionedStore.append(batch(20 until 25), p)          // v5
    def feed(a: Long, b: Long): (Seq[Long], Seq[Long]) = {
      val rows = VersionedStore.changes(spark, p, a, b)
        .select("_change", "id").collect()
        .map(r => r.getString(0) -> r.getLong(1))
      (rows.collect { case ("insert", i) => i }.sorted.toSeq,
        rows.collect { case ("delete", i) => i }.sorted.toSeq)
    }
    feed(2, 3) shouldBe (Seq.empty, Seq(0L, 1L, 2L))
    feed(3, 4) shouldBe (Seq.empty, Seq.empty)      // compaction nets out
    feed(2, 5) shouldBe ((20L until 25L).toSeq, Seq(0L, 1L, 2L))
    feed(5, 5) shouldBe (Seq.empty, Seq.empty)
    // a merge shows as delete-old + insert-new for replaced keys
    val s = spark
    import s.implicits._
    VersionedStore.merge(spark, p,
      Seq((5L, "UPD", 1)).toDF("id", "body", "g"), Seq("id"))  // v6
    val rows = VersionedStore.changes(spark, p, 5, 6)
      .select("_change", "id", "body").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.toSet shouldBe Set(("delete", 5L, "doc-5"), ("insert", 5L, "UPD"))
  }

  test("zone stats: statted appends prune merge's scan to " +
      "overlapping file-groups; content is unchanged by pruning") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    // three disjoint key ranges, all statted on id
    VersionedStore.append(batch(0 until 100), p, Some("id"))     // f1
    VersionedStore.append(batch(100 until 200), p, Some("id"))   // f2
    VersionedStore.append(batch(200 until 300), p, Some("id"))   // f3
    VersionedStore.storeStatsCol(spark, p) shouldBe Some("id")
    // the update-key span [150,160] overlaps only f2
    VersionedStore.candidateFids(spark, p, 3L, "id", 150L,
      160L) shouldBe Seq(2L)
    val s = spark
    import s.implicits._
    val upd = Seq((150L, "UPD-150", 1), (160L, "UPD-160", 1))
      .toDF("id", "body", "g")
    VersionedStore.merge(spark, p, upd, Seq("id"))
    // only f2 was rewritten; f1/f3 carried by reference
    val hist = VersionedStore.history(spark, p).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    hist.filter(_._1 == 4L).filter(_._2 == "remove")
      .map(_._3) shouldBe Seq(2L)
    val rows = VersionedStore.read(spark, p)
      .select("id", "body").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.keySet shouldBe (0L until 300L).toSet
    rows(150L) shouldBe "UPD-150"
    rows(149L) shouldBe "doc-149"
    // rewritten and inserted groups re-stat themselves: the stats
    // discipline survives the merge, so the NEXT keyed mutation
    // still prunes
    VersionedStore.storeStatsCol(spark, p) shouldBe Some("id")
  }

  test("zone stats: deleteWhere with a keyRange hint prunes the " +
      "find scan; an unstatted group is always a candidate") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 100), p, Some("id"))    // f1
    VersionedStore.append(batch(100 until 200), p, Some("id"))  // f2
    VersionedStore.append(batch(200 until 210), p)              // f3 unstatted
    // mixed discipline → no store-wide stats col → hint is ignored
    // (correctness first: the scan covers everything)
    VersionedStore.storeStatsCol(spark, p) shouldBe None
    VersionedStore.candidateFids(spark, p, 3L, "id", 5L, 6L)
      .toSet should contain(3L)
    VersionedStore.deleteWhere(spark, p, col("id") === 205L,
      keyRange = Some((205L, 205L)))
    ids(p) shouldBe ((0L until 300L).toSeq.filter(i =>
      i < 210 && i != 205))
  }

  test("readRange: serves only overlapping groups with a residual " +
      "filter; unstatted stores fall back to a full filtered read") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 100), p, Some("id"))     // f1
    VersionedStore.append(batch(100 until 200), p, Some("id"))   // f2
    VersionedStore.candidateFids(spark, p, 2L, "id", 150L,
      160L) shouldBe Seq(2L)
    VersionedStore.readRange(spark, p, "id", 150L, 160L)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe
      (150L to 160L).toArray
    // empty overlap → empty result, schema intact
    val none = VersionedStore.readRange(spark, p, "id", 500L, 600L)
    none.count() shouldBe 0L
    none.columns shouldBe Array("id", "body", "g")
    // a store with no uniform stats col still answers correctly
    val p2 = freshPath()
    VersionedStore.create(spark, p2)
    VersionedStore.append(batch(0 until 50), p2)
    VersionedStore.readRange(spark, p2, "id", 10L, 12L)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(10L, 11L, 12L)
  }

  test("readRange's residual filter reaches the parquet scan " +
      "(PushedFilters), so row-group min/max prunes inside groups") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 100), p, Some("id"))
    val plan = VersionedStore.readRange(spark, p, "id", 10L, 20L)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThanOrEqual(id,10)")
    plan should include("LessThanOrEqual(id,20)")
  }

  test("clustered compaction: content preserved, store stats " +
      "maintained on the folded group") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 50), p, Some("id"))
    VersionedStore.append(batch(50 until 100), p, Some("id"))
    VersionedStore.compact(spark, p, clusterBy = Seq("g"))
    ids(p) shouldBe (0L until 100L)
    VersionedStore.storeStatsCol(spark, p) shouldBe Some("id")
  }

  test("erase: forgotten rows are gone from the latest version AND " +
      "from disk; reads below the erasure horizon fail loudly") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 20), p)    // v1, f1 (has 7,14)
    VersionedStore.append(batch(20 until 40), p)   // v2, f2 (has 21,28,35)
    VersionedStore.append(batch(40 until 45), p)   // v3, f3 (has 42)
    val (v, reclaimed) =
      VersionedStore.erase(spark, p, col("id") % 7 === 0)
    v shouldBe 4L
    // all three groups carried matches and must be reclaimed
    reclaimed.sorted shouldBe Seq(1L, 2L, 3L)
    ids(p) shouldBe (0L until 45L).filter(_ % 7 != 0)
    // strongest witness: NO surviving parquet file anywhere under
    // data/ still carries a forgotten row
    spark.read.parquet(s"$p/data/f*")
      .filter(col("id") % 7 === 0).count() shouldBe 0L
    // time travel is truncated to the erasure point
    val e = intercept[RuntimeException] {
      VersionedStore.readAt(spark, p, 1L)
    }
    e.getMessage should include("vacuumed")
    VersionedStore.readAt(spark, p, 4L).count() shouldBe
      (0 until 45).count(_ % 7 != 0).toLong
  }

  test("schema evolution: additive append requires evolve=true, old " +
      "groups read as NULL in new columns, time travel keeps the " +
      "old schema, destructive changes are rejected") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)           // v1: (id,body,g)
    val evolved = (10 until 15)
      .map(i => (i.toLong, s"doc-$i", i % 5, i * 2L))
      .toDF("id", "body", "g", "q")
    // additive change must be explicit
    val e1 = intercept[RuntimeException] {
      VersionedStore.append(evolved, p)
    }
    e1.getMessage should include("evolve=true")
    VersionedStore.append(evolved, p, evolve = true)      // v2
    val rows = VersionedStore.read(spark, p)
      .select("id", "q").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    rows(3L) shouldBe None          // pre-evolution row: NULL q
    rows(12L) shouldBe Some(24L)
    // time travel reads v1 under v1's schema
    VersionedStore.readAt(spark, p, 1L).columns shouldBe
      Array("id", "body", "g")
    // dropping and retyping are rejected outright
    val e2 = intercept[RuntimeException] {
      VersionedStore.append(
        (0 until 3).map(i => (i.toLong, i % 5)).toDF("id", "g"), p,
        evolve = true)
    }
    e2.getMessage should include("drops or retypes")
    val e3 = intercept[RuntimeException] {
      VersionedStore.append(
        (0 until 3).map(i => (i.toLong, s"b", "str", 1L))
          .toDF("id", "body", "g", "q"), p, evolve = true)
    }
    e3.getMessage should include("drops or retypes")
    // the change feed across the evolution window compares under the
    // evolved schema on both sides
    val feed = VersionedStore.changes(spark, p, 1L, 2L)
    feed.columns shouldBe Array("id", "body", "g", "q", "_change")
    feed.filter(col("_change") === "insert").count() shouldBe 5
  }

  test("describe summarizes the store from the log alone; maintain " +
      "compacts only past the fragmentation threshold") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p, Some("id"))
    VersionedStore.append(batch(10 until 25), p, Some("id"))
    VersionedStore.maintain(spark, p, maxLiveGroups = 2) shouldBe false
    VersionedStore.append(batch(25 until 30), p, Some("id"))
    val d0 = VersionedStore.describe(spark, p).head()
    d0.getLong(0) shouldBe 3L    // latest_version
    d0.getLong(2) shouldBe 3L    // n_live_groups
    d0.getLong(3) shouldBe 30L   // n_rows (from the log, no scan)
    d0.getLong(4) shouldBe 3L    // n_columns
    d0.getString(5) shouldBe "id"
    VersionedStore.maintain(spark, p, maxLiveGroups = 2,
      clusterBy = Seq("id")) shouldBe true
    val d1 = VersionedStore.describe(spark, p).head()
    d1.getLong(2) shouldBe 1L
    d1.getLong(3) shouldBe 30L
    ids(p) shouldBe (0L until 30L)
  }

  test("deleteKeys removes exactly the keyed rows, rewriting only " +
      "groups that contain matches") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)    // f1
    VersionedStore.append(batch(10 until 20), p)   // f2
    VersionedStore.append(batch(20 until 30), p)   // f3
    val s = spark
    import s.implicits._
    val removal = Seq(3L, 7L, 25L, 999L).toDF("id")  // 999 matches nothing
    VersionedStore.deleteKeys(spark, p, removal, Seq("id"))
    ids(p) shouldBe (0L until 30L).filterNot(Set(3L, 7L, 25L))
    // f2 had no matching key → carried by reference, not rewritten
    val hist = VersionedStore.history(spark, p).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    hist.filter(_._1 == 4L).filter(_._2 == "remove").map(_._3)
      .sorted shouldBe Seq(1L, 3L)
  }

  test("applyChanges replicates a keyed store window by window, " +
      "including deletes, replaces, and compactions") {
    val src = freshPath()
    val rep = freshPath()
    VersionedStore.create(spark, src)
    VersionedStore.create(spark, rep)
    VersionedStore.append(batch(0 until 20), src)          // v1
    VersionedStore.append(batch(20 until 30), src)         // v2
    VersionedStore.deleteWhere(spark, src, col("id") % 5 === 0) // v3
    val s = spark
    import s.implicits._
    VersionedStore.merge(spark, src,
      Seq((7L, "REPL", 1)).toDF("id", "body", "g"), Seq("id")) // v4
    VersionedStore.compact(spark, src)                     // v5
    var applied = 0L
    Seq(2L, 4L, 5L).foreach { to =>
      VersionedStore.applyChanges(spark,
        VersionedStore.changes(spark, src, applied, to), rep,
        Seq("id"))
      applied = to
      val srcRows = VersionedStore.readAt(spark, src, to)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val repRows = VersionedStore.read(spark, rep)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      repRows shouldBe srcRows
    }
    VersionedStore.read(spark, rep)
      .filter(col("id") === 7L).head().getString(1) shouldBe "REPL"
  }

  test("table constraints: a violating batch is rejected before " +
      "anything is written; clean batches flow; merge validates too") {
    import graft.check.{Between, NotNull}
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.setConstraints(spark, p,
      Seq(NotNull("body"), Between("g", 0, 4)))
    VersionedStore.append(batch(0 until 10), p) shouldBe 1L
    val s = spark
    import s.implicits._
    val bad = Seq((100L, null.asInstanceOf[String], 2),
      (101L, "ok", 9)).toDF("id", "body", "g")
    val e = intercept[RuntimeException] {
      VersionedStore.append(bad, p)
    }
    e.getMessage should include("rejected by table constraints")
    e.getMessage should include("notnull_body: 1")
    e.getMessage should include("between_g: 1")
    // nothing committed, no orphan group visible
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    ids(p) shouldBe (0L until 10L)
    // merge runs the same gate on its updates
    val e2 = intercept[RuntimeException] {
      VersionedStore.merge(spark, p,
        Seq((3L, "x", 77)).toDF("id", "body", "g"), Seq("id"))
    }
    e2.getMessage should include("between_g: 1")
    // constraints round-trip through their persisted form
    VersionedStore.constraintsOf(spark, p) shouldBe
      Seq(NotNull("body"), Between("g", 0, 4))
  }

  test("merge with a txn tag: a replayed merge is a no-op") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    val s = spark
    import s.implicits._
    val upd = Seq((3L, "UPD", 9)).toDF("id", "body", "g")
    val v = VersionedStore.merge(spark, p, upd, Seq("id"), txn = 7L)
    // the replay: same txn, possibly different (stale) updates —
    // must return the committed version and change nothing
    val upd2 = Seq((4L, "WRONG", 9)).toDF("id", "body", "g")
    VersionedStore.merge(spark, p, upd2, Seq("id"), txn = 7L) shouldBe v
    VersionedStore.latestVersion(spark, p) shouldBe v
    val rows = VersionedStore.read(spark, p)
      .select("id", "body").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows(3L) shouldBe "UPD"
    rows(4L) shouldBe "doc-4"
  }

  test("appendIdempotent: a replayed transaction is a no-op; " +
      "distinct transactions append") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.appendIdempotent(batch(0 until 5), p, txn = 0L) shouldBe 1L
    // replay of batch 0 (crash between sink write and checkpoint)
    VersionedStore.appendIdempotent(batch(0 until 5), p, txn = 0L) shouldBe 1L
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    ids(p) shouldBe (0L until 5L)
    VersionedStore.appendIdempotent(batch(5 until 9), p, txn = 1L) shouldBe 2L
    ids(p) shouldBe (0L until 9L)
    // untagged commits between tagged ones never collide with a txn
    VersionedStore.append(batch(9 until 11), p) shouldBe 3L
    VersionedStore.appendIdempotent(batch(5 until 9), p, txn = 1L) shouldBe 2L
    ids(p) shouldBe (0L until 11L)
  }

  test("vacuum with a horizon below a live compaction retains " +
      "every group any retained version needs") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(batch(0 until 10), p)
    VersionedStore.append(batch(10 until 20), p)
    VersionedStore.compact(spark, p)
    // retain from v2: f1 and f2 are still visible AT v2 → kept
    VersionedStore.vacuum(spark, p, retainFrom = 2L) shouldBe Seq.empty
    idsAt(p, 2) shouldBe (0L until 20L)
  }
}
