package graft.plans

import graft.SparkFixture
import graft.operators.VersionedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL DML over registered store tables: INSERT INTO / DELETE FROM /
  * UPDATE each resolve ([[StoreTimeTravelRule]]) into ONE driver-side
  * command = one atomic store commit, with the store's full write
  * discipline (schema gate, constraints, OCC) — and each returns the
  * committed version as its result row.
  */
class StoreSqlDmlSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-dml").toString +
      "/store"

  private def mkStore(name: String): String = {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(
      (0 until 10).map(i => (i.toLong, s"doc-$i", (i % 5).toLong))
        .toDF("id", "body", "g"), p)
    VersionedStore.registerTable(spark, p, name)
    p
  }

  test("INSERT INTO ... SELECT appends by position with casts; the " +
      "result row is the committed version") {
    val p = mkStore("dml_ins")
    val out = spark.sql(
      "INSERT INTO dml_ins SELECT 100, 'via-sql', 9").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L)
    val r = spark.sql(
      "SELECT body, g FROM dml_ins WHERE id = 100").head
    (r.getString(0), r.getLong(1)) shouldBe (("via-sql", 9L))
    // by-position: a reordered SELECT cannot silently land values in
    // the wrong columns — the int literal casts to the LONG column
    VersionedStore.read(spark, p).schema("g").dataType shouldBe
      org.apache.spark.sql.types.LongType
    // arity mismatch is rejected before anything is written
    intercept[Exception] {
      spark.sql("INSERT INTO dml_ins SELECT 1, 'x'")
    }
    VersionedStore.latestVersion(spark, p) shouldBe 2L
  }

  test("INSERT INTO with a column list fills unnamed columns with " +
      "typed NULLs") {
    val p = mkStore("dml_inscols")
    spark.sql("INSERT INTO dml_inscols (id, g) SELECT 200, 7")
    val r = spark.sql(
      "SELECT body, g FROM dml_inscols WHERE id = 200").head
    r.isNullAt(0) shouldBe true
    r.getLong(1) shouldBe 7L
    intercept[Exception] {
      spark.sql("INSERT INTO dml_inscols (id, nope) SELECT 1, 2")
    }.getMessage should include("unknown column")
    val _ = p
  }

  test("DELETE FROM ... WHERE is one copy-on-write commit; a " +
      "missing WHERE is rejected, never a silent truncation") {
    val p = mkStore("dml_del")
    val out = spark.sql(
      "DELETE FROM dml_del WHERE g = 2 OR id >= 8").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L)
    spark.sql("SELECT count(*) AS n FROM dml_del")
      .head.getLong(0) shouldBe 6L // lost 2,7 (g=2) and 8,9
    intercept[Exception] {
      spark.sql("DELETE FROM dml_del")
    }.getMessage should include("WHERE")
    VersionedStore.latestVersion(spark, p) shouldBe 2L
  }

  test("UPDATE ... SET evaluates every SET and the predicate " +
      "against the pre-update row, in one commit") {
    val p = mkStore("dml_upd")
    val out = spark.sql(
      "UPDATE dml_upd SET g = g + 100, body = concat(body, '!') " +
        "WHERE id < 3").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L)
    val r = spark.sql(
      "SELECT id, body, g FROM dml_upd WHERE id < 3 ORDER BY id")
      .collect()
    r.map(_.getString(1)).toSeq shouldBe
      Seq("doc-0!", "doc-1!", "doc-2!")
    r.map(_.getLong(2)).toSeq shouldBe Seq(100L, 101L, 102L)
    // untouched rows untouched
    spark.sql("SELECT g FROM dml_upd WHERE id = 7")
      .head.getLong(0) shouldBe 2L
    // and time travel below the update serves the pre-update rows
    spark.sql("SELECT g FROM dml_upd VERSION AS OF 1 WHERE id = 0")
      .head.getLong(0) shouldBe 0L
    val _ = p
  }

  test("DML composes with the store's write discipline: an INSERT " +
      "violating a table constraint aborts with nothing committed") {
    val p = mkStore("dml_con")
    VersionedStore.setConstraints(spark, p,
      Seq(graft.check.NonNegative("g")))
    intercept[Exception] {
      spark.sql("INSERT INTO dml_con SELECT 300, 'bad', -1")
    }
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    spark.sql("SELECT count(*) AS n FROM dml_con")
      .head.getLong(0) shouldBe 10L
  }

  test("MERGE INTO upsert form: matched keys replaced, new keys " +
      "appended, ONE commit; source binds by name with casts") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_merge")
    // source deliberately reorders columns — by-name binding
    Seq((0L, 100L, "replaced"), (500L, 9L, "fresh"))
      .toDF("id", "g", "body")
      .createOrReplaceTempView("dml_merge_src")
    val out = spark.sql(
      """MERGE INTO dml_merge AS t USING dml_merge_src AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L)
    spark.sql("SELECT count(*) AS n FROM dml_merge")
      .head.getLong(0) shouldBe 11L
    val r0 = spark.sql(
      "SELECT body, g FROM dml_merge WHERE id = 0").head
    (r0.getString(0), r0.getLong(1)) shouldBe (("replaced", 100L))
    spark.sql("SELECT body FROM dml_merge WHERE id = 500")
      .head.getString(0) shouldBe "fresh"
    VersionedStore.latestVersion(spark, p) shouldBe 2L
  }

  test("MERGE INTO delete form removes matched keys; unsupported " +
      "action shapes and non-equi ON conditions are rejected " +
      "loudly, nothing committed") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_mdel")
    Seq(1L, 3L, 999L).toDF("id")
      .createOrReplaceTempView("dml_mdel_src")
    spark.sql(
      """MERGE INTO dml_mdel t USING dml_mdel_src s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    spark.sql("SELECT count(*) AS n FROM dml_mdel")
      .head.getLong(0) shouldBe 8L
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mdel t USING dml_mdel_src s ON t.id < s.id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }.getMessage should include("conjunction of equalities")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mdel t USING dml_mdel_src s ON t.id = s.id
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }.getMessage should include("NOT MATCHED BY SOURCE")
    VersionedStore.latestVersion(spark, p) shouldBe 2L
  }

  test("an ALIASED target's qualifier binds: DELETE FROM t AS x " +
      "WHERE x.id / UPDATE t AS x SET g = x.g + 1 both resolve " +
      "against the store") {
    val p = mkStore("dml_alias")
    spark.sql("DELETE FROM dml_alias AS x WHERE x.id = 9")
    spark.sql("SELECT count(*) AS n FROM dml_alias")
      .head.getLong(0) shouldBe 9L
    spark.sql(
      "UPDATE dml_alias AS x SET g = x.g + 50 WHERE x.id = 0")
    spark.sql("SELECT g FROM dml_alias WHERE id = 0")
      .head.getLong(0) shouldBe 50L
    VersionedStore.latestVersion(spark, p) shouldBe 3L
  }

  test("MERGE upsert rejects a source carrying columns the table " +
      "does not — never a silent projection-away") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_mextra")
    Seq((0L, "x", 1L, "surprise"))
      .toDF("id", "body", "g", "extra_col")
      .createOrReplaceTempView("dml_mextra_src")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mextra t USING dml_mextra_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }.getMessage should include("extra_col")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
  }

  test("the FIRST insert into an empty store defines the schema — " +
      "the same contract as the API's first append") {
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.registerTable(spark, p, "dml_empty")
    spark.sql("INSERT INTO dml_empty (id, body) " +
      "SELECT 1L, 'first'")
    VersionedStore.read(spark, p).columns.toSeq shouldBe
      Seq("id", "body")
    spark.sql("SELECT body FROM dml_empty WHERE id = 1")
      .head.getString(0) shouldBe "first"
    // and the SECOND insert goes through the schema gate as usual
    intercept[Exception] {
      spark.sql("INSERT INTO dml_empty SELECT 2L")
    }
  }

  test("a temp view of the same name shadows the registered table " +
      "for DML too — the registry never hijacks a real relation") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_shadow")
    Seq((1L, "v", 0L)).toDF("id", "body", "g")
      .createOrReplaceTempView("dml_shadow")
    // DELETE against a temp view must fail with Spark's own error,
    // not route to the store
    intercept[Exception] {
      spark.sql("DELETE FROM dml_shadow WHERE id = 1")
    }
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    spark.catalog.dropTempView("dml_shadow")
  }

  test("INSERT coerces under ANSI store assignment: a string landed " +
      "in a LONG column by a reordered SELECT fails loudly, never a " +
      "silent NULL") {
    val p = mkStore("dml_ansi")
    // columns reordered: 'doc-x' (string) would land in id (long)
    intercept[Exception] {
      spark.sql("INSERT INTO dml_ansi SELECT 'doc-x', 300, 1")
    }.getMessage should include("ANSI store assignment")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    // a REASONABLE widening (int literal → long column) still works
    spark.sql("INSERT INTO dml_ansi SELECT 300, 'ok', 1")
    spark.sql("SELECT count(*) AS n FROM dml_ansi WHERE id = 300")
      .head.getLong(0) shouldBe 1L
  }

  test("UPDATE runs the same constraint gate as INSERT/MERGE: a SET " +
      "that violates a table CHECK aborts with nothing committed") {
    val p = mkStore("dml_updcon")
    VersionedStore.setConstraints(spark, p,
      Seq(graft.check.NonNegative("g")))
    intercept[Exception] {
      spark.sql("UPDATE dml_updcon SET g = -5 WHERE id = 0")
    }.getMessage should include("constraint")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    spark.sql("SELECT g FROM dml_updcon WHERE id = 0")
      .head.getLong(0) shouldBe 0L
    // a compliant UPDATE through the same gate still commits
    spark.sql("UPDATE dml_updcon SET g = 5 WHERE id = 0")
    spark.sql("SELECT g FROM dml_updcon WHERE id = 0")
      .head.getLong(0) shouldBe 5L
  }

  test("MERGE ON must join the two sides: a same-side equality " +
      "(s.id = s.id) is rejected, never reinterpreted as a keyed " +
      "merge") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_sameside")
    Seq((0L, "x", 1L)).toDF("id", "body", "g")
      .createOrReplaceTempView("dml_sameside_src")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_sameside AS t USING dml_sameside_src AS s
          |ON s.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }.getMessage should include("target-side")
    // a redundant same-side conjunct poisons the whole condition too
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_sameside AS t USING dml_sameside_src AS s
          |ON t.id = s.id AND t.g = t.g
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }.getMessage should include("target-side")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    // bare relation names qualify a side exactly like aliases
    spark.sql(
      """MERGE INTO dml_sameside USING dml_sameside_src
        |ON dml_sameside.id = dml_sameside_src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("SELECT body FROM dml_sameside WHERE id = 0")
      .head.getString(0) shouldBe "x"
  }

  test("INSERT OVERWRITE is ONE atomic commit: the fresh content " +
      "lands and every live group AND deletion vector retires in " +
      "the same log record; time travel still serves the old rows") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_ovr")
    // a deferred delete arms a DV — overwrite must retire it too
    graft.operators.VersionedStore.deleteKeysDeferred(spark, p,
      Seq(3L).toDF("id"), Seq("id"))                          // v2
    spark.sql("SELECT count(*) AS n FROM dml_ovr")
      .head.getLong(0) shouldBe 9L
    val out = spark.sql(
      "INSERT OVERWRITE dml_ovr SELECT 1000, 'fresh', 1").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(3L) // ONE commit
    spark.sql("SELECT id, body, g FROM dml_ovr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq shouldBe Seq((1000L, "fresh", 1L))
    // the v3 log record carries every retirement: 10-row group + DV
    val h = VersionedStore.history(spark, p)
      .where(col("version") === 3)
    h.where(col("action") === "add").count() shouldBe 1L
    h.where(col("action") === "remove").count() shouldBe 2L
    // pre-overwrite content (with the DV applied) via time travel
    VersionedStore.readAt(spark, p, 2L).count() shouldBe 9L
    // the write gates still apply: a retyped overwrite is rejected
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE dml_ovr SELECT 'a', 'b', 'c'")
    }
    VersionedStore.latestVersion(spark, p) shouldBe 3L
  }

  test("general MERGE: conditional per-column UPDATE, conditional " +
      "DELETE, and conditional column-list INSERT compose " +
      "first-match-wins in ONE atomic commit") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_gen")
    // target rows 0..9 have g = id % 5; source hits 0,1,2,3 + fresh
    Seq((0L, 50L), (1L, 0L), (2L, 1L), (3L, 100L), (500L, 4L),
      (501L, 3L))
      .toDF("id", "sg").createOrReplaceTempView("dml_gen_src")
    val out = spark.sql(
      """MERGE INTO dml_gen AS t USING dml_gen_src AS s
        |ON t.id = s.id
        |WHEN MATCHED AND s.sg > t.g THEN
        |  UPDATE SET g = s.sg + t.g, body = concat(t.body, '+')
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.sg % 2 = 0 THEN
        |  INSERT (id, g) VALUES (s.id, s.sg * 10)""".stripMargin)
      .collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L) // ONE commit
    VersionedStore.latestVersion(spark, p) shouldBe 2L
    val r = spark.sql(
      "SELECT id, body, g FROM dml_gen ORDER BY id").collect()
    // 10 - 2 deleted (ids 1, 2: update cond false) + 1 inserted
    r.length shouldBe 9
    val byId = r.map(x => x.getLong(0) ->
      (Option(x.getString(1)), x.getLong(2))).toMap
    byId(0L) shouldBe ((Some("doc-0+"), 50L))   // 50 + 0, body marked
    byId(3L) shouldBe ((Some("doc-3+"), 103L))  // 100 + 3
    byId.contains(1L) shouldBe false            // first-match DELETE
    byId.contains(2L) shouldBe false
    byId(500L) shouldBe ((None, 40L))           // body = typed NULL
    byId.contains(501L) shouldBe false          // insert cond false
    byId(7L) shouldBe ((Some("doc-7"), 2L))     // untouched carries
  }

  test("INSERT INTO ... BY NAME resolves the query's output names " +
      "against the table schema: reordered and partial column " +
      "sets land under their names (absent nullable columns fill " +
      "typed NULL, case-insensitively), extras are loud") {
    val p = mkStore("dml_byname") // schema: id LONG, body STR, g LONG
    // reordered full set — by position this would garble columns
    spark.sql("INSERT INTO dml_byname BY NAME " +
      "SELECT 50 AS g, 'rex' AS body, 100 AS id")
    // partial set: body absent → typed NULL; names case-insensitive
    spark.sql("INSERT INTO dml_byname BY NAME " +
      "SELECT 101 AS ID, 60 AS G")
    val got = spark.sql(
      "SELECT id, body, g FROM dml_byname WHERE id >= 100 " +
        "ORDER BY id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    got.toSeq shouldBe Seq((100L, Some("rex"), 50L),
      (101L, None, 60L))
    // a source column the table does not carry is rejected loudly
    intercept[Exception] {
      spark.sql("INSERT INTO dml_byname BY NAME " +
        "SELECT 102 AS id, 1 AS zz")
    }.getMessage should include("zz")
    VersionedStore.latestVersion(spark, p) shouldBe 3L
    // ANSI store assignment still gates the values
    intercept[Exception] {
      spark.sql("INSERT INTO dml_byname BY NAME " +
        "SELECT 103 AS id, 'abc' AS g")
    }.getMessage should include("ANSI store assignment")
  }

  test("general MERGE applies ANSI store assignment to produced " +
      "values: an incompatible SET/INSERT type rejects at plan " +
      "time, a lossy coercion overflow fails loudly at run time — " +
      "nothing committed either way") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_mansi")
    Seq((0L, "abc")).toDF("id", "v")
      .createOrReplaceTempView("dml_mansi_src")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mansi t USING dml_mansi_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET g = s.v""".stripMargin)
    }.getMessage should include("ANSI store assignment")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mansi t USING dml_mansi_src s
          |ON t.id = s.id
          |WHEN NOT MATCHED THEN INSERT (id, g) VALUES (s.id, s.v)
          |""".stripMargin)
    }.getMessage should include("ANSI store assignment")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    // legal-but-lossy (long → int) casts in ANSI eval mode: an
    // out-of-range value fails the job loudly, never a silent NULL
    val p2 = freshPath()
    VersionedStore.create(spark, p2)
    VersionedStore.append(Seq((0L, 1)).toDF("id", "n"), p2)
    VersionedStore.registerTable(spark, p2, "dml_mansi_int")
    Seq((0L, 5000000000L)).toDF("id", "big")
      .createOrReplaceTempView("dml_mansi_int_src")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_mansi_int t USING dml_mansi_int_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET n = s.big""".stripMargin)
    }
    VersionedStore.latestVersion(spark, p2) shouldBe 1L
    spark.sql("SELECT n FROM dml_mansi_int WHERE id = 0")
      .head.getInt(0) shouldBe 1
  }

  test("merge expressions preserve struct-field paths: " +
      "s.payload.f keeps its nested path through the qualifier " +
      "rebase instead of collapsing to the last name part") {
    val s = spark
    import s.implicits._
    val p = freshPath()
    VersionedStore.create(spark, p)
    VersionedStore.append(Seq((0L, 10L)).toDF("id", "g"), p)
    VersionedStore.registerTable(spark, p, "dml_struct")
    Seq((0L, (7L, "z")), (1L, (3L, "y"))).toDF("id", "payload")
      .createOrReplaceTempView("dml_struct_src")
    spark.sql(
      """MERGE INTO dml_struct t USING dml_struct_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET g = s.payload._1 + t.g
        |WHEN NOT MATCHED AND s.payload._2 = 'y' THEN
        |  INSERT (id, g) VALUES (s.id, s.payload._1)""".stripMargin)
    val byId = spark.sql("SELECT id, g FROM dml_struct")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId shouldBe Map(0L -> 17L, 1L -> 3L)
  }

  test("MERGE ON id = id (both sides unqualified) is rejected as " +
      "a tautology; one qualified side with an unqualified other " +
      "stays a legal key join") {
    val s = spark
    import s.implicits._
    val p = mkStore("dml_taut")
    Seq((3L, "fresh", 9L)).toDF("id", "body", "g")
      .createOrReplaceTempView("dml_taut_src")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_taut t USING dml_taut_src s ON id = id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }.getMessage should include("target-side")
    VersionedStore.latestVersion(spark, p) shouldBe 1L
    spark.sql(
      """MERGE INTO dml_taut t USING dml_taut_src s ON t.id = id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("SELECT body FROM dml_taut WHERE id = 3")
      .head.getString(0) shouldBe "fresh"
  }
}
