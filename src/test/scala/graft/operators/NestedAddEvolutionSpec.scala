package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Nested ADD COLUMNS ([[VersionedStore.addNestedField]]): ONE
  * schema-anchor commit widens a struct column in place — nothing
  * rewrites, groups written before the anchor serve the new field
  * as NULL through the batch reader's clipped parquet schema, time
  * travel serves each version's OWN struct shape, the CDC feed
  * spans the evolution, and mutations rewrite old groups under the
  * widened shape. Non-struct parents, duplicate fields, and
  * non-nullable additions are refused loudly.
  */
class NestedAddEvolutionSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def store(name: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-nestadd-$name").toString + "/s"

  private def payDf(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "pa", "pb").selectExpr("k",
      "cast(named_struct('a', pa, 'b', pb) as " +
        "struct<a: bigint, b: string>) as pay")
  }

  test("one anchor commit widens the struct: old groups serve the " +
      "new field as NULL, new appends carry it, time travel serves " +
      "the narrow shape, merge rewrites under the wide shape") {
    val p = store("base")
    VersionedStore.create(spark, p)
    VersionedStore.append(payDf(Seq((1L, 10L, "x"), (2L, 20L, "y"))),
      p)
    val v1 = VersionedStore.latestVersion(spark, p)
    val vAdd = VersionedStore.addNestedField(spark, p, Seq("pay"),
      StructField("c", LongType, nullable = true))
    vAdd shouldBe v1 + 1
    VersionedStore.tableSchema(spark, p).get("pay").dataType
      .asInstanceOf[StructType].fieldNames.toSeq shouldBe
      Seq("a", "b", "c")
    // pre-anchor rows read the field as NULL (clipped parquet read)
    VersionedStore.read(spark, p).selectExpr("k", "pay.c")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.isNullAt(1))).toSeq shouldBe
      Seq((1L, true), (2L, true))
    // a post-anchor append carries the wide struct
    val s = spark
    import s.implicits._
    val wide = Seq((3L, 30L, "z", 300L)).toDF("k", "pa", "pb", "pc")
      .selectExpr("k", "cast(named_struct('a', pa, 'b', pb, 'c', " +
        "pc) as struct<a: bigint, b: string, c: bigint>) as pay")
    VersionedStore.append(wide, p)
    VersionedStore.read(spark, p).selectExpr("k", "pay.c")
      .orderBy("k").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq shouldBe
      Seq((1L, -1L), (2L, -1L), (3L, 300L))
    // time travel below the anchor serves the version's OWN shape
    VersionedStore.readAt(spark, p, v1).schema("pay").dataType
      .asInstanceOf[StructType].fieldNames.toSeq shouldBe
      Seq("a", "b")
    // the CDC feed spans the evolution: both sides read under toV's
    // schema, pre-anchor rows carry NULL in the new field
    val feed = VersionedStore.changes(spark, p, 0L,
      VersionedStore.latestVersion(spark, p))
    feed.filter(col("_change") === "insert")
      .selectExpr("k", "pay.c").orderBy("k").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq shouldBe
      Seq((1L, -1L), (2L, -1L), (3L, 300L))
    // a keyed merge rewrites the touched old group under the WIDE
    // shape (the replacement row carries a real value)
    val up = Seq((2L, 20L, "Y", 200L)).toDF("k", "pa", "pb", "pc")
      .selectExpr("k", "cast(named_struct('a', pa, 'b', pb, 'c', " +
        "pc) as struct<a: bigint, b: string, c: bigint>) as pay")
    VersionedStore.merge(spark, p, up, Seq("k"))
    VersionedStore.read(spark, p).selectExpr("k", "pay.b", "pay.c")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq shouldBe
      Seq((1L, "x", -1L), (2L, "Y", 200L), (3L, "z", 300L))
  }

  test("a post-evolution batch carrying the NARROW struct is " +
      "refused with the nested fields named (never NULL-padded)") {
    val p = store("narrow")
    VersionedStore.create(spark, p)
    VersionedStore.append(payDf(Seq((1L, 10L, "x"))), p)
    VersionedStore.addNestedField(spark, p, Seq("pay"),
      StructField("c", LongType, nullable = true))
    val e = intercept[Exception] {
      VersionedStore.append(payDf(Seq((2L, 20L, "y"))), p)
    }
    e.getMessage should include("narrower than the table schema")
    e.getMessage should include("pay")
    e.getMessage should include("c")
  }

  test("element / value pseudo-steps widen structs inside arrays " +
      "and map values; map keys are refused") {
    val p = store("coll")
    VersionedStore.create(spark, p)
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(5L, 6L))).toDF("k", "xs").selectExpr("k",
      "cast(transform(xs, x -> named_struct('x', x)) as " +
        "array<struct<x: bigint>>) as arr",
      "cast(map('a', named_struct('v', 7L)) as " +
        "map<string, struct<v: bigint>>) as m")
    VersionedStore.append(df, p)
    VersionedStore.addNestedField(spark, p, Seq("arr", "element"),
      StructField("y", StringType, nullable = true))
    VersionedStore.addNestedField(spark, p, Seq("m", "value"),
      StructField("w", LongType, nullable = true))
    // old rows serve the new fields as NULL inside the collections
    val row = VersionedStore.read(spark, p)
      .selectExpr("arr[0].x", "arr[0].y", "m['a'].v", "m['a'].w")
      .head
    row.getLong(0) shouldBe 5L
    row.isNullAt(1) shouldBe true
    row.getLong(2) shouldBe 7L
    row.isNullAt(3) shouldBe true
    // a post-anchor append carries the wide element shape
    val wide = Seq((2L, 8L, "tag", 9L, 10L))
      .toDF("k", "x", "y", "v", "w").selectExpr("k",
        "cast(array(named_struct('x', x, 'y', y)) as " +
          "array<struct<x: bigint, y: string>>) as arr",
        "cast(map('b', named_struct('v', v, 'w', w)) as " +
          "map<string, struct<v: bigint, w: bigint>>) as m")
    VersionedStore.append(wide, p)
    VersionedStore.read(spark, p).selectExpr("k", "arr[0].y")
      .orderBy("k").collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq shouldBe Seq((1L, null), (2L, "tag"))
    intercept[Exception] {
      VersionedStore.addNestedField(spark, p, Seq("m", "key"),
        StructField("z", LongType, nullable = true))
    }.getMessage should include("map KEYS")
  }

  test("multi-level parents widen in place; refusals: non-struct " +
      "parent, missing parent, duplicate field, non-nullable") {
    val p = store("deep")
    VersionedStore.create(spark, p)
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L)).toDF("k", "x").selectExpr("k",
      "cast(named_struct('inner', named_struct('x', x)) as " +
        "struct<inner: struct<x: bigint>>) as outer")
    VersionedStore.append(df, p)
    VersionedStore.addNestedField(spark, p, Seq("outer", "inner"),
      StructField("y", StringType, nullable = true))
    VersionedStore.tableSchema(spark, p).get("outer").dataType
      .asInstanceOf[StructType]("inner").dataType
      .asInstanceOf[StructType].fieldNames.toSeq shouldBe
      Seq("x", "y")
    VersionedStore.read(spark, p).selectExpr("outer.inner.y")
      .head.isNullAt(0) shouldBe true
    intercept[Exception] {
      VersionedStore.addNestedField(spark, p, Seq("k"),
        StructField("z", LongType, nullable = true))
    }.getMessage should include("not a struct")
    intercept[Exception] {
      VersionedStore.addNestedField(spark, p, Seq("nope"),
        StructField("z", LongType, nullable = true))
    }.getMessage should include("no column")
    intercept[Exception] {
      VersionedStore.addNestedField(spark, p, Seq("outer", "inner"),
        StructField("x", LongType, nullable = true))
    }.getMessage should include("already exists")
    intercept[Exception] {
      VersionedStore.addNestedField(spark, p, Seq("outer"),
        StructField("w", LongType, nullable = false))
    }.getMessage should include("nullable")
  }
}
