package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Widening ALTER COLUMN retypes ([[VersionedStore.retypeColumn]]):
  * ONE metadata commit, no rewrite — old groups keep their narrow
  * physical bytes and read under the new type through the parquet
  * reader's widening promotion; new appends produce the new type;
  * time travel serves each version's OWN type; the CDC feed
  * replicates through the retype (both reader paths widen).
  * Narrowing and cross-family retypes are refused loudly.
  */
class RetypeEvolutionSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def store(name: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-retype-$name").toString + "/s"

  test("int→long is one metadata commit: old groups read widened, " +
      "new appends land wide, time travel serves the narrow type, " +
      "mutations rewrite old groups under the new type") {
    val s = spark
    import s.implicits._
    val p = store("il")
    VersionedStore.create(spark, p)
    val narrow = Seq((1, "a"), (2, "b")).toDF("k", "body")
    VersionedStore.append(narrow, p)
    val v1 = VersionedStore.latestVersion(spark, p)
    val vRetype = VersionedStore.retypeColumn(spark, p, "k", LongType)
    vRetype shouldBe v1 + 1
    // metadata only: the narrow group's files are untouched
    VersionedStore.tableSchema(spark, p).get("k")
      .dataType shouldBe LongType
    val widened = VersionedStore.read(spark, p)
    widened.schema("k").dataType shouldBe LongType
    widened.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b"))
    // a post-retype append carries the WIDE type
    VersionedStore.append(
      Seq((3000000000L, "c")).toDF("k", "body"), p)
    VersionedStore.read(spark, p).agg(max("k")).head.getLong(0)
      .shouldBe(3000000000L)
    // time travel below the retype serves the version's OWN type
    VersionedStore.readAt(spark, p, v1)
      .schema("k").dataType shouldBe IntegerType
    // a keyed merge rewrites the narrow group under the new schema
    VersionedStore.merge(spark, p,
      Seq((2L, "B")).toDF("k", "body"), Seq("k"))
    VersionedStore.read(spark, p).orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "B"), (3000000000L, "c"))
  }

  test("float→double and decimal growth widen exactly; narrowing " +
      "and cross-family retypes are refused") {
    val s = spark
    import s.implicits._
    val p = store("fd")
    VersionedStore.create(spark, p)
    VersionedStore.append(
      Seq((1L, 1.5f, "12.34"), (2L, 2.5f, "56.78")).toDF("k", "f", "d")
        .select($"k", $"f", $"d".cast(DecimalType(8, 2)).as("d")), p)
    VersionedStore.retypeColumn(spark, p, "f", DoubleType)
    VersionedStore.retypeColumn(spark, p, "d", DecimalType(12, 4))
    val out = VersionedStore.read(spark, p).orderBy("k").collect()
    out(0).getDouble(1) shouldBe 1.5d
    out(0).getDecimal(2).toString shouldBe "12.3400"
    out(1).getDecimal(2).toString shouldBe "56.7800"
    // refusals: narrowing, scale shrink, cross-family
    intercept[Exception] {
      VersionedStore.retypeColumn(spark, p, "k", IntegerType)
    }.getMessage should include("not a lineage-safe widening")
    intercept[Exception] {
      VersionedStore.retypeColumn(spark, p, "d", DecimalType(12, 1))
    }
    intercept[Exception] {
      VersionedStore.retypeColumn(spark, p, "k", StringType)
    }
    // idempotence: retyping to the current type is a no-op version
    val v = VersionedStore.latestVersion(spark, p)
    VersionedStore.retypeColumn(spark, p, "f", DoubleType) shouldBe v
  }

  test("the CDC feed replicates through a retype: pre-retype " +
      "commits serve the widened type bit-exactly in both reader " +
      "paths (zero-copy and staged)") {
    val s = spark
    import s.implicits._
    val p = store("cdc")
    VersionedStore.create(spark, p)
    VersionedStore.append(
      Seq((1, 10.5f, "1.25"), (2, 20.5f, "2.50")).toDF("k", "f", "d")
        .select($"k", $"f", $"d".cast(DecimalType(6, 2)).as("d")), p)
    VersionedStore.retypeColumn(spark, p, "k", LongType)
    VersionedStore.retypeColumn(spark, p, "f", DoubleType)
    VersionedStore.retypeColumn(spark, p, "d", DecimalType(10, 4))
    VersionedStore.append(
      Seq((5000000000L, 30.5d, "3.75")).toDF("k", "f", "d")
        .select($"k", $"f", $"d".cast(DecimalType(10, 4)).as("d")), p)
    val latest = VersionedStore.latestVersion(spark, p)
    // batch feed across the whole window (retype = no change rows)
    val feed = VersionedStore.changes(spark, p, 0L, latest)
    feed.schema("k").dataType shouldBe LongType
    feed.schema("f").dataType shouldBe DoubleType
    feed.schema("d").dataType shouldBe DecimalType(10, 4)
    feed.filter($"_change" === "insert").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getDecimal(2).toString)).toSeq shouldBe Seq(
      (1L, 10.5d, "1.2500"), (2L, 20.5d, "2.5000"),
      (5000000000L, 30.5d, "3.7500"))
    // the STREAMING reader path (executor Group reader) widens the
    // pre-retype group files identically
    val ck = java.nio.file.Files
      .createTempDirectory("graft-retype-ck").toString
    val q = spark.readStream.format("graft-store-changes")
      .option("path", p)
      .load()
      .writeStream.format("memory").queryName("retype_feed")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000) shouldBe true
    val got = spark.table("retype_feed")
      .filter($"_change" === "insert").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getDecimal(2).toString)).toSeq
    got shouldBe Seq(
      (1L, 10.5d, "1.2500"), (2L, 20.5d, "2.5000"),
      (5000000000L, 30.5d, "3.7500"))
  }
}
